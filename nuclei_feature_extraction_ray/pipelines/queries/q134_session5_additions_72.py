# round-5 session-5 additions, batch 72: the Friedman blocked rank
# test across customer segments, the KPSS level-stationarity
# statistic, and the cumulative-gains decile table.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)


@register("friedman_test", sql="""
    WITH c AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(o_custkey % 4 AS BIGINT) AS seg,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM c),
    grid AS (SELECT d.day, CAST(s.seg AS BIGINT) AS seg
             FROM days d CROSS JOIN (VALUES (0), (1), (2), (3))
                  s(seg)),
    f AS (SELECT g.day, g.seg, COALESCE(c.v, 0) AS v
          FROM grid g LEFT JOIN c
            ON c.day = g.day AND c.seg = g.seg),
    r AS (SELECT seg,
                 CAST(row_number() OVER (PARTITION BY day
                          ORDER BY v, seg) AS BIGINT) AS rk
          FROM f),
    rs AS (SELECT seg, CAST(sum(rk) AS HUGEINT) AS rj
           FROM r GROUP BY seg),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM days),
    m AS (SELECT CAST(sum(CAST(rj AS HUGEINT) * rj) AS HUGEINT)
                   AS sr2
          FROM rs)
    SELECT (SELECT n FROM t) AS n_blocks,
           12.0 * CAST((SELECT sr2 FROM m) AS DOUBLE)
           / (CAST((SELECT n FROM t) AS DOUBLE) * 4.0 * 5.0)
           - 3.0 * CAST((SELECT n FROM t) AS DOUBLE) * 5.0
             AS friedman_chi2""")
def friedman_test(sf_dir: str):
    """FRIEDMAN TEST across four customer segments (custkey mod 4)
    blocked by day: within each day the segments' revenues are
    ranked 1..4 (deterministic (value, segment) order), chi2_F =
    12/(n*k*(k+1)) * sum_j R_j^2 - 3*n*(k+1) — the
    repeated-measures companion to kruskal_wallis: by ranking
    WITHIN days it removes day-level demand swings that would
    drown a between-segments comparison (the blocked design
    twoway_anova handles parametrically). Missing cells are
    defined as zero revenue; ranks, rank sums and their squares
    are exact integers; chi2 is one shared float expression.
    Scale plan: (day, seg) combine on a bounded grid; ranking is
    O(days) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_custkey",
                                  "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        seg = b["o_custkey"].to_numpy(np.int64) % 4
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "seg": seg, "v": cents}) \
            .groupby(["day", "seg"], as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day", "seg"], ["v"], exact_int=True)
    cells = {(int(r["day"]), int(r["seg"])): int(r["v"])
             for _, r in c.iterrows()}
    days = sorted(set(d for d, _ in cells))
    rj = [0, 0, 0, 0]
    for d in days:
        order = sorted(range(4),
                       key=lambda s: (cells.get((d, s), 0), s))
        for rk, s in enumerate(order, start=1):
            rj[s] += rk
    n = len(days)
    sr2 = sum(x * x for x in rj)
    chi2 = 12.0 * np.float64(sr2) \
        / (np.float64(n) * 4.0 * 5.0) - 3.0 * np.float64(n) * 5.0
    return pd.DataFrame({
        "n_blocks": [np.int64(n)],
        "friedman_chi2": [np.float64(chi2)]})


@register("kpss_stat", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM d),
    x AS (SELECT day,
                 CAST((SELECT n FROM t) AS HUGEINT) * v
                 - (SELECT s FROM t) AS dev
          FROM d),
    p AS (SELECT CAST(sum(dev) OVER (ORDER BY day) AS HUGEINT)
                   AS pre,
                 dev
          FROM x),
    m AS (SELECT CAST(sum(pre * pre) AS HUGEINT) AS sp2,
                 CAST(sum(dev * dev) AS HUGEINT) AS sd2
          FROM p)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_days,
           CAST((SELECT sp2 FROM m) AS DOUBLE)
           / (CAST((SELECT n FROM t) AS DOUBLE)
              * CAST((SELECT sd2 FROM m) AS DOUBLE))
             AS kpss_eta""")
def kpss_stat(sf_dir: str):
    """KPSS LEVEL-STATIONARITY STATISTIC on daily revenue (lag-0
    long-run variance): eta = n^-2 * sum_t S_t^2 / sigma^2 for
    partial sums S_t of mean deviations — the test whose NULL is
    stationarity, the mirror image of adf_lite's unit-root null
    (reporting both is the standard confirmatory pairing). With
    deviations scaled by n (dev = n*x - S) the partial sums, their
    squares and the variance numerator are ALL exact integers, and
    the n-powers cancel to eta = sum pre^2 / (n * sum dev^2) —
    one shared float division of exact big ints. Scale plan:
    bounded day-domain combine; the prefix walk is O(days) driver
    work."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True).sort_values("day")
    v = [int(x) for x in d["v"]]
    n = len(v)
    s = sum(v)
    pre = 0
    sp2 = sd2 = 0
    for x in v:
        dev = n * x - s
        pre += dev
        sp2 += pre * pre
        sd2 += dev * dev
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "kpss_eta": [np.float64(sp2)
                     / (np.float64(n) * np.float64(sd2))]})


@register("gains_deciles", sql="""
    WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                      CAST(max(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY 1),
    r AS (SELECT p, CAST(row_number() OVER (ORDER BY n DESC,
                                            user_id) AS BIGINT)
                      AS rk
          FROM u),
    t AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                 CAST(sum(p) AS BIGINT) AS np FROM u),
    g AS (SELECT CAST(d.d AS BIGINT) AS decile,
                 ((SELECT nu FROM t) * d.d) // 10 AS cut
          FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10))
               d(d)),
    res AS (SELECT g.decile, g.cut,
                   CAST(COALESCE(sum(r.p), 0) AS BIGINT) AS pc
            FROM g LEFT JOIN r ON r.rk <= g.cut
            GROUP BY 1, 2)
    SELECT decile, cut AS n_users_cum, pc AS purchasers_cum,
           CAST(pc AS DOUBLE)
             / CAST((SELECT np FROM t) AS DOUBLE) AS gain
    FROM res ORDER BY decile""")
def gains_deciles(sf_dir: str):
    """CUMULATIVE GAINS TABLE: users ranked by activity (event
    count, user_id tie-break), and for each decile the share of
    all purchasers captured in the top d/10 of users — the
    marketing-targeting curve (its diagonal gap is the practical
    payoff of whatever auc-style metric a model reports; here the
    'model' is raw activity). Decile cuts are exact integer ranks
    floor(U*d/10); captured-purchaser counts are exact prefix
    integers; one division per row. Scale plan: per-user counts
    through one user exchange; the ranked prefix is the two-phase
    rank exchange at fleet scale (here the guarded driver sort)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64),
            "p": (b["event_type"].to_numpy(object)
                  == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False) \
            .agg({"n": "sum", "p": "max"})
        for c in ("n", "p"):
            g[c] = g[c].astype(np.int64)
        return g

    # the p column needs MAX semantics, so the user exchange is a
    # partition_map rather than the sum-only _combine_partials
    from ...stages.partition import partition_map

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False) \
            .agg({"n": "sum", "p": "max"})
        for c in ("n", "p"):
            a[c] = a[c].astype(np.int64)
        return a

    u = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], cells, 16).to_pandas()
    u = u.sort_values(["n", "user_id"], ascending=[False, True],
                      kind="mergesort").reset_index(drop=True)
    p = u["p"].to_numpy(np.int64)
    nu = len(u)
    tot = int(p.sum())
    cum = np.cumsum(p)
    rows = []
    for d in range(1, 11):
        cut = nu * d // 10
        pc = int(cum[cut - 1]) if cut > 0 else 0
        rows.append((d, cut, pc))
    return pd.DataFrame({
        "decile": np.array([r[0] for r in rows], np.int64),
        "n_users_cum": np.array([r[1] for r in rows], np.int64),
        "purchasers_cum": np.array([r[2] for r in rows],
                                   np.int64),
        "gain": np.array([np.float64(r[2]) / np.float64(tot)
                          for r in rows], np.float64)})
