# round-5 session-5 additions, batch 20: configuration-model
# triangle expectation vs observed, the ABC-XYZ inventory planning
# matrix, and the Siegel repeated-medians robust slope.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from .q27_round_5_tpc_2 import _basket_edges_sym

_CMT_DRIVER_EDGES = 5_000_000


@register("config_model_triangles", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT src, dst FROM p0 UNION ALL SELECT dst, src
          FROM p0),
    dg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
           FROM e GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                 CAST(sum(deg) AS BIGINT) AS sum_d,
                 CAST(sum(deg * (deg - 1)) AS BIGINT) AS sum_d2
          FROM dg),
    tri AS (SELECT CAST(count(*) AS BIGINT) AS t
            FROM p0 ab JOIN p0 bc ON ab.dst = bc.src
                       JOIN p0 ac ON ac.src = ab.src
                                 AND ac.dst = bc.dst)
    SELECT (SELECT n_nodes FROM m) AS n_nodes,
           (SELECT sum_d FROM m) // 2 AS n_edges,
           (SELECT sum_d2 FROM m) AS sum_deg_sq_term,
           (SELECT t FROM tri) AS observed_triangles,
           (CAST((SELECT sum_d2 FROM m) AS DOUBLE)
            / CAST((SELECT sum_d FROM m) AS DOUBLE))
           * (CAST((SELECT sum_d2 FROM m) AS DOUBLE)
              / CAST((SELECT sum_d FROM m) AS DOUBLE))
           * (CAST((SELECT sum_d2 FROM m) AS DOUBLE)
              / CAST((SELECT sum_d FROM m) AS DOUBLE)) / 6.0
             AS expected_triangles,
           CAST((SELECT t FROM tri) AS DOUBLE)
           / ((CAST((SELECT sum_d2 FROM m) AS DOUBLE)
               / CAST((SELECT sum_d FROM m) AS DOUBLE))
              * (CAST((SELECT sum_d2 FROM m) AS DOUBLE)
                 / CAST((SELECT sum_d FROM m) AS DOUBLE))
              * (CAST((SELECT sum_d2 FROM m) AS DOUBLE)
                 / CAST((SELECT sum_d FROM m) AS DOUBLE)) / 6.0)
             AS excess_ratio""")
def config_model_triangles(sf_dir: str):
    """CONFIGURATION-MODEL null comparison for triangles: observed
    triangle count in the co-purchase graph vs the degree-preserving
    random-graph expectation (sum d(d-1) / sum d)^3 / 6 — is the
    clustering triangle_count measures REAL structure or just what
    hubs produce by chance? The null-model operator that turns a
    raw graph census into an inferential statement (the graph
    sibling of prr_signals' expected-vs-observed logic). Degrees
    and the observed triangle count are exact integer folds; the
    expectation and excess ratio are shared float expressions.
    Scale plan: the shared basket edges; up to the 5M-edge driver
    bound triangles count by sorted-adjacency intersection on one
    pull (part_pagerank's fast tier); the degree census is one
    bounded fold either way."""
    edges2 = _basket_edges_sym(sf_dir).materialize()
    if edges2.count() > _CMT_DRIVER_EDGES:
        raise ValueError(
            "config_model_triangles: edge list exceeds the driver "
            "fold bound; enable the wedge-exchange tier")
    e = edges2.to_pandas()
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    vs, cs = np.unique(src, return_counts=True)
    n_nodes = len(vs)
    sum_d = int(cs.sum())
    sum_d2 = int((cs * (cs - 1)).sum())
    und = src < dst
    us, ud = src[und], dst[und]
    adj: dict = {}
    for a, b in zip(us, ud):
        adj.setdefault(int(a), set()).add(int(b))
    tri = 0
    for a, nb in adj.items():
        for b in nb:
            nb2 = adj.get(b)
            if nb2:
                tri += len(nb & nb2)
    lam = np.float64(sum_d2) / np.float64(sum_d)
    exp_t = lam * lam * lam / 6.0
    return pd.DataFrame({
        "n_nodes": [np.int64(n_nodes)],
        "n_edges": [np.int64(sum_d // 2)],
        "sum_deg_sq_term": [np.int64(sum_d2)],
        "observed_triangles": [np.int64(tri)],
        "expected_triangles": [np.float64(exp_t)],
        "excess_ratio": [np.float64(tri) / exp_t]})


@register("abc_xyz", sql="""
    WITH li AS (SELECT l_partkey AS pk,
                       CAST(month(l_shipdate) AS BIGINT) AS mo,
                       CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS r,
                       CAST(l_quantity AS BIGINT) AS q
                FROM lineitem),
    p AS (SELECT pk, CAST(sum(r) AS BIGINT) AS rev
          FROM li GROUP BY pk),
    t AS (SELECT CAST(sum(rev) AS HUGEINT) AS tot FROM p),
    cum AS (SELECT pk, rev,
                   CAST(sum(rev) OVER (ORDER BY rev DESC, pk)
                        - rev AS HUGEINT) AS cb
            FROM p),
    abc AS (SELECT pk, rev,
                   CASE WHEN cb * 100 < (SELECT tot FROM t) * 70
                        THEN 'A'
                        WHEN cb * 100 < (SELECT tot FROM t) * 90
                        THEN 'B' ELSE 'C' END AS abc
            FROM cum),
    mq AS (SELECT pk, mo, CAST(sum(q) AS BIGINT) AS q
           FROM li GROUP BY pk, mo),
    cv AS (SELECT pk, CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(q) AS BIGINT) AS s,
                  CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT)
                    AS s2
           FROM mq GROUP BY pk),
    xyz AS (SELECT pk,
                   CASE WHEN 4 * (k * s2 - CAST(s AS HUGEINT) * s)
                             <= CAST(s AS HUGEINT) * s THEN 'X'
                        WHEN k * s2 - CAST(s AS HUGEINT) * s
                             <= CAST(s AS HUGEINT) * s THEN 'Y'
                        ELSE 'Z' END AS xyz
            FROM cv)
    SELECT abc.abc, xyz.xyz,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(abc.rev) AS BIGINT) AS revenue_cents
    FROM abc JOIN xyz ON abc.pk = xyz.pk
    GROUP BY abc.abc, xyz.xyz ORDER BY abc.abc, xyz.xyz""")
def abc_xyz(sf_dir: str):
    """ABC-XYZ INVENTORY MATRIX: every part classified by revenue
    concentration (A/B/C at the 70/90% cumulative thresholds —
    abc_class's ladder) AND by monthly demand volatility (X/Y/Z at
    CV 0.5 / 1.0) — the 9-cell planning grid that tells supply
    chains which parts deserve forecasting effort (AX) and which
    deserve safety stock (CZ). EVERY classification is an exact
    integer comparison: the ABC ladder compares cum*100 against
    tot*70 (no percentage float), and the CV thresholds cross-
    multiply to 4(k*S2 - S^2) <= S^2 — zero float boundaries in the
    whole operator. Scale plan: per-part revenue and monthly-demand
    cells fold through part-keyed partials; the cumulative ladder
    is the guarded driver rank (two-phase rank exchange at fleet
    scale, the dense-rank plan); the census output is 9 rows."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        r = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "mo": b["l_shipdate"].dt.month.to_numpy(np.int64),
            "r": r, "q": b["l_quantity"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64)}) \
            .groupby(["pk", "mo"], as_index=False).sum()
        for c in ("r", "q", "n"):
            g[c] = g[c].astype(np.int64)
        return g

    mq = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk", "mo"], ["r", "q", "n"], exact_int=True)
    per = mq.groupby("pk").agg(
        rev=("r", lambda s: sum(int(v) for v in s)),
        k=("mo", "size"),
        s=("q", lambda s: sum(int(v) for v in s)),
        s2=("q", lambda s: sum(int(v) * int(v) for v in s)))
    per = per.reset_index().sort_values(
        ["rev", "pk"], ascending=[False, True], kind="mergesort")
    tot = int(per["rev"].sum())
    cb = per["rev"].cumsum() - per["rev"]
    abc = np.where(cb.to_numpy() * 100 < tot * 70, "A",
                   np.where(cb.to_numpy() * 100 < tot * 90,
                            "B", "C"))
    k = per["k"].to_numpy(np.int64)
    s = per["s"].map(int).to_numpy(object)
    s2 = per["s2"].map(int).to_numpy(object)
    var_t = np.array([int(kk) * int(ss2) - int(ss) * int(ss)
                      for kk, ss, ss2 in zip(k, s, s2)], object)
    sq = np.array([int(ss) * int(ss) for ss in s], object)
    xyz = np.where([4 * int(v) <= int(q)
                    for v, q in zip(var_t, sq)], "X",
                   np.where([int(v) <= int(q)
                             for v, q in zip(var_t, sq)],
                            "Y", "Z"))
    out = pd.DataFrame({"abc": abc, "xyz": xyz,
                        "n_parts": np.ones(len(per), np.int64),
                        "revenue_cents": per["rev"].map(int)
                        .to_numpy(np.int64)}) \
        .groupby(["abc", "xyz"], as_index=False).sum()
    out["n_parts"] = out["n_parts"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values(["abc", "xyz"],
                           kind="mergesort").reset_index(drop=True)


@register("siegel_slope", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    sl AS (SELECT a.day AS di,
                  CAST(b.v - a.v AS DOUBLE)
                  / CAST(b.day - a.day AS DOUBLE) AS s,
                  b.day AS dj
           FROM d a JOIN d b ON a.day <> b.day),
    rk AS (SELECT di, s,
                  row_number() OVER (PARTITION BY di
                      ORDER BY s, dj) AS i
           FROM sl),
    med AS (SELECT di, s AS m FROM rk
            WHERE i = (SELECT n FROM n) // 2),
    g AS (SELECT m, row_number() OVER (ORDER BY m, di) AS i
          FROM med)
    SELECT (SELECT n FROM n) AS n_days,
           CAST(floor((SELECT m FROM g
                       WHERE i = ((SELECT n FROM n) + 1) // 2)
                      * 1000000.0 + 0.5) AS BIGINT)
             AS siegel_micro,
           (SELECT m FROM g
            WHERE i = ((SELECT n FROM n) + 1) // 2)
             AS siegel_slope""")
def siegel_slope(sf_dir: str):
    """SIEGEL REPEATED-MEDIANS slope of the daily revenue trend:
    for each day the median of its pairwise slopes to every other
    day, then the median of those medians — the 50%-breakdown
    robust regression that survives where theil_sen's 29% breaks
    down. Every pairwise slope is the SAME exact-int-cast double on
    both engines (dv/dday), medians are lower order statistics
    selected by (slope, day) order — identical doubles make the
    selection deterministic — and only the final report quantizes.
    Scale plan: per-batch (day, cents) partials through the bounded
    day-domain combine; the O(days^2) repeated-median scan runs on
    the driver — the day domain, not row count, bounds the
    quadratic."""
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
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    day = d["day"].to_numpy(np.int64)
    v = np.array([int(x) for x in d["v"]], np.int64)
    n = len(v)
    meds = np.empty(n, np.float64)
    half = n // 2                     # lower median of n-1 slopes
    for i in range(n):
        m = np.arange(n) != i
        s = (v[m] - v[i]).astype(np.float64) \
            / (day[m] - day[i]).astype(np.float64)
        order = np.lexsort((day[m], s))
        meds[i] = s[order][half - 1]
    order = np.lexsort((day, meds))
    gm = meds[order][(n + 1) // 2 - 1]
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "siegel_micro": [np.int64(int(np.floor(
            gm * 1000000.0 + 0.5)))],
        "siegel_slope": [np.float64(gm)]})
