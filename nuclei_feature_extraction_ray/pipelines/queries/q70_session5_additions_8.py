# round-5 session-5 additions, batch 8: Laspeyres/Paasche/Fisher
# price indexes between two ship years, L-moments of the daily
# revenue distribution, and Wald's SPRT sequential A/B test over the
# daily purchase-rate stream.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_PI_Y0, _PI_Y1 = 1996, 1997
_SPRT_P0, _SPRT_P1 = 0.18, 0.22
_SPRT_ALPHA = 19.0      # (1-beta)/alpha with alpha = beta = 0.05


@register("price_index_fisher", sql="""
    WITH li AS (SELECT l_partkey AS pk,
                       CAST(year(l_shipdate) AS BIGINT) AS y,
                       CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS r,
                       CAST(l_quantity AS BIGINT) AS q
                FROM lineitem
                WHERE year(l_shipdate) IN ({y0}, {y1})),
    a AS (SELECT pk, y, CAST(sum(r) AS BIGINT) AS r,
                 CAST(sum(q) AS BIGINT) AS q
          FROM li GROUP BY 1, 2),
    j AS (SELECT a0.pk, a0.r AS r0, a0.q AS q0,
                 a1.r AS r1, a1.q AS q1
          FROM a a0 JOIN a a1 ON a0.pk = a1.pk
          WHERE a0.y = {y0} AND a1.y = {y1}),
    t AS (SELECT CAST(count(*) AS BIGINT) AS np,
                 CAST(sum(r0) AS HUGEINT) AS sr0,
                 CAST(sum(r1) AS HUGEINT) AS sr1,
                 CAST(sum(CAST(floor(
                     CAST(CAST(r1 AS HUGEINT) * q0 AS DOUBLE)
                     / CAST(q1 AS DOUBLE) + 0.5) AS BIGINT))
                     AS HUGEINT) AS lnum,
                 CAST(sum(CAST(floor(
                     CAST(CAST(r0 AS HUGEINT) * q1 AS DOUBLE)
                     / CAST(q0 AS DOUBLE) + 0.5) AS BIGINT))
                     AS HUGEINT) AS pden
          FROM j)
    SELECT np AS n_common_parts,
           CAST(sr0 AS BIGINT) AS base_rev_cents,
           CAST(sr1 AS BIGINT) AS curr_rev_cents,
           CAST(lnum AS DOUBLE) / CAST(sr0 AS DOUBLE) AS laspeyres,
           CAST(sr1 AS DOUBLE) / CAST(pden AS DOUBLE) AS paasche,
           sqrt(CAST(lnum AS DOUBLE) / CAST(sr0 AS DOUBLE)
                * (CAST(sr1 AS DOUBLE) / CAST(pden AS DOUBLE)))
             AS fisher
    FROM t""".format(y0=_PI_Y0, y1=_PI_Y1))
def price_index_fisher(sf_dir: str):
    """PRICE INDEX NUMBERS between ship years {y0} -> {y1} over the
    parts traded in BOTH: unit-value Laspeyres (base-quantity
    weights), Paasche (current-quantity weights), and their
    geometric-mean Fisher ideal index — the economics operator for
    'how much of revenue growth is price vs volume'. Each part's
    cross-valued revenue R1*Q0/Q1 (resp. R0*Q1/Q0) is one exact-int
    product with ONE division, quantized to whole cents with the
    shared half-up formula before the integer fold; the three
    indexes are shared float expressions over four integer sums.
    Scale plan: per-batch (part, year) partials flow through ONE
    part-keyed exchange whose partitions pair the two years and emit
    4 scalars; the driver combine is O(partitions)."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_shipdate"].dt.year.to_numpy(np.int64)
        m = (y == _PI_Y0) | (y == _PI_Y1)
        r = np.floor(b["l_extendedprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64)[m],
            "y": y[m], "r": r[m],
            "q": b["l_quantity"].to_numpy(np.int64)[m]}) \
            .groupby(["pk", "y"], as_index=False).sum()
        for c in ("r", "q"):
            g[c] = g[c].astype(np.int64)
        return g

    def pair(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["pk", "y"], as_index=False)[["r", "q"]].sum()
        a0 = a[a["y"] == _PI_Y0].set_index("pk")
        a1 = a[a["y"] == _PI_Y1].set_index("pk")
        common = a0.index.intersection(a1.index)
        if not len(common):
            return pd.DataFrame({
                "j": pd.Series(dtype=np.int64),
                "np_": pd.Series(dtype=np.int64),
                "sr0": pd.Series(dtype=np.int64),
                "sr1": pd.Series(dtype=np.int64),
                "lnum": pd.Series(dtype=np.int64),
                "pden": pd.Series(dtype=np.int64)})
        r0 = a0.loc[common, "r"].to_numpy(np.int64)
        q0 = a0.loc[common, "q"].to_numpy(np.int64)
        r1 = a1.loc[common, "r"].to_numpy(np.int64)
        q1 = a1.loc[common, "q"].to_numpy(np.int64)
        lnum = np.floor((r1 * q0).astype(np.float64)
                        / q1.astype(np.float64)
                        + 0.5).astype(np.int64)
        pden = np.floor((r0 * q1).astype(np.float64)
                        / q0.astype(np.float64)
                        + 0.5).astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "np_": np.array([len(common)], np.int64),
            "sr0": np.array([int(r0.sum())], np.int64),
            "sr1": np.array([int(r1.sum())], np.int64),
            "lnum": np.array([int(lnum.sum())], np.int64),
            "pden": np.array([int(pden.sum())], np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["pk"], pair, 16),
        ["j"], ["np_", "sr0", "sr1", "lnum", "pden"],
        exact_int=True)
    npc = int(s["np_"].iloc[0])
    sr0, sr1 = int(s["sr0"].iloc[0]), int(s["sr1"].iloc[0])
    lnum, pden = int(s["lnum"].iloc[0]), int(s["pden"].iloc[0])
    las = np.float64(lnum) / np.float64(sr0)
    paa = np.float64(sr1) / np.float64(pden)
    return pd.DataFrame({
        "n_common_parts": [np.int64(npc)],
        "base_rev_cents": [np.int64(sr0)],
        "curr_rev_cents": [np.int64(sr1)],
        "laspeyres": [np.float64(las)],
        "paasche": [np.float64(paa)],
        "fisher": [np.sqrt(np.float64(lnum) / np.float64(sr0)
                           * (np.float64(sr1)
                              / np.float64(pden)))]})


@register("l_moments", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    r AS (SELECT v, CAST(row_number() OVER (ORDER BY v, day)
                         AS BIGINT) AS i
          FROM d),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS b0,
                 CAST(sum(CAST(v AS HUGEINT) * (i - 1)) AS HUGEINT)
                   AS b1,
                 CAST(sum(CAST(v AS HUGEINT) * (i - 1) * (i - 2))
                      AS HUGEINT) AS b2
          FROM r)
    SELECT n AS n_days, CAST(b0 AS BIGINT) AS s0,
           CAST(b1 AS BIGINT) AS s1, CAST(b2 AS BIGINT) AS s2,
           CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) AS l1,
           (2.0 * CAST(b1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
            - CAST(b0 AS DOUBLE)) / CAST(n AS DOUBLE) AS l2,
           ((2.0 * CAST(b1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
             - CAST(b0 AS DOUBLE)) / CAST(n AS DOUBLE))
           / (CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE)) AS l_cv,
           ((6.0 * CAST(b2 AS DOUBLE)
             / (CAST(n - 1 AS DOUBLE) * CAST(n - 2 AS DOUBLE))
             - 6.0 * CAST(b1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
             + CAST(b0 AS DOUBLE)) / CAST(n AS DOUBLE))
           / ((2.0 * CAST(b1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
               - CAST(b0 AS DOUBLE)) / CAST(n AS DOUBLE)) AS l_skew
    FROM m""")
def l_moments(sf_dir: str):
    """L-MOMENTS of the daily-revenue distribution: L-location,
    L-scale, L-CV and L-skewness from probability-weighted moments
    b_r — the order-statistics moments that exist for ANY
    distribution with finite mean and resist outliers where
    classical skewness explodes (the robust complement of
    winsorized_stats / value_outliers). The weighted sums
    sum x_(i)*(i-1)(i-2)... are EXACT integers once ranks are
    assigned (value order, day tie-break), so every ratio is a
    shared float expression over exact int folds. Scale plan:
    per-batch (day, cents) partials through the bounded day-domain
    combine; ranking and the weighted sums are O(days) on the
    driver — the day domain, not row count, bounds the sort."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True)
    d = d.assign(v_int=d["v"].map(int)) \
        .sort_values(["v_int", "day"],
                     kind="mergesort").reset_index(drop=True)
    v = [int(x) for x in d["v_int"]]
    n = len(v)
    b0 = sum(v)
    b1 = sum(x * i for i, x in enumerate(v))          # (i-1) weight
    b2 = sum(x * i * (i - 1) for i, x in enumerate(v))
    fn_, fb0 = np.float64(n), np.float64(b0)
    l1 = fb0 / fn_
    l2 = (2.0 * np.float64(b1) / np.float64(n - 1) - fb0) / fn_
    l3 = (6.0 * np.float64(b2)
          / (np.float64(n - 1) * np.float64(n - 2))
          - 6.0 * np.float64(b1) / np.float64(n - 1) + fb0) / fn_
    return pd.DataFrame({
        "n_days": [np.int64(n)], "s0": [np.int64(b0)],
        "s1": [np.int64(b1)], "s2": [np.int64(b2)],
        "l1": [np.float64(l1)], "l2": [np.float64(l2)],
        "l_cv": [np.float64(l2 / l1)],
        "l_skew": [np.float64(l3 / l2)]})


@register("sprt_ab", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(count(*) AS BIGINT) AS t,
                      CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS s
               FROM events GROUP BY 1),
    l AS (SELECT day, t, s,
                 CAST(floor((CAST(s AS DOUBLE) * ln({p1} / {p0})
                             + CAST(t - s AS DOUBLE)
                               * ln((1.0 - {p1}) / (1.0 - {p0})))
                            * 1000000.0 + 0.5) AS BIGINT) AS lm
          FROM d),
    c AS (SELECT day, t, s,
                 CAST(sum(lm) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM l),
    thr AS (SELECT CAST(floor(ln({a}) * 1000000.0 + 0.5) AS BIGINT)
                     AS h),
    hit AS (SELECT day, cum,
                   CASE WHEN cum >= (SELECT h FROM thr) THEN 1
                        WHEN cum <= -(SELECT h FROM thr) THEN -1
                        ELSE 0 END AS dec,
                   row_number() OVER (ORDER BY day) AS rn
            FROM c),
    st AS (SELECT day, dec,
                  row_number() OVER (ORDER BY day) AS srn
           FROM hit WHERE dec <> 0),
    fin AS (SELECT cum FROM hit ORDER BY rn DESC LIMIT 1)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           (SELECT cum FROM fin) AS final_llr_micro,
           (SELECT h FROM thr) AS threshold_micro,
           (SELECT day FROM st WHERE srn = 1) AS stop_day,
           CAST(COALESCE((SELECT dec FROM st WHERE srn = 1), 0)
                AS BIGINT) AS decision""".format(
    p0=_SPRT_P0, p1=_SPRT_P1, a=_SPRT_ALPHA))
def sprt_ab(sf_dir: str):
    """WALD'S SPRT (sequential probability ratio test) on the daily
    purchase-rate stream: is the conversion rate p1=0.22 rather than
    p0=0.18? Each day's Bernoulli log-likelihood-ratio increment
    s*ln(p1/p0) + (t-s)*ln(q1/q0) quantizes to micro units with the
    shared half-up formula, the cumulative LLR is an exact integer
    prefix sum in day order, and the stopping rule compares integers
    against the quantized boundary ln((1-b)/a) — the sequential-
    testing operator that ends an A/B test the day the evidence
    suffices instead of at a fixed horizon. Reports the first
    crossing day and decision (+1 accept H1 / -1 accept H0 / 0 still
    running). Scale plan: per-batch (day, trials, successes)
    partials through the bounded day-domain combine; the stopping
    scan is O(days) on the driver."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        s = (b["event_type"].to_numpy(object)
             == "purchase").astype(np.int64)
        g = pd.DataFrame({"day": day,
                          "t": np.ones(len(b), np.int64),
                          "s": s}).groupby("day",
                                           as_index=False).sum()
        for c in ("t", "s"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["t", "s"]).sort_values("day") \
        .reset_index(drop=True)
    t = d["t"].to_numpy(np.int64).astype(np.float64)
    s = d["s"].to_numpy(np.int64).astype(np.float64)
    lm = np.floor((s * np.log(_SPRT_P1 / _SPRT_P0)
                   + (t - s) * np.log((1.0 - _SPRT_P1)
                                      / (1.0 - _SPRT_P0)))
                  * 1000000.0 + 0.5).astype(np.int64)
    cum = np.cumsum(lm)
    thr = int(np.floor(np.log(_SPRT_ALPHA) * 1000000.0 + 0.5))
    dec = np.where(cum >= thr, 1, np.where(cum <= -thr, -1, 0))
    nz = np.nonzero(dec)[0]
    if len(nz):
        stop_day = np.int64(int(d["day"].iloc[nz[0]]))
        decision = np.int64(int(dec[nz[0]]))
    else:
        stop_day, decision = np.nan, np.int64(0)
    return pd.DataFrame({
        "n_days": [np.int64(len(d))],
        "final_llr_micro": [np.int64(int(cum[-1]))],
        "threshold_micro": [np.int64(thr)],
        "stop_day": [stop_day], "decision": [decision]})
