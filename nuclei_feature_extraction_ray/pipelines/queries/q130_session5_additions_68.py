# round-5 session-5 additions, batch 68: the Grubbs extreme-outlier
# test on daily revenue, the Spearman footrule distance between two
# supplier rankings, and the Lorenz asymmetry decomposition.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)


@register("grubbs_test", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS s2
          FROM d),
    w AS (SELECT day, v,
                 abs(CAST(v AS HUGEINT) * (SELECT n FROM t)
                     - (SELECT s FROM t)) AS dev
          FROM d ORDER BY dev DESC, day LIMIT 1)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_days,
           (SELECT day FROM w) AS outlier_day,
           (SELECT v FROM w) AS outlier_cents,
           CAST((SELECT dev FROM w) AS DOUBLE)
           / (CAST((SELECT n FROM t) AS DOUBLE)
              * sqrt((CAST((SELECT s2 FROM t) AS DOUBLE)
                      - CAST((SELECT s FROM t) AS DOUBLE)
                        * CAST((SELECT s FROM t) AS DOUBLE)
                        / CAST((SELECT n FROM t) AS DOUBLE))
                     / (CAST((SELECT n FROM t) AS DOUBLE) - 1.0)))
             AS grubbs_g""")
def grubbs_test(sf_dir: str):
    """GRUBBS EXTREME-OUTLIER TEST on daily revenue: the single
    most deviant day and its G = |x - mean| / s — the classical
    'is the worst point an outlier' statistic that anomaly
    triagers run BEFORE robust methods (isolation_stumps,
    mahalanobis_outliers flag many; Grubbs asks whether even the
    single worst one is defensible). The argmax is decided by the
    EXACT integer deviation |x*n - S| (day tie-break); moments
    fold as exact big ints; G is one shared float expression.
    Scale plan: bounded day-domain combine; the argmax scan is
    O(days) driver work."""
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
        ["day"], ["v"], exact_int=True)
    days = [int(x) for x in d["day"]]
    vals = [int(x) for x in d["v"]]
    n = len(vals)
    s = sum(vals)
    s2 = sum(x * x for x in vals)
    best = min(range(n),
               key=lambda i: (-abs(vals[i] * n - s), days[i]))
    dev = abs(vals[best] * n - s)
    g = np.float64(dev) / (np.float64(n) * np.sqrt(
        (np.float64(s2) - np.float64(s) * np.float64(s)
         / np.float64(n)) / (np.float64(n) - 1.0)))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "outlier_day": [np.int64(days[best])],
        "outlier_cents": [np.int64(vals[best])],
        "grubbs_g": [np.float64(g)]})


@register("spearman_footrule", sql="""
    WITH s AS (SELECT l_suppkey,
                      CAST(sum(CAST(floor(l_extendedprice * 100
                                          + 0.5) AS BIGINT))
                           AS BIGINT) AS rev,
                      CAST(count(*) AS BIGINT) AS lines
               FROM lineitem GROUP BY 1),
    r AS (SELECT l_suppkey,
                 CAST(row_number() OVER (ORDER BY rev DESC,
                                         l_suppkey) AS BIGINT)
                   AS r1,
                 CAST(row_number() OVER (ORDER BY lines DESC,
                                         l_suppkey) AS BIGINT)
                   AS r2
          FROM s)
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(abs(r1 - r2)) AS BIGINT) AS footrule,
           CAST(sum(abs(r1 - r2)) AS DOUBLE)
           / CAST((count(*) * count(*)) // 2 AS DOUBLE)
             AS footrule_norm
    FROM r""")
def spearman_footrule(sf_dir: str):
    """SPEARMAN FOOTRULE DISTANCE between two supplier rankings:
    rank by revenue versus rank by line count, F = sum |r1 - r2|,
    normalized by its maximum floor(n^2/2) — the L1 rank-agreement
    metric (a 2-approximation of Kendall distance, Diaconis-Graham)
    that median_rank_agg AGGREGATES rankings with but never
    reports distance between; here it answers 'does volume rank
    the same suppliers as money?'. Ranks are exact integer
    row-numbers with suppkey tie-breaks; F and its bound are exact
    integers with one final division. Scale plan: supplier-keyed
    combine (bounded domain); ranking is the two-phase rank
    exchange at fleet scale, here the guarded driver sort."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["l_extendedprice"]
                         .to_numpy(np.float64) * 100 + 0.5) \
            .astype(np.int64)
        g = pd.DataFrame({
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "rev": cents,
            "lines": np.ones(len(b), np.int64)}) \
            .groupby("l_suppkey", as_index=False).sum()
        for c in ("rev", "lines"):
            g[c] = g[c].astype(np.int64)
        return g

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_suppkey"], ["rev", "lines"], exact_int=True)
    key = s["l_suppkey"].to_numpy(np.int64)
    rev = np.array([int(x) for x in s["rev"]], np.int64)
    lines = np.array([int(x) for x in s["lines"]], np.int64)
    n = len(key)
    r1 = np.empty(n, np.int64)
    r1[np.lexsort((key, -rev))] = np.arange(1, n + 1)
    r2 = np.empty(n, np.int64)
    r2[np.lexsort((key, -lines))] = np.arange(1, n + 1)
    f = int(np.abs(r1 - r2).sum())
    return pd.DataFrame({
        "n_suppliers": [np.int64(n)],
        "footrule": [np.int64(f)],
        "footrule_norm": [np.float64(f)
                          / np.float64(n * n // 2)]})


@register("lorenz_asymmetry", sql="""
    WITH u AS (SELECT o_custkey,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM u),
    b AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(COALESCE(sum(v), 0) AS HUGEINT) AS sb
          FROM u
          WHERE CAST(v AS HUGEINT) * (SELECT n FROM t)
                < (SELECT s FROM t))
    SELECT (SELECT n FROM t) AS n_customers,
           (SELECT m FROM b) AS n_below_mean,
           CAST((SELECT m FROM b) AS DOUBLE)
             / CAST((SELECT n FROM t) AS DOUBLE) AS f_share,
           CAST((SELECT sb FROM b) AS DOUBLE)
             / CAST((SELECT s FROM t) AS DOUBLE) AS l_share,
           CAST((SELECT m FROM b) AS DOUBLE)
             / CAST((SELECT n FROM t) AS DOUBLE)
           + CAST((SELECT sb FROM b) AS DOUBLE)
             / CAST((SELECT s FROM t) AS DOUBLE)
             AS lorenz_asymmetry""")
def lorenz_asymmetry(sf_dir: str):
    """LORENZ ASYMMETRY COEFFICIENT (discrete variant, no
    interpolation) of customer spend: S = F(mu) + L(mu), the share
    of customers below the mean plus the share of spend they hold —
    S = 1 means the Lorenz curve is symmetric; S < 1 says
    inequality is driven by a few giants, S > 1 by many paupers —
    the SHAPE diagnosis gini_spend's single number cannot make
    (two very different economies share one Gini). Membership
    below the mean is the exact integer test v*n < S; counts and
    mass fold exactly; three final divisions. Scale plan: one
    customer-keyed combine; the below-mean census is a second
    map-only pass at fleet scale (here driver arithmetic)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(np.int64),
            "v": cents}).groupby("o_custkey",
                                 as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    u = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_custkey"], ["v"], exact_int=True)
    vals = [int(x) for x in u["v"]]
    n = len(vals)
    s = sum(vals)
    m = sum(1 for x in vals if x * n < s)
    sb = sum(x for x in vals if x * n < s)
    f = np.float64(m) / np.float64(n)
    l = np.float64(sb) / np.float64(s)
    return pd.DataFrame({
        "n_customers": [np.int64(n)],
        "n_below_mean": [np.int64(m)],
        "f_share": [f], "l_share": [l],
        "lorenz_asymmetry": [f + l]})
