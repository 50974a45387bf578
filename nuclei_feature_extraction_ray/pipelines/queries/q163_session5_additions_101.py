# round-5 session-5 additions, batch 101: the Foster-Stuart records
# test, Greenwood's spacing statistic, and the one-lag ARCH LM test.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue


@register("foster_stuart", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v,
                 CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS i,
                 max(v) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS pmax,
                 min(v) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS pmin
          FROM d),
    s AS (SELECT
        CAST(sum(CASE WHEN i > 1 AND v > pmax THEN 1 ELSE 0 END)
             AS BIGINT) AS up,
        CAST(sum(CASE WHEN i > 1 AND v < pmin THEN 1 ELSE 0 END)
             AS BIGINT) AS low,
        CAST(count(*) AS BIGINT) AS n
        FROM x),
    h AS (SELECT CAST(sum(CAST(floor(1000000000.0
                / CAST(i AS DOUBLE) + 0.5) AS BIGINT))
                AS HUGEINT) AS hsum
          FROM x WHERE i >= 2)
    SELECT (SELECT n FROM s) AS n_days,
           (SELECT up FROM s) AS upper_records,
           (SELECT low FROM s) AS lower_records,
           (CAST((SELECT up FROM s) AS DOUBLE)
            - CAST((SELECT low FROM s) AS DOUBLE))
           / sqrt(2.0 * CAST((SELECT hsum FROM h) AS DOUBLE)
                  / 1000000000.0) AS foster_stuart_d""")
def foster_stuart(sf_dir: str):
    """FOSTER-STUART RECORDS TEST on daily revenue: count
    upper records (new all-time highs) minus lower records (new
    all-time lows); under no trend both accrue at rate 1/t, so D
    = (U - L)/sqrt(2*(H_n - 1)) is asymptotically standard normal
    — the trend test USING ONLY RECORD EVENTS, maximally robust
    to any monotone transformation of the values (cox_stuart
    compares halves, Page needs blocks; records need nothing).
    Record detection is exact integer prefix max/min; the
    harmonic variance sum folds as nano-quantized shared-float
    terms (one per index, exact fold); D is one shared float
    expression. Scale plan: bounded day-domain combine; the
    scan is O(days) driver work."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    up = low = 0
    pmax = pmin = None
    for i, x in enumerate(v, start=1):
        if i > 1:
            if x > pmax:
                up += 1
            if x < pmin:
                low += 1
        pmax = x if pmax is None else max(pmax, x)
        pmin = x if pmin is None else min(pmin, x)
    hsum = sum(int(np.floor(1000000000.0 / np.float64(i) + 0.5))
               for i in range(2, n + 1))
    d = (np.float64(up) - np.float64(low)) \
        / np.sqrt(2.0 * np.float64(hsum) / 1000000000.0)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "upper_records": [np.int64(up)],
        "lower_records": [np.int64(low)],
        "foster_stuart_d": [np.float64(d)]})


@register("greenwood_stat", sql="""
    WITH """ + _DAILY_SQL + """,
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS s2
          FROM d)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s2 AS DOUBLE)
           / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             AS greenwood_g,
           CAST(s2 AS DOUBLE)
           / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           * CAST(n AS DOUBLE) AS greenwood_ng
    FROM t""")
def greenwood_stat(sf_dir: str):
    """GREENWOOD'S STATISTIC on the daily revenue shares: G =
    sum (v_d / total)^2 — the classic SPACINGS uniformity
    statistic (n*G -> 2 for perfectly exponential spacings, 1
    for a perfectly even split, large for clumping) here reading
    how lumpily the year's revenue is spread over its days; the
    one-number spacing complement to gini_spend (G is exactly
    the Simpson/HHI of days, with a known sampling theory from
    the spacings literature). Both moments fold as exact big
    ints; G and n*G are shared float expressions. Scale plan:
    bounded day-domain combine; O(1) driver arithmetic."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    s = sum(v)
    s2 = sum(x * x for x in v)
    g = np.float64(s2) / (np.float64(s) * np.float64(s))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "greenwood_g": [g],
        "greenwood_ng": [g * np.float64(n)]})


@register("arch_lm", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v - lag(v) OVER (ORDER BY day) AS dv
          FROM d),
    w AS (SELECT day,
                 CAST(CAST(dv AS HUGEINT) // 100 AS HUGEINT)
                   AS dv
          FROM x WHERE dv IS NOT NULL),
    q AS (SELECT day, dv * dv AS e2,
                 lag(dv * dv) OVER (ORDER BY day) AS le2
          FROM w),
    z AS (SELECT CAST(e2 AS HUGEINT) AS y,
                 CAST(le2 AS HUGEINT) AS x
          FROM q WHERE le2 IS NOT NULL),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM z)
    SELECT CAST(n AS BIGINT) AS n_obs,
           (CAST(n AS DOUBLE)
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS arch_lm
    FROM m""")
def arch_lm(sf_dir: str):
    """ONE-LAG ARCH LM TEST on daily revenue changes: regress
    squared changes on their own lag; LM = n*R^2 — the standard
    volatility-clustering test (Engle) whose rejection is the
    precondition for everything GARCH-shaped: vol_of_vol
    MEASURES the clustering, arch_lm TESTS it (and ljung_box on
    levels cannot see it, since squares can correlate while
    levels do not). Squared changes are exact integer dollars^2
    (truncation-mirrored); all five regression moments fold as
    exact big ints; LM = n * (n*Sxy - SxSy)^2 / ((n*Sxx - Sx^2)
    (n*Syy - Sy^2)) is evaluated as one identical shared float
    expression in both engines (the granger_1lag policy for the
    beyond-INT128 products). Scale plan: bounded day-domain
    combine; O(1) driver arithmetic."""
    days, v = _daily_revenue(sf_dir)
    dv = [(b - a) // 100 if b >= a else -((a - b) // 100)
          for a, b in zip(v, v[1:])]
    e2 = [x * x for x in dv]
    pairs = list(zip(e2[:-1], e2[1:]))
    n = len(pairs)
    sx = sum(a for a, _ in pairs)
    sy = sum(b for _, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    syy = sum(b * b for _, b in pairs)
    sxy = sum(a * b for a, b in pairs)
    nf = np.float64(n)
    num = nf * np.float64(sxy) - np.float64(sx) * np.float64(sy)
    lm = (nf * num * num) \
        / ((nf * np.float64(sxx)
            - np.float64(sx) * np.float64(sx))
           * (nf * np.float64(syy)
              - np.float64(sy) * np.float64(sy)))
    return pd.DataFrame({
        "n_obs": [np.int64(n)],
        "arch_lm": [np.float64(lm)]})
