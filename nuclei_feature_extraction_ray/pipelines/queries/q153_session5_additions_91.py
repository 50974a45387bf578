# round-5 session-5 additions, batch 91: Higuchi fractal dimension,
# the Christoffersen independence test for VaR violations, and the
# Sharpe/Sortino/Omega risk-ratio panel.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue


@register("higuchi_fd", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS i,
                 v
          FROM d),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
    km AS (SELECT CAST(k.k AS BIGINT) AS k,
                  CAST(m.m AS BIGINT) AS m
           FROM (VALUES (1), (2), (3), (4), (5)) k(k)
           JOIN (VALUES (1), (2), (3), (4), (5)) m(m)
             ON m.m <= k.k),
    seg AS (SELECT km.k, km.m,
                   CAST(sum(abs(b.v - a.v)) AS HUGEINT) AS s,
                   CAST(count(*) AS BIGINT) AS nm
            FROM km
            JOIN x a ON a.i >= km.m
                    AND (a.i - km.m) % km.k = 0
            JOIN x b ON b.i = a.i + km.k
            GROUP BY km.k, km.m),
    lq AS (SELECT k,
                  CAST(sum(s * ((SELECT n FROM t) - 1)
                           * 1000000 // (nm * k * k))
                       AS HUGEINT) // k AS lk
           FROM seg GROUP BY k),
    pts AS (SELECT
        CAST(floor(ln(CAST(lk AS DOUBLE)) * 1000000.0 + 0.5)
             AS BIGINT) AS ly,
        CAST(floor(ln(1.0 / CAST(k AS DOUBLE)) * 1000000.0
                   + 0.5) AS BIGINT) AS lx
        FROM lq),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS c,
                 CAST(sum(lx) AS HUGEINT) AS sx,
                 CAST(sum(ly) AS HUGEINT) AS sy,
                 CAST(sum(CAST(lx AS HUGEINT) * ly) AS HUGEINT)
                   AS sxy,
                 CAST(sum(CAST(lx AS HUGEINT) * lx) AS HUGEINT)
                   AS sxx
          FROM pts)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_days,
           (CAST((SELECT c FROM m) AS DOUBLE)
            * CAST((SELECT sxy FROM m) AS DOUBLE)
            - CAST((SELECT sx FROM m) AS DOUBLE)
              * CAST((SELECT sy FROM m) AS DOUBLE))
           / (CAST((SELECT c FROM m) AS DOUBLE)
              * CAST((SELECT sxx FROM m) AS DOUBLE)
              - CAST((SELECT sx FROM m) AS DOUBLE)
                * CAST((SELECT sx FROM m) AS DOUBLE))
             AS higuchi_fd""")
def higuchi_fd(sf_dir: str):
    """HIGUCHI FRACTAL DIMENSION of daily revenue: reconstruct
    the curve at stride k = 1..5 (k offsets each), measure each
    subsampled curve's normalized length, and regress ln(L_k) on
    ln(1/k) — FD near 1 means a smooth trending curve, near 2 a
    plane-filling jagged one; the direct geometric cousin of
    hurst_rs (FD = 2 - H for self-affine series, so disagreement
    between the two flags non-fractal structure). Every curve
    length is an EXACT integer via the floor-division
    normalization S*(n-1)*1e6 // (N_m * k^2), offset means use
    exact floor-div by k, and the 5-point OLS on micro-ln values
    is exact big-int arithmetic. Scale plan: bounded day-domain
    combine; the stride scans are O(5n) driver work."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    k_ = c = sx = sy = sxy = sxx = 0
    for k in range(1, 6):
        acc = 0
        for m in range(1, k + 1):
            s = 0
            nm = 0
            i = m
            while i + k <= n:
                s += abs(v[i + k - 1] - v[i - 1])
                nm += 1
                i += k
            acc += s * (n - 1) * 1000000 // (nm * k * k)
        lk = acc // k
        ly = int(np.floor(np.log(np.float64(lk)) * 1000000.0
                          + 0.5))
        lx = int(np.floor(np.log(1.0 / np.float64(k))
                          * 1000000.0 + 0.5))
        c += 1
        sx += lx
        sy += ly
        sxy += lx * ly
        sxx += lx * lx
    fd = (np.float64(c) * np.float64(sxy)
          - np.float64(sx) * np.float64(sy)) \
        / (np.float64(c) * np.float64(sxx)
           - np.float64(sx) * np.float64(sx))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "higuchi_fd": [np.float64(fd)]})


@register("christoffersen", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v - lag(v) OVER (ORDER BY day) AS dv
          FROM d),
    w AS (SELECT day, dv FROM x WHERE dv IS NOT NULL),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
    th AS (SELECT max(dv) AS u FROM (
               SELECT dv, row_number() OVER (ORDER BY dv) AS rk
               FROM w)
           WHERE rk = ((SELECT n FROM t) * 5 + 99) // 100),
    seq AS (SELECT day,
                   CASE WHEN dv < (SELECT u FROM th)
                        THEN 1 ELSE 0 END AS hit
            FROM w),
    tr AS (SELECT hit,
                  lag(hit) OVER (ORDER BY day) AS ph
           FROM seq),
    c AS (SELECT
        CAST(sum(CASE WHEN ph = 0 AND hit = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n00,
        CAST(sum(CASE WHEN ph = 0 AND hit = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n01,
        CAST(sum(CASE WHEN ph = 1 AND hit = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n10,
        CAST(sum(CASE WHEN ph = 1 AND hit = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n11
        FROM tr WHERE ph IS NOT NULL)
    SELECT n00, n01, n10, n11,
           -2.0 * ((CASE WHEN n01 + n11 > 0
                    THEN CAST(n01 + n11 AS DOUBLE)
                         * ln(CAST(n01 + n11 AS DOUBLE)
                              / CAST(n00 + n01 + n10 + n11
                                     AS DOUBLE)) ELSE 0.0 END
                    + CASE WHEN n00 + n10 > 0
                      THEN CAST(n00 + n10 AS DOUBLE)
                           * ln(CAST(n00 + n10 AS DOUBLE)
                                / CAST(n00 + n01 + n10 + n11
                                       AS DOUBLE)) ELSE 0.0 END)
                   - (CASE WHEN n01 > 0
                      THEN CAST(n01 AS DOUBLE)
                           * ln(CAST(n01 AS DOUBLE)
                                / CAST(n00 + n01 AS DOUBLE))
                      ELSE 0.0 END
                      + CASE WHEN n00 > 0
                        THEN CAST(n00 AS DOUBLE)
                             * ln(CAST(n00 AS DOUBLE)
                                  / CAST(n00 + n01 AS DOUBLE))
                        ELSE 0.0 END
                      + CASE WHEN n11 > 0
                        THEN CAST(n11 AS DOUBLE)
                             * ln(CAST(n11 AS DOUBLE)
                                  / CAST(n10 + n11 AS DOUBLE))
                        ELSE 0.0 END
                      + CASE WHEN n10 > 0
                        THEN CAST(n10 AS DOUBLE)
                             * ln(CAST(n10 AS DOUBLE)
                                  / CAST(n10 + n11 AS DOUBLE))
                        ELSE 0.0 END))
             AS lr_independence
    FROM c""")
def christoffersen(sf_dir: str):
    """CHRISTOFFERSEN INDEPENDENCE TEST on VaR violations: mark
    each day whose revenue CHANGE breaches the empirical 5%
    quantile (exact type-1 order statistic), build the 2x2
    transition census of the hit sequence, and compute the
    likelihood ratio of 'hits cluster' (Markov) against 'hits are
    independent' — the conditional-coverage half of backtesting
    that kupiec_pof's unconditional count misses entirely (a VaR
    can hit 5% of days yet fail catastrophically by hitting them
    ALL IN A ROW). Transition counts are exact integers; the LR
    is one shared float expression of count*ln(exact ratio)
    terms in a fixed order. Scale plan: bounded day-domain
    combine; the transition census is O(days) driver work."""
    days, v = _daily_revenue(sf_dir)
    dv = [b - a for a, b in zip(v, v[1:])]
    n = len(dv)
    rk = (n * 5 + 99) // 100
    u = sorted(dv)[rk - 1]
    hits = [1 if x < u else 0 for x in dv]
    n00 = n01 = n10 = n11 = 0
    for a, b in zip(hits, hits[1:]):
        if a == 0 and b == 0:
            n00 += 1
        elif a == 0:
            n01 += 1
        elif b == 0:
            n10 += 1
        else:
            n11 += 1
    tot = np.float64(n00 + n01 + n10 + n11)

    def term(a, b):
        if a <= 0:
            return 0.0
        return np.float64(a) * np.log(np.float64(a)
                                      / np.float64(b))

    l0 = term(n01 + n11, n00 + n01 + n10 + n11) \
        + term(n00 + n10, n00 + n01 + n10 + n11)
    l1 = term(n01, n00 + n01) + term(n00, n00 + n01) \
        + term(n11, n10 + n11) + term(n10, n10 + n11)
    return pd.DataFrame({
        "n00": [np.int64(n00)], "n01": [np.int64(n01)],
        "n10": [np.int64(n10)], "n11": [np.int64(n11)],
        "lr_independence": [-2.0 * (l0 - l1)]})


@register("risk_ratios", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v - lag(v) OVER (ORDER BY day) AS dv
          FROM d),
    w AS (SELECT CAST(dv AS HUGEINT) AS dv FROM x
          WHERE dv IS NOT NULL),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dv) AS HUGEINT) AS s,
                 CAST(sum(dv * dv) AS HUGEINT) AS s2,
                 CAST(sum(CASE WHEN dv < 0 THEN dv * dv
                          ELSE 0 END) AS HUGEINT) AS sd2,
                 CAST(sum(CASE WHEN dv > 0 THEN dv
                          ELSE 0 END) AS HUGEINT) AS gains,
                 CAST(sum(CASE WHEN dv < 0 THEN -dv
                          ELSE 0 END) AS HUGEINT) AS losses
          FROM w)
    SELECT CAST(n AS BIGINT) AS n_changes,
           (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             AS sharpe,
           (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt(CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE))
             AS sortino,
           CAST(gains AS DOUBLE) / CAST(losses AS DOUBLE)
             AS omega
    FROM m""")
def risk_ratios(sf_dir: str):
    """SHARPE / SORTINO / OMEGA panel on daily revenue changes
    (zero benchmark): mean-over-volatility, mean-over-DOWNSIDE
    deviation, and the Omega ratio of total gains to total losses
    — the three canonical risk-adjusted performance lenses whose
    DISAGREEMENT is the finding (Sortino >> Sharpe means the
    volatility is mostly upside; Omega near 1 with positive
    Sharpe means many small wins funding rare large losses —
    var_cvar's tail numbers in ratio form). All moments, downside
    moments and gain/loss masses fold as exact big ints; each
    ratio is one shared float expression. Scale plan: bounded
    day-domain combine; O(1) driver arithmetic."""
    days, v = _daily_revenue(sf_dir)
    dv = [b - a for a, b in zip(v, v[1:])]
    n = len(dv)
    s = sum(dv)
    s2 = sum(x * x for x in dv)
    sd2 = sum(x * x for x in dv if x < 0)
    gains = sum(x for x in dv if x > 0)
    losses = sum(-x for x in dv if x < 0)
    mean = np.float64(s) / np.float64(n)
    sharpe = mean / np.sqrt(np.float64(s2) / np.float64(n)
                            - mean * mean)
    sortino = mean / np.sqrt(np.float64(sd2) / np.float64(n))
    return pd.DataFrame({
        "n_changes": [np.int64(n)],
        "sharpe": [np.float64(sharpe)],
        "sortino": [np.float64(sortino)],
        "omega": [np.float64(gains) / np.float64(losses)]})
