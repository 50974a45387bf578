# round-5 session-5 additions, batch 25: the Chow structural-break
# test on the daily revenue trend, the PRESS leave-one-out
# statistic in closed form, and a lag-0 Dickey-Fuller unit-root
# test on the trend residuals.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)


def _daily(ds, np, pd):
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g
    return ds.map_batches(partial, batch_format="pandas")


def _ssr_unit(v: list, t0: int) -> int:
    """Exact-int OLS residual sum of squares for y over t = t0.. ,
    quantized to whole units half-up: ((n*Syy - Sy^2)*D - B^2)
    / (n*D) with B, D the centered cross/self moments."""
    n = len(v)
    t = list(range(t0, t0 + n))
    sy = sum(v)
    syy = sum(x * x for x in v)
    sx = sum(t)
    sxx = sum(x * x for x in t)
    sxy = sum(a * b for a, b in zip(t, v))
    dd = n * sxx - sx * sx
    bb = n * sxy - sx * sy
    num = (n * syy - sy * sy) * dd - bb * bb
    den = n * dd
    return int(np.floor(np.float64(num) / np.float64(den) + 0.5))


_SSR_SQL = """(SELECT CAST(floor(CAST(
      (n * syy - sy * sy) * (n * sxx - sx * sx)
      - (n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
      / CAST(n * (n * sxx - sx * sx) AS DOUBLE) + 0.5) AS HUGEINT)
    FROM (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS sy,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS syy,
                 CAST(sum(t) AS HUGEINT) AS sx,
                 CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(t AS HUGEINT) * v) AS HUGEINT)
                   AS sxy
          FROM x WHERE {w}))"""


@register("chow_test", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
    s AS (SELECT {sp} AS ssr_p, {s1} AS ssr_1, {s2} AS ssr_2)
    SELECT (SELECT n FROM nn) AS n_days,
           CAST((SELECT ssr_p FROM s) AS DOUBLE)
             AS ssr_pooled_unit,
           CAST((SELECT ssr_1 FROM s) AS DOUBLE)
             AS ssr_first_unit,
           CAST((SELECT ssr_2 FROM s) AS DOUBLE)
             AS ssr_second_unit,
           (CAST((SELECT ssr_p FROM s) - (SELECT ssr_1 FROM s)
                 - (SELECT ssr_2 FROM s) AS DOUBLE) / 2.0)
           / (CAST((SELECT ssr_1 FROM s) + (SELECT ssr_2 FROM s)
                   AS DOUBLE)
              / CAST((SELECT n FROM nn) - 4 AS DOUBLE)) AS chow_f
    """.format(
    sp=_SSR_SQL.format(w="TRUE"),
    s1=_SSR_SQL.format(w="t <= (SELECT n FROM nn) // 2"),
    s2=_SSR_SQL.format(w="t > (SELECT n FROM nn) // 2")))
def chow_test(sf_dir: str):
    """CHOW STRUCTURAL-BREAK TEST on the daily revenue linear
    trend, split at the series midpoint: F = ((SSR_pooled - SSR_1 -
    SSR_2)/k) / ((SSR_1+SSR_2)/(n-2k)) — did the trend REGIME
    change, the question volume_changepoint locates and this test
    formally judges. Every SSR is a closed-form rational of exact
    integer moments ((n*Syy - Sy^2)*D - B^2)/(n*D), quantized to
    whole units half-up — three exact integers — and F is one
    shared float expression. Scale plan: per-batch (day, cents)
    partials through the bounded day-domain combine; the three
    moment scans are O(days) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])
    d = _combine_partials(_daily(ds, np, pd), ["day"], ["v"],
                          exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    m = n // 2
    sp = _ssr_unit(v, 1)
    s1 = _ssr_unit(v[:m], 1)
    s2 = _ssr_unit(v[m:], m + 1)
    f = (np.float64(sp - s1 - s2) / 2.0) \
        / (np.float64(s1 + s2) / np.float64(n - 4))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "ssr_pooled_unit": [np.float64(sp)],
        "ssr_first_unit": [np.float64(s1)],
        "ssr_second_unit": [np.float64(s2)],
        "chow_f": [np.float64(f)]})


_TREND_SQL = """
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS sy,
                 CAST(sum(t) AS HUGEINT) AS sx,
                 CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(t AS HUGEINT) * v) AS HUGEINT)
                   AS sxy
          FROM x),
    cf AS (SELECT CAST(n AS DOUBLE) AS fn,
                  CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
                  (CAST(sy AS DOUBLE)
                   - CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                    AS a
           FROM m)"""


@register("press_statistic", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),""" + _TREND_SQL + """,
    p AS (SELECT CAST(sum(CAST(floor(
            ((CAST(v AS DOUBLE) - (SELECT a FROM cf)
              - (SELECT b FROM cf) * CAST(t AS DOUBLE))
             / (1.0 - (1.0 / (SELECT fn FROM cf)
                + (CAST(t AS DOUBLE)
                   - ((SELECT fn FROM cf) + 1.0) / 2.0)
                  * (CAST(t AS DOUBLE)
                     - ((SELECT fn FROM cf) + 1.0) / 2.0)
                  / (((SELECT fn FROM cf) * (SELECT fn FROM cf)
                      * (SELECT fn FROM cf)
                      - (SELECT fn FROM cf)) / 12.0))))
            * ((CAST(v AS DOUBLE) - (SELECT a FROM cf)
                - (SELECT b FROM cf) * CAST(t AS DOUBLE))
               / (1.0 - (1.0 / (SELECT fn FROM cf)
                  + (CAST(t AS DOUBLE)
                     - ((SELECT fn FROM cf) + 1.0) / 2.0)
                    * (CAST(t AS DOUBLE)
                       - ((SELECT fn FROM cf) + 1.0) / 2.0)
                    / (((SELECT fn FROM cf) * (SELECT fn FROM cf)
                        * (SELECT fn FROM cf)
                        - (SELECT fn FROM cf)) / 12.0))))
            + 0.5) AS BIGINT)) AS HUGEINT) AS press_unit
          FROM x)
    SELECT CAST((SELECT fn FROM cf) AS BIGINT) AS n_days,
           (SELECT b FROM cf) AS trend_slope,
           CAST((SELECT press_unit FROM p) AS DOUBLE)
             AS press_unit,
           CAST((SELECT press_unit FROM p) AS DOUBLE)
             / (SELECT fn FROM cf) AS press_per_day""")
def press_statistic(sf_dir: str):
    """PRESS STATISTIC (closed-form leave-one-out CV) for the daily
    revenue trend fit: sum of (e_i / (1 - h_ii))^2 with the exact
    leverage h_ii = 1/n + (t - tbar)^2 / ((n^3-n)/12) of the
    equispaced design — honest out-of-sample error with NO refits,
    the model-validation operator that says whether the trend line
    generalizes or merely interpolates (conformal_interval bounds
    future days; PRESS scores the model class). Residuals and
    leverages are identical doubles built from exact integer
    moments; each deleted-residual square quantizes to whole units
    half-up before the exact fold. Scale plan: one moment pass plus
    one quantized-fold pass over the bounded day domain — driver
    O(days)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])
    d = _combine_partials(_daily(ds, np, pd), ["day"], ["v"],
                          exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    t = list(range(1, n + 1))
    sy = sum(v)
    sx = sum(t)
    sxx = sum(x * x for x in t)
    sxy = sum(a * b for a, b in zip(t, v))
    fn_ = np.float64(n)
    b = np.float64(n * sxy - sx * sy) \
        / np.float64(n * sxx - sx * sx)
    a = (np.float64(sy) - b * np.float64(sx)) / fn_
    tb = (fn_ + 1.0) / 2.0
    sxc = (fn_ * fn_ * fn_ - fn_) / 12.0
    press = 0
    for ti, vi in zip(t, v):
        ft = np.float64(ti)
        e = np.float64(vi) - a - b * ft
        h = 1.0 / fn_ + (ft - tb) * (ft - tb) / sxc
        de = e / (1.0 - h)
        press += int(np.floor(de * de + 0.5))
    return pd.DataFrame({
        "n_days": [np.int64(n)], "trend_slope": [np.float64(b)],
        "press_unit": [np.float64(press)],
        "press_per_day": [np.float64(press) / fn_]})


@register("adf_lite", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),""" + _TREND_SQL + """,
    e AS (SELECT t, CAST(v AS DOUBLE) - (SELECT a FROM cf)
                    - (SELECT b FROM cf) * CAST(t AS DOUBLE)
                      AS ev
          FROM x),
    pr AS (SELECT a.ev AS ep, b.ev - a.ev AS de
           FROM e a JOIN e b ON b.t = a.t + 1),
    s1 AS (SELECT CAST(sum(CAST(floor(ep * de + 0.5) AS BIGINT))
                       AS HUGEINT) AS num_unit,
                  CAST(sum(CAST(floor(ep * ep + 0.5) AS BIGINT))
                       AS HUGEINT) AS den_unit,
                  CAST(count(*) AS BIGINT) AS np_
           FROM pr),
    rho AS (SELECT CAST((SELECT num_unit FROM s1) AS DOUBLE)
                   / CAST((SELECT den_unit FROM s1) AS DOUBLE)
                     AS r),
    s2 AS (SELECT CAST(sum(CAST(floor(
                 (de - (SELECT r FROM rho) * ep)
                 * (de - (SELECT r FROM rho) * ep) + 0.5)
                 AS BIGINT)) AS HUGEINT) AS sse_unit
           FROM pr)
    SELECT (SELECT np_ FROM s1) AS n_pairs,
           (SELECT r FROM rho) AS rho,
           (SELECT r FROM rho)
           / sqrt((CAST((SELECT sse_unit FROM s2) AS DOUBLE)
                   / CAST((SELECT np_ FROM s1) - 1 AS DOUBLE))
                  / CAST((SELECT den_unit FROM s1) AS DOUBLE))
             AS adf_t""")
def adf_lite(sf_dir: str):
    """DICKEY-FULLER (lag-0) UNIT-ROOT test on the detrended daily
    revenue: regress the residual's first difference on its lag —
    rho near 0 (t << -1.94) means shocks die out (stationary
    residuals, trust the trend fit); rho near 1 means the series
    wanders and every OLS above it is spurious. The stationarity
    gate for the whole forecasting family (holt/ses/theil_u2/
    chow). Residuals are identical doubles from exact integer trend
    moments; each cross/self/SSE product quantizes to whole units
    half-up before its exact fold, and rho and its t are shared
    float expressions. Scale plan: one moment pass plus two
    quantized folds over the bounded day domain — driver
    O(days)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])
    d = _combine_partials(_daily(ds, np, pd), ["day"], ["v"],
                          exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    t = list(range(1, n + 1))
    sy = sum(v)
    sx = sum(t)
    sxx = sum(x * x for x in t)
    sxy = sum(a_ * b_ for a_, b_ in zip(t, v))
    fn_ = np.float64(n)
    b = np.float64(n * sxy - sx * sy) \
        / np.float64(n * sxx - sx * sx)
    a = (np.float64(sy) - b * np.float64(sx)) / fn_
    ev = [np.float64(vi) - a - b * np.float64(ti)
          for ti, vi in zip(t, v)]
    num = den = 0
    for i in range(n - 1):
        ep = ev[i]
        de = ev[i + 1] - ev[i]
        num += int(np.floor(ep * de + 0.5))
        den += int(np.floor(ep * ep + 0.5))
    rho = np.float64(num) / np.float64(den)
    sse = 0
    for i in range(n - 1):
        ep = ev[i]
        de = ev[i + 1] - ev[i]
        r_ = de - rho * ep
        sse += int(np.floor(r_ * r_ + 0.5))
    tstat = rho / np.sqrt(
        (np.float64(sse) / np.float64(n - 2))
        / np.float64(den))
    return pd.DataFrame({
        "n_pairs": [np.int64(n - 1)], "rho": [np.float64(rho)],
        "adf_t": [np.float64(tstat)]})
