# round-5 session-5 additions, batch 75: the Hurst exponent by
# rescaled-range regression, the Goh-Barabasi burstiness index of
# inter-event gaps, and the chi-square uniformity audit of the
# JSON props.k field.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply
from ...stages.window import segment_codes

_HURST_WS = (16, 32, 64, 128)


@register("hurst_rs", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day) - 1
                         AS BIGINT) AS t
          FROM d),
    ws AS (SELECT CAST(w AS BIGINT) AS w
           FROM (VALUES (16), (32), (64), (128)) v(w)),
    a AS (SELECT ws.w, x.t // ws.w AS blk, x.t, x.v
          FROM ws JOIN x ON TRUE),
    g AS (SELECT w, blk, CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(v) AS HUGEINT) AS sw,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS s2
          FROM a GROUP BY 1, 2),
    p AS (SELECT a.w, a.blk,
                 CAST(CAST(a.w AS HUGEINT)
                      * sum(a.v) OVER (PARTITION BY a.w, a.blk
                                       ORDER BY a.t)
                      - CAST(row_number() OVER (
                            PARTITION BY a.w, a.blk
                            ORDER BY a.t) AS HUGEINT) * g.sw
                      AS HUGEINT) AS pre
          FROM a JOIN g ON g.w = a.w AND g.blk = a.blk
          WHERE g.m = a.w),
    rb AS (SELECT p.w, p.blk,
                  greatest(max(pre), CAST(0 AS HUGEINT))
                  - least(min(pre), CAST(0 AS HUGEINT)) AS r2,
                  CAST(max(g.m) AS HUGEINT) * max(g.s2)
                  - max(g.sw) * max(g.sw) AS vn
           FROM p JOIN g ON g.w = p.w AND g.blk = p.blk
           GROUP BY 1, 2),
    li AS (SELECT w,
                  CAST(floor(ln(CAST(r2 AS DOUBLE)
                                / sqrt(CAST(vn AS DOUBLE)))
                             * 1000000.0 + 0.5) AS BIGINT) AS l
           FROM rb WHERE r2 > 0 AND vn > 0),
    yw AS (SELECT w,
                  CAST(sum(l) AS HUGEINT)
                  // CAST(count(*) AS HUGEINT) AS y,
                  CAST(floor(ln(CAST(w AS DOUBLE)) * 1000000.0
                             + 0.5) AS BIGINT) AS lw
           FROM li GROUP BY w),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                 CAST(sum(lw) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(CAST(lw AS HUGEINT) * y) AS HUGEINT)
                   AS sxy,
                 CAST(sum(CAST(lw AS HUGEINT) * lw) AS HUGEINT)
                   AS sxx
          FROM yw)
    SELECT CAST((SELECT k FROM m) AS BIGINT) AS n_scales,
           (CAST((SELECT k FROM m) AS DOUBLE)
            * CAST((SELECT sxy FROM m) AS DOUBLE)
            - CAST((SELECT sx FROM m) AS DOUBLE)
              * CAST((SELECT sy FROM m) AS DOUBLE))
           / (CAST((SELECT k FROM m) AS DOUBLE)
              * CAST((SELECT sxx FROM m) AS DOUBLE)
              - CAST((SELECT sx FROM m) AS DOUBLE)
                * CAST((SELECT sx FROM m) AS DOUBLE))
             AS hurst_exponent""")
def hurst_rs(sf_dir: str):
    """HURST EXPONENT of daily revenue by rescaled-range (R/S)
    analysis: split the day series into non-overlapping windows of
    16/32/64/128 days, compute each window's range of cumulative
    mean deviations over its standard deviation, and regress mean
    ln(R/S) on ln(window) — H > 0.5 long-range persistence, < 0.5
    anti-persistence; the fractal complement to variance_ratio
    (one lag pair) and kpss_stat (level test). Scaling deviations
    by the window length w makes prefix ranges (R2) and the
    variance numerator (VN = w*S2 - Sw^2) EXACT integers whose w's
    cancel in R/S = R2/sqrt(VN); each block contributes one
    micro-quantized shared-float ln, block means use exact integer
    floor division, and the 4-point OLS is exact big-int
    arithmetic. Scale plan: bounded day-domain combine; the window
    algebra is O(days) driver work per scale."""
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
    k = sx = sy = sxy = sxx = 0
    for w in _HURST_WS:
        lis = []
        for b0 in range(0, len(v) - w + 1, w):
            blk = v[b0:b0 + w]
            sw = sum(blk)
            s2 = sum(x * x for x in blk)
            vn = w * s2 - sw * sw
            mx = mn = 0
            cum = 0
            for i, x in enumerate(blk, start=1):
                cum += x
                pre = w * cum - i * sw
                mx = max(mx, pre)
                mn = min(mn, pre)
            r2 = max(mx, 0) - min(mn, 0)
            if r2 > 0 and vn > 0:
                lis.append(int(np.floor(
                    np.log(np.float64(r2)
                           / np.sqrt(np.float64(vn)))
                    * 1000000.0 + 0.5)))
        if not lis:
            continue
        tot = sum(lis)
        # DuckDB // truncates toward zero; mirror that exactly
        y = (tot // len(lis)) if tot >= 0 \
            else -((-tot) // len(lis))
        lw = int(np.floor(np.log(np.float64(w)) * 1000000.0
                          + 0.5))
        k += 1
        sx += lw
        sy += y
        sxy += lw * y
        sxx += lw * lw
    h = (np.float64(k) * np.float64(sxy)
         - np.float64(sx) * np.float64(sy)) \
        / (np.float64(k) * np.float64(sxx)
           - np.float64(sx) * np.float64(sx))
    return pd.DataFrame({
        "n_scales": [np.int64(k)],
        "hurst_exponent": [np.float64(h)]})


@register("gap_burstiness", sql="""
    WITH s AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
               FROM events),
    g AS (SELECT CAST(floor(CAST(epoch_us(ts) - epoch_us(prev_ts)
                                 AS DOUBLE) / 60000000.0)
                      AS BIGINT) AS gap
          FROM s WHERE prev_ts IS NOT NULL AND ts > prev_ts),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(gap) AS HUGEINT) AS s,
                 CAST(sum(gap * gap) AS HUGEINT) AS s2
          FROM g)
    SELECT CAST(n AS BIGINT) AS n_gaps,
           (sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))))
            - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / (sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))))
              + CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             AS burstiness
    FROM m""")
def gap_burstiness(sf_dir: str):
    """GOH-BARABASI BURSTINESS INDEX of per-user inter-event gaps:
    B = (sigma - mu) / (sigma + mu), -1 for a metronome, 0 for a
    Poisson process, ->1 for extreme bursts — the one-number
    summary of the heavy-tailed timing that waiting_paradox prices
    and gamma_fit_lag parameterizes. Gap minutes fold as exact
    integer moments inside the user exchange; B is one shared
    float expression on the exact (population) moments. Scale
    plan: the event_transitions lag plan; 3-cell moment
    partials."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        if len(us) < 2:
            return pd.DataFrame({
                "j": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "s": pd.Series(dtype=object),
                "s2": pd.Series(dtype=object)})
        same = codes[1:] == codes[:-1]
        gap_us = (us[1:] - us[:-1])[same]
        gap_us = gap_us[gap_us > 0]
        gap = np.floor(gap_us.astype(np.float64)
                       / 60000000.0).astype(np.int64) \
            .astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(gap)], np.int64),
            "s": [int(gap.sum())],
            "s2": [int((gap * gap).sum())]})

    t = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts",
                                     "event_id"]),
        ["j"], ["n", "s", "s2"], exact_int=True)
    n = int(t["n"].iloc[0])
    s, s2 = int(t["s"].iloc[0]), int(t["s2"].iloc[0])
    mu = np.float64(s) / np.float64(n)
    sd = np.sqrt(np.float64(s2) / np.float64(n) - mu * mu)
    return pd.DataFrame({
        "n_gaps": [np.int64(n)],
        "burstiness": [(sd - mu) / (sd + mu)]})


@register("props_k_uniformity", sql="""
    WITH e AS (SELECT CAST(regexp_extract(props, '[0-9]+')
                           AS BIGINT) AS k
               FROM events),
    h AS (SELECT k, CAST(count(*) AS BIGINT) AS o
          FROM e GROUP BY k),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS cells FROM h),
    c AS (SELECT CAST(sum((100 * CAST(o AS HUGEINT)
                           - (SELECT n FROM t))
                          * (100 * CAST(o AS HUGEINT)
                             - (SELECT n FROM t))) AS HUGEINT)
                   AS num
          FROM h)
    SELECT (SELECT n FROM t) AS n_events,
           (SELECT cells FROM t) AS n_distinct_k,
           CAST((SELECT num FROM c) AS DOUBLE)
           / (100.0 * CAST((SELECT n FROM t) AS DOUBLE))
             AS chi2_uniform""")
def props_k_uniformity(sf_dir: str):
    """CHI-SQUARE UNIFORMITY AUDIT of the JSON props.k field
    (parsed from the raw JSON string with a vectorized digit
    extract — the engine's JSON-payload ingestion path): observed
    counts of each k in 0..99 against the uniform expectation
    n/100, chi2 = sum (O - n/100)^2 / (n/100) — the instrument
    check that a synthetic or hashed attribute is actually flat
    (a skewed k means every props-conditioned metric inherits the
    skew). Multiplying through by 100 makes the numerator the
    exact integer sum (100*O - n)^2, folded in big ints; chi2 is
    one shared float division (cells with zero observations add
    the constant n/100 each — reported via n_distinct_k so the
    dof is explicit). Scale plan: map-only parse into a bounded
    k-domain combine."""
    ds = _events(sf_dir, ["props"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b["props"].str.extract(r"(\d+)", expand=False) \
            .astype(np.int64)
        g = pd.DataFrame({"k": k,
                          "o": np.ones(len(b), np.int64)}) \
            .groupby("k", as_index=False).sum()
        g["o"] = g["o"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["k"], ["o"])
    o = [int(x) for x in h["o"]]
    n = sum(o)
    num = sum((100 * x - n) ** 2 for x in o)
    return pd.DataFrame({
        "n_events": [np.int64(n)],
        "n_distinct_k": [np.int64(len(o))],
        "chi2_uniform": [np.float64(num)
                         / (100.0 * np.float64(n))]})
