# round-5 session-5 additions, batch 77: the Page-Hinkley running-mean
# drift statistic, a Weibull fit of inter-event gaps by median-rank
# regression, and the h-index of purchaser activity.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply, partition_map
from ...stages.window import segment_codes


@register("page_hinkley", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT day, v,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                   AS t,
                 CAST(sum(v) OVER (ORDER BY day) AS HUGEINT)
                   AS s
          FROM d),
    q AS (SELECT day,
                 CAST(floor(CAST(CAST(t AS HUGEINT) * v - s
                                 AS DOUBLE)
                            / CAST(t AS DOUBLE) + 0.5) AS BIGINT)
                   AS qt
          FROM x),
    c AS (SELECT day,
                 CAST(sum(qt) OVER (ORDER BY day) AS HUGEINT)
                   AS cum
          FROM q),
    ph AS (SELECT day,
                  cum - least(CAST(0 AS HUGEINT),
                              min(cum) OVER (ORDER BY day))
                    AS stat
           FROM c),
    w AS (SELECT day, stat FROM ph
          ORDER BY stat DESC, day LIMIT 1)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           (SELECT day FROM w) AS ph_peak_day,
           CAST((SELECT stat FROM w) AS BIGINT) AS ph_stat_cents""")
def page_hinkley(sf_dir: str):
    """PAGE-HINKLEY DRIFT STATISTIC on daily revenue: each day's
    deviation from the RUNNING mean so far (not the global mean —
    the sequential-detection setting where the baseline itself is
    estimated online, unlike cusum_peak's oracle-mean variant),
    accumulated, with the running-minimum subtraction turning the
    recursive alarm into two window scans. Each deviation
    (t*x - S_t)/t is an exact integer ratio half-up-rounded to
    whole cents (identical both engines); everything after is
    exact integer arithmetic with an exact argmax (earliest-day
    tie-break). Scale plan: bounded day-domain combine; the scan
    is O(days) driver work."""
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
    days = [int(x) for x in d["day"]]
    v = [int(x) for x in d["v"]]
    s = 0
    cum = 0
    mn = 0
    best = None
    for t, (day, x) in enumerate(zip(days, v), start=1):
        s += x
        qt = int(np.floor(np.float64(t * x - s) / np.float64(t)
                          + 0.5))
        cum += qt
        mn = min(mn, cum)
        stat = cum - min(0, mn)
        if best is None or stat > best[1]:
            best = (day, stat)
    return pd.DataFrame({
        "n_days": [np.int64(len(v))],
        "ph_peak_day": [np.int64(best[0])],
        "ph_stat_cents": [np.int64(best[1])]})


@register("weibull_fit", sql="""
    WITH s AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
               FROM events),
    g AS (SELECT CAST(floor(CAST(epoch_us(ts) - epoch_us(prev_ts)
                                 AS DOUBLE) / 60000000.0)
                      AS BIGINT) AS gap
          FROM s WHERE prev_ts IS NOT NULL AND ts > prev_ts),
    h AS (SELECT gap, CAST(count(*) AS BIGINT) AS c
          FROM g WHERE gap >= 1 GROUP BY gap),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
    r AS (SELECT gap, c,
                 CAST(2 * (COALESCE(sum(c) OVER (ORDER BY gap
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0)) + c + 1
                      AS BIGINT) AS i2
          FROM h),
    v AS (SELECT c,
                 CAST(floor(ln(CAST(gap AS DOUBLE)) * 1000000.0
                            + 0.5) AS BIGINT) AS qx,
                 CAST(floor(ln(-ln(1.0
                     - CAST(10 * i2 - 6 AS DOUBLE)
                       / CAST(20 * (SELECT n FROM t) + 8
                              AS DOUBLE))) * 1000000.0 + 0.5)
                      AS BIGINT) AS qy
          FROM r),
    m AS (SELECT CAST(sum(c) AS HUGEINT) AS sw,
                 CAST(sum(CAST(c AS HUGEINT) * qx) AS HUGEINT)
                   AS sx,
                 CAST(sum(CAST(c AS HUGEINT) * qy) AS HUGEINT)
                   AS sy,
                 CAST(sum(CAST(c AS HUGEINT) * qx * qy)
                      AS HUGEINT) AS sxy,
                 CAST(sum(CAST(c AS HUGEINT) * qx * qx)
                      AS HUGEINT) AS sxx
          FROM v)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_gaps,
           (CAST((SELECT sw FROM m) AS DOUBLE)
            * CAST((SELECT sxy FROM m) AS DOUBLE)
            - CAST((SELECT sx FROM m) AS DOUBLE)
              * CAST((SELECT sy FROM m) AS DOUBLE))
           / (CAST((SELECT sw FROM m) AS DOUBLE)
              * CAST((SELECT sxx FROM m) AS DOUBLE)
              - CAST((SELECT sx FROM m) AS DOUBLE)
                * CAST((SELECT sx FROM m) AS DOUBLE))
             AS weibull_shape,
           exp(-((CAST((SELECT sy FROM m) AS DOUBLE)
                  / CAST((SELECT sw FROM m) AS DOUBLE)
                  - ((CAST((SELECT sw FROM m) AS DOUBLE)
                      * CAST((SELECT sxy FROM m) AS DOUBLE)
                      - CAST((SELECT sx FROM m) AS DOUBLE)
                        * CAST((SELECT sy FROM m) AS DOUBLE))
                     / (CAST((SELECT sw FROM m) AS DOUBLE)
                        * CAST((SELECT sxx FROM m) AS DOUBLE)
                        - CAST((SELECT sx FROM m) AS DOUBLE)
                          * CAST((SELECT sx FROM m) AS DOUBLE)))
                    * (CAST((SELECT sx FROM m) AS DOUBLE)
                       / CAST((SELECT sw FROM m) AS DOUBLE)))
                 / ((CAST((SELECT sw FROM m) AS DOUBLE)
                     * CAST((SELECT sxy FROM m) AS DOUBLE)
                     - CAST((SELECT sx FROM m) AS DOUBLE)
                       * CAST((SELECT sy FROM m) AS DOUBLE))
                    / (CAST((SELECT sw FROM m) AS DOUBLE)
                       * CAST((SELECT sxx FROM m) AS DOUBLE)
                       - CAST((SELECT sx FROM m) AS DOUBLE)
                         * CAST((SELECT sx FROM m) AS DOUBLE))))
               / 1000000.0) AS weibull_scale_min""")
def weibull_fit(sf_dir: str):
    """WEIBULL FIT of per-user inter-event gaps by median-rank
    (Benard plotting position) regression: ln(-ln(1-F)) on
    ln(gap), with F = (i - 0.3)/(n + 0.4) at the tied block's
    median rank — the reliability-engineering standard whose shape
    k < 1 diagnoses the 'the longer idle, the less likely to
    return' wear-in that gamma_fit_lag's moment fit smooths over.
    The doubled median rank 2*N_prev + c + 1 and the plotting
    fraction (10*i2 - 6)/(20n + 8) are EXACT integers; each
    distinct gap contributes micro-quantized shared-float (x, y)
    once, weighted by its exact count, and the weighted OLS is
    exact big-int arithmetic. The scale is reported in
    minutes via exp(-(intercept/1e6)/shape), the micro-ln
    intercept rescaled before exponentiation, identically on both
    engines. Scale plan: the lag-plan user exchange into a bounded
    gap histogram; the regression is O(distinct gaps) driver
    work."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        if len(us) < 2:
            return pd.DataFrame({
                "gap": pd.Series(dtype=np.int64),
                "c": pd.Series(dtype=np.int64)})
        same = codes[1:] == codes[:-1]
        gap_us = (us[1:] - us[:-1])[same]
        gap_us = gap_us[gap_us > 0]
        gap = np.floor(gap_us.astype(np.float64)
                       / 60000000.0).astype(np.int64)
        gap = gap[gap >= 1]
        out = pd.DataFrame({"gap": gap,
                            "c": np.ones(len(gap), np.int64)}) \
            .groupby("gap", as_index=False).sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    h = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts",
                                     "event_id"]),
        ["gap"], ["c"]).sort_values("gap")
    gaps = [int(x) for x in h["gap"]]
    cs = [int(x) for x in h["c"]]
    n = sum(cs)
    sw = sx = sy = sxy = sxx = 0
    prev = 0
    for gap, c in zip(gaps, cs):
        i2 = 2 * prev + c + 1
        prev += c
        qx = int(np.floor(np.log(np.float64(gap)) * 1000000.0
                          + 0.5))
        f = np.float64(10 * i2 - 6) / np.float64(20 * n + 8)
        qy = int(np.floor(np.log(-np.log(1.0 - f)) * 1000000.0
                          + 0.5))
        sw += c
        sx += c * qx
        sy += c * qy
        sxy += c * qx * qy
        sxx += c * qx * qx
    slope = (np.float64(sw) * np.float64(sxy)
             - np.float64(sx) * np.float64(sy)) \
        / (np.float64(sw) * np.float64(sxx)
           - np.float64(sx) * np.float64(sx))
    icept = np.float64(sy) / np.float64(sw) \
        - slope * (np.float64(sx) / np.float64(sw))
    return pd.DataFrame({
        "n_gaps": [np.int64(n)],
        "weibull_shape": [np.float64(slope)],
        "weibull_scale_min": [np.exp(-(icept / slope
                                       / 1000000.0))]})


@register("h_index_users", sql="""
    WITH u AS (SELECT user_id,
                      CAST(count(*) FILTER (
                          event_type = 'purchase') AS BIGINT)
                        AS pc
               FROM events GROUP BY 1),
    r AS (SELECT pc,
                 CAST(row_number() OVER (ORDER BY pc DESC,
                                         user_id) AS BIGINT)
                   AS i
          FROM u)
    SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_users,
           CAST(COALESCE(max(CASE WHEN pc >= i THEN i END), 0)
                AS BIGINT) AS h_index
    FROM r""")
def h_index_users(sf_dir: str):
    """H-INDEX OF PURCHASER ACTIVITY: the largest h such that h
    users each made at least h purchases — the bibliometric
    transplant that summarizes the purchase distribution's head
    with one robust integer (immune to both the one mega-buyer
    that skews totals and the long tail that dilutes means;
    user_concentration counts coverage, h measures DEPTH of the
    head). Pure integer ranking and comparison, no floats at all.
    Scale plan: per-user counts through one user exchange; the
    ranked scan is the two-phase rank exchange at fleet scale
    (here the guarded driver sort)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "pc": (b["event_type"].to_numpy(object)
                   == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    u = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], ["pc"])
    pc = np.sort(u["pc"].to_numpy(np.int64))[::-1]
    i = np.arange(1, len(pc) + 1, dtype=np.int64)
    ok = pc >= i
    h = int(i[ok].max()) if ok.any() else 0
    return pd.DataFrame({
        "n_users": [np.int64(len(pc))],
        "h_index": [np.int64(h)]})
