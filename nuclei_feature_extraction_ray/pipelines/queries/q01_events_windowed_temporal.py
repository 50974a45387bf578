# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (EVENTS_P, SESSION_GAP_SEC, _COMBINE_MAX_ROWS, _EVW, _combine_partials, _events, _path, _r6, add_backfill, add_ewma_rows, add_lag_lead, add_rolling_quantiles, add_rolling_rows, add_session_ids, asof_join, concurrency_sweep, datetime, np, pa, partition_map, partitioned_apply, pc, pd, range_join, rd, register, session_aggregate)

@register("lag_lead", sql="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER ({w}) AS prev_value,
           lead(value) OVER ({w}) AS next_value,
           value - lag(value) OVER ({w}) AS delta_value,
           epoch(ts - lag(ts) OVER ({w})) AS gap_sec
    FROM events""".format(w=_EVW))
def lag_lead(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_lag_lead(g, "user_id", ["value"], ts_col="ts")
        return g[["event_id", "user_id", "ts", "value", "prev_value",
                  "next_value", "delta_value", "gap_sec"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("rolling_stats", sql="""
    SELECT event_id, user_id, ts,
           min(value) OVER w5 AS roll5_min,
           max(value) OVER w5 AS roll5_max,
           round(avg(value) OVER w5, 6) AS roll5_mean,
           CAST(count(value) OVER w5 AS BIGINT) AS roll5_count
    FROM events
    WINDOW w5 AS ({w} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """.format(w=_EVW))
def rolling_stats(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_rolling_rows(g, "user_id", "value", 5, prefix="roll5_")
        g["roll5_mean"] = g["roll5_mean"].round(6)
        return g[["event_id", "user_id", "ts", "roll5_min", "roll5_max",
                  "roll5_mean", "roll5_count"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("rolling_median", sql="""
    SELECT event_id, user_id, ts,
           round(quantile_cont(value, 0.5)  OVER w5, 6) AS roll5_median,
           round(quantile_cont(value, 0.25) OVER w5, 6) AS roll5_q25,
           round(quantile_cont(value, 0.75) OVER w5, 6) AS roll5_q75
    FROM events
    WINDOW w5 AS ({w} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """.format(w=_EVW))
def rolling_median(sf_dir: str):
    """Trailing-window ORDER-STATISTIC features (rolling median /
    IQR bounds) — robust-aggregate siblings of rolling_stats that
    prefix sums cannot express (stages/window.add_rolling_quantiles:
    one sorted shifted-copy matrix per partition, DuckDB's
    quantile_cont interpolation formula bit-for-bit). Scale shape is
    identical to rolling_stats: one user_id-hash exchange, per-
    partition sort, O(n·window) vectorized kernel."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_rolling_quantiles(g, "user_id", "value", 5,
                                  {"roll5_median": 0.5,
                                   "roll5_q25": 0.25,
                                   "roll5_q75": 0.75})
        g = _r6(g, ["roll5_median", "roll5_q25", "roll5_q75"])
        return g[["event_id", "user_id", "ts", "roll5_median",
                  "roll5_q25", "roll5_q75"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("rolling_distinct", sql="""
    SELECT event_id, user_id, ts,
           CAST(len(list_distinct(list(event_type) OVER w8))
                AS BIGINT) AS roll8_types
    FROM events
    WINDOW w8 AS ({w} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    """.format(w=_EVW))
def rolling_distinct(sf_dir: str):
    """Trailing-window DISTINCT count (behavioural-diversity feature:
    how many distinct event types in the user's last 8 events) —
    SQL window aggregates cannot take DISTINCT, and neither prefix
    sums nor monotonic deques express it; the bounded window makes it
    a factorize + sorted shifted-copy matrix + adjacent-inequality
    scan (stages/window.add_rolling_distinct), vectorized end to end.
    Same single user_id exchange as every windowed op."""
    from ...stages.window import add_rolling_distinct
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_rolling_distinct(g, "user_id", "event_type", 8,
                                 "roll8_types")
        return g[["event_id", "user_id", "ts", "roll8_types"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("top_event_type", sql="""
    SELECT user_id, event_type AS top_type, CAST(c AS BIGINT) AS n
    FROM (SELECT user_id, event_type, count(*) AS c,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC,
                                             event_type) AS rn
          FROM events GROUP BY user_id, event_type)
    WHERE rn = 1""")
def top_event_type(sf_dir: str):
    """Grouped MODE with a deterministic tie-break: each user's most
    frequent event type (ties -> lexicographically first) — the
    categorical argmax aggregate no plain sum/min/max expresses.

    Scale plan: per-batch (user, type, count) partials collapse the
    stream to at most users x types rows BEFORE the one user_id
    exchange; the per-partition winner is a vectorized sort +
    first-per-group — no driver work beyond streaming the result."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_id", "event_type"], as_index=False) \
            .size().rename(columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        return g

    def winner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "event_type"], as_index=False) \
            .agg(c=("c", "sum"))
        g = g.sort_values(["user_id", "c", "event_type"],
                          ascending=[True, False, True],
                          kind="mergesort")
        g = g.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "top_type": g["event_type"].to_numpy(object),
            "n": g["c"].to_numpy(np.int64)})

    return partitioned_apply(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id", winner, EVENTS_P)


@register("price_histogram", sql="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY bin""")
def price_histogram(sf_dir: str):
    """Equi-width histogram (bin = floor(price / 50k)) with per-bin
    count and exact cents mass — the distribution census a pipeline
    runs before choosing quantile/band thresholds.

    Scale plan: per-batch bin partials (at most n_bins rows per
    block), a bounded driver combine, ZERO shuffle. The bin id is one
    IEEE divide + floor, identical in both engines; the mass is
    integer cents."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = b["o_totalprice"].to_numpy(np.float64)
        g = pd.DataFrame({
            "bin": np.floor(p / 50000).astype(np.int64),
            "n": np.ones(len(p), np.int64),
            "cents": np.round(p * 100).astype(np.int64)})
        return g.groupby("bin", as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas") \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("price_histogram: too many bins for the "
                         "driver combine")
    out = parts.groupby("bin", as_index=False).agg(
        n=("n", "sum"), cents=("cents", "sum"))
    for c in ("bin", "n", "cents"):
        out[c] = out[c].astype(np.int64)
    return out


@register("event_transitions", sql="""
    WITH s AS (SELECT event_type,
                      lag(event_type) OVER ({w}) AS prev_type
               FROM events)
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type""".format(w=_EVW))
def event_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's ordered
    event stream (prev type -> next type) — the sequence-mining census
    behind next-action models and funnel hypotheses.

    Scale plan: the lag is computed INSIDE the one user_id exchange's
    sorted partitions (a shifted compare, no window state across
    partitions); each partition pre-aggregates to the tiny types²
    matrix, so the driver combine is types² x partitions rows."""
    from ...stages.window import segment_codes
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        et = g["event_type"].to_numpy(object)
        n = len(et)
        if n < 2:
            return pd.DataFrame({"prev_type": pd.Series(dtype=object),
                                 "next_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        same = codes[1:] == codes[:-1]
        out = pd.DataFrame({"prev_type": et[:-1][same],
                            "next_type": et[1:][same]})
        out = out.groupby(["prev_type", "next_type"],
                          as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = partitioned_apply(ds, "user_id", fn, EVENTS_P,
                              sort_cols=["user_id", "ts", "event_id"]) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("event_transitions: transition matrix too "
                         "large for the driver combine")
    out = parts.groupby(["prev_type", "next_type"],
                        as_index=False).agg(n=("n", "sum"))
    out["n"] = out["n"].astype(np.int64)
    return out


@register("part_pareto", sql="""
    SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM part p1
    WHERE NOT EXISTS (
      SELECT 1 FROM part p2
      WHERE p2.p_retailprice <= p1.p_retailprice
        AND p2.p_size >= p1.p_size
        AND (p2.p_retailprice < p1.p_retailprice
             OR p2.p_size > p1.p_size))""")
def part_pareto(sf_dir: str):
    """Skyline (Pareto front) query: parts not dominated on
    (cheaper price, larger size) — the multi-criteria shortlist
    operator (Börzsönyi et al. 2001) outside plain SQL aggregates.

    Scale plan: every block computes its LOCAL front (sort by price,
    two running-max scans — any global-front point is front within
    its block, so local fronts are a sound candidate reduction); the
    candidate union is front-sized (guarded) and the same vectorized
    scan finishes on the driver. Zero shuffle."""
    ds = rd.read_parquet(_path(sf_dir, "part"),
                         columns=["p_partkey", "p_retailprice",
                                  "p_size"])

    def front(g: pd.DataFrame) -> pd.DataFrame:
        price = g["p_retailprice"].to_numpy(np.float64)
        size = g["p_size"].to_numpy(np.int64)
        n = len(price)
        if n == 0:
            return pd.DataFrame({
                "p_partkey": pd.Series(dtype=np.int64),
                "p_retailprice": pd.Series(dtype=np.float64),
                "p_size": pd.Series(dtype=np.int64)})
        order = np.lexsort((-size, price))
        pr, sz = price[order], size[order]
        # within an equal-price group only max-size points survive
        # (same price + larger size dominates); that max survives
        # overall iff it beats every strictly-cheaper size
        # (cheaper + size >= s dominates). Vectorized: group max via
        # first-in-group (sorted size desc inside price), prefix max
        # of PRIOR groups via cummax shifted one group back.
        grp_first = np.empty(n, bool)
        grp_first[0] = True
        grp_first[1:] = pr[1:] != pr[:-1]
        gid = np.cumsum(grp_first) - 1
        gmax = sz[np.flatnonzero(grp_first)]       # first = max
        prior = np.empty(len(gmax), np.int64)
        prior[0] = np.iinfo(np.int64).min
        if len(gmax) > 1:
            prior[1:] = np.maximum.accumulate(gmax[:-1])
        keep = (sz == gmax[gid]) & (gmax[gid] > prior[gid])
        out = g.iloc[order[keep]]
        return pd.DataFrame({
            "p_partkey": out["p_partkey"].to_numpy(np.int64),
            "p_retailprice":
                out["p_retailprice"].to_numpy(np.float64),
            "p_size": out["p_size"].to_numpy(np.int64)})

    cands = ds.map_batches(front, batch_format="pandas") \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(cands) > _COMBINE_MAX_ROWS:
        raise ValueError("part_pareto: candidate front too large for "
                         "the driver combine")
    return front(cands).reset_index(drop=True)


@register("user_value_trend", sql="""
    WITH s AS (SELECT user_id,
                      CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events),
    a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(d) AS BIGINT) AS sx,
                 CAST(sum(v) AS BIGINT) AS sy,
                 CAST(sum(d * v) AS BIGINT) AS sxy,
                 CAST(sum(d * d) AS BIGINT) AS sxx
          FROM s GROUP BY user_id)
    SELECT user_id, n,
           CASE WHEN n >= 2
                 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
           THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                      6)
           ELSE NULL END AS slope_cents_per_day
    FROM a""")
def user_value_trend(sf_dir: str):
    """Per-group OLS regression: each user's spend trend as the
    least-squares slope of value (cents) against time (days) — the
    closed-form model fit a feature pipeline computes per entity.
    Same integer-micro policy as rolling_corr: the five sums are
    exact int64 (day <= ~2e4, cents <= ~5e4 — products far inside
    int64), and ONE double expression in oracle order produces the
    slope; NULL when n < 2 or all events share a day.

    Scale plan: per-batch integer partials collapse each block to at
    most its distinct-user count BEFORE the one user_id exchange; the
    per-partition finish is a groupby-sum plus the closed form. No
    row-level data crosses the wire."""
    from ...functions.texture import r6
    DAY_US = 86_400_000_000
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = (b["ts"].to_numpy("datetime64[us]").astype(np.int64)
             // DAY_US)
        v = np.floor(b["value"].to_numpy(np.float64) * 100 + 0.5) \
            .astype(np.int64)
        g = pd.DataFrame({"user_id": b["user_id"].to_numpy(np.int64),
                          "n": np.ones(len(b), np.int64),
                          "sx": d, "sy": v, "sxy": d * v,
                          "sxx": d * d})
        return g.groupby("user_id", as_index=False).sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False).sum()
        n = a["n"].to_numpy(np.int64)
        sx = a["sx"].to_numpy(np.int64).astype(np.float64)
        sy = a["sy"].to_numpy(np.int64).astype(np.float64)
        sxy = a["sxy"].to_numpy(np.int64).astype(np.float64)
        sxx = a["sxx"].to_numpy(np.int64).astype(np.float64)
        nf = n.astype(np.float64)
        den = nf * sxx - sx * sx
        ok = (n >= 2) & (den > 0)
        slope = np.full(len(a), np.nan)
        slope[ok] = r6((nf[ok] * sxy[ok] - sx[ok] * sy[ok])
                       / den[ok])
        return pd.DataFrame({
            "user_id": a["user_id"].to_numpy(np.int64),
            "n": n, "slope_cents_per_day": slope})

    return partitioned_apply(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id", finish, EVENTS_P)


@register("value_outliers", sql="""
    WITH m AS (SELECT user_id, quantile_cont(value, 0.5) AS med
               FROM events GROUP BY user_id),
    d AS (SELECT e.user_id, e.event_id, e.ts, e.value, m.med,
                 abs(e.value - m.med) AS ad
          FROM events e JOIN m USING (user_id)),
    md AS (SELECT user_id, quantile_cont(ad, 0.5) AS mad
           FROM d GROUP BY user_id)
    SELECT d.user_id, d.event_id, d.ts, d.value,
           round(d.med, 6) AS med, round(md.mad, 6) AS mad
    FROM d JOIN md USING (user_id)
    WHERE d.ad > 3 * md.mad""")
def value_outliers(sf_dir: str):
    """Robust per-entity anomaly detection: events whose absolute
    deviation from the user's MEDIAN exceeds 3x the user's MAD — the
    median/MAD rule that, unlike z-scores, a single spike cannot
    poison. Both medians use DuckDB's quantile_cont interpolation
    ``lo*(1-frac) + hi*frac`` (the rolling_median-proven formula), so
    the strict > filter agrees bit-for-bit.

    Scale plan: ONE user_id exchange; both median passes are
    vectorized segment order statistics inside the partition (sort +
    per-segment position gather), no per-user Python."""
    from ...functions.texture import r6
    from ...stages.window import segment_codes, segment_starts
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def seg_median(keys: np.ndarray, vals: np.ndarray):
        """(sorted unique keys, their medians) — quantile_cont 0.5."""
        order = np.lexsort((vals, keys))
        ks, vs = keys[order], vals[order]
        codes = segment_codes(ks)
        starts_row = segment_starts(codes)
        starts = np.unique(starts_row)
        cnt = np.diff(np.append(starts, len(ks)))
        pos = 0.5 * (cnt - 1)
        lo = np.floor(pos).astype(np.int64)
        frac = pos - lo
        hi = np.minimum(lo + 1, cnt - 1)
        med = vs[starts + lo] * (1.0 - frac) + vs[starts + hi] * frac
        return ks[starts], med

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        v = g["value"].to_numpy(np.float64)
        uk, med = seg_median(u, v)
        med_row = med[np.searchsorted(uk, u)]
        ad = np.abs(v - med_row)
        uk2, mad = seg_median(u, ad)
        mad_row = mad[np.searchsorted(uk2, u)]
        keep = ad > 3.0 * mad_row
        return pd.DataFrame({
            "user_id": u[keep],
            "event_id": g["event_id"].to_numpy(np.int64)[keep],
            "ts": g["ts"].to_numpy("datetime64[us]")[keep],
            "value": v[keep],
            "med": r6(med_row[keep]), "mad": r6(mad_row[keep])})

    return partitioned_apply(ds, "user_id", fn, EVENTS_P)


@register("rolling_corr", sql="""
    WITH s AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
             lag(CAST(floor(value * 100 + 0.5) AS BIGINT))
               OVER ({w}) AS y
      FROM events),
    a AS (
      SELECT user_id, event_id, ts,
             CAST(count(y) OVER wv AS BIGINT) AS n,
             CAST(sum(CASE WHEN y IS NULL THEN 0 ELSE x END)
                  OVER wv AS BIGINT) AS sx,
             CAST(sum(coalesce(y, 0)) OVER wv AS BIGINT) AS sy,
             CAST(sum(CASE WHEN y IS NULL THEN 0 ELSE x * x END)
                  OVER wv AS BIGINT) AS sxx,
             CAST(sum(coalesce(y * y, 0)) OVER wv AS BIGINT) AS syy,
             CAST(sum(coalesce(x * y, 0)) OVER wv AS BIGINT) AS sxy
      FROM s
      WINDOW wv AS ({w} ROWS BETWEEN 15 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id, ts, n AS n_pairs,
           CASE WHEN n >= 2
                 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
           THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE)
                                * CAST(sx AS DOUBLE))
                         * sqrt(CAST(n AS DOUBLE)
                                * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE)
                                  * CAST(sy AS DOUBLE))), 6)
           ELSE NULL END AS corr_lag1
    FROM a""".format(w=_EVW))
def rolling_corr(sf_dir: str):
    """Trailing-window lag-1 autocorrelation of the value series per
    user (momentum/mean-reversion feature) — the first BIVARIATE
    windowed statistic in the registry. Bit-exactness comes from the
    integer-micro-unit policy: values quantized to cents, the five
    pair sums computed as exact int64 cumulative sums (fold-order-
    free), and one final double expression evaluated in the identical
    order as the oracle (stages/window.add_rolling_lag1_corr). Same
    single user_id exchange as every windowed op; O(n) per partition
    — no window matrix needed, prefix sums suffice."""
    from ...stages.window import add_rolling_lag1_corr
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_rolling_lag1_corr(g, "user_id", "value", 16,
                                  "corr_lag1", "n_pairs")
        return g[["user_id", "event_id", "ts", "n_pairs",
                  "corr_lag1"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


#: ewma: exact binary alpha so 1-alpha is exact and the numpy fold
#: is bit-identical to DuckDB's list_reduce fold.
EWMA_ALPHA = 0.25
EWMA_WINDOW = 20

@register("ewma", sql="""
    SELECT event_id, user_id, ts,
           round(list_reduce(list(value) OVER w20,
                 (acc, x) -> acc * {b} + x * {a}), 6) AS ewma20
    FROM events
    WINDOW w20 AS ({w} ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)
    """.format(w=_EVW, a=EWMA_ALPHA, b=1.0 - EWMA_ALPHA,
               k=EWMA_WINDOW - 1))
def ewma(sf_dir: str):
    """Exponentially-weighted moving average per entity over a BOUNDED
    trailing window (stages/window.add_ewma_rows): the sequential
    recurrence is folded as window-1 masked vectorized passes, bit-
    identical to the oracle's list_reduce fold. Bounding the window
    (20 rows ~ alpha 0.25 decays to 0.3% weight) is the scale choice:
    it caps state, makes the kernel O(n·window) vectorized, and keeps
    the op salt-splittable for hot entities exactly like the other
    trailing windows."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_ewma_rows(g, "user_id", "value", EWMA_WINDOW,
                          EWMA_ALPHA, "ewma20")
        # half-AWAY r6: the fold's dyadic rationals (2-decimal inputs
        # x powers of 0.75/0.25) land exactly on 5e-7 boundaries where
        # numpy's half-to-even diverges from DuckDB round().
        from ...functions.texture import r6
        g["ewma20"] = r6(g["ewma20"].to_numpy())
        return g[["event_id", "user_id", "ts", "ewma20"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("sessionize", sql="""
    SELECT event_id, user_id, ts,
           CAST(sum(CASE WHEN gap_sec IS NULL OR gap_sec > {gap}
                    THEN 1 ELSE 0 END)
                OVER ({w} ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
             AS session_id
    FROM (SELECT *, epoch(ts - lag(ts) OVER ({w})) AS gap_sec
          FROM events)""".format(gap=SESSION_GAP_SEC, w=_EVW))
def sessionize(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "user_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_session_ids(g, "user_id", "ts", SESSION_GAP_SEC)
        return g[["event_id", "user_id", "ts", "session_id"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("session_stats", sql="""
    WITH s AS (
      SELECT user_id, ts, value,
             sum(CASE WHEN gap_sec IS NULL OR gap_sec > {gap}
                 THEN 1 ELSE 0 END)
               OVER ({w} ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM (SELECT *, epoch(ts - lag(ts) OVER ({w})) AS gap_sec
            FROM events))
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS start_ts, max(ts) AS end_ts,
           epoch(max(ts) - min(ts)) AS duration_sec,
           round(sum(value), 6) AS sum_value
    FROM s GROUP BY user_id, session_id""".format(
        gap=SESSION_GAP_SEC, w=_EVW))
def session_stats(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = session_aggregate(g, "user_id", "ts", "value",
                                SESSION_GAP_SEC)
        out["sum_value"] = out["sum_value"].round(6)
        return out[["user_id", "session_id", "n_events", "start_ts",
                    "end_ts", "duration_sec", "sum_value"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts"])


@register("session_funnel", sql="""
    WITH s AS (
      SELECT user_id, event_id, ts, event_type,
             sum(CASE WHEN gap_sec IS NULL OR gap_sec > {gap}
                 THEN 1 ELSE 0 END)
               OVER ({w} ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM (SELECT *, epoch(ts - lag(ts) OVER ({w})) AS gap_sec
            FROM events)),
    f AS (SELECT user_id, session_id,
                 CAST(count(*) AS BIGINT) AS n_events,
                 min(ts) FILTER (WHERE event_type = 'view') AS view_ts
          FROM s GROUP BY user_id, session_id),
    c AS (SELECT s.user_id, s.session_id, min(s.ts) AS click_ts
          FROM s JOIN f USING (user_id, session_id)
          WHERE s.event_type = 'click' AND s.ts >= f.view_ts
          GROUP BY s.user_id, s.session_id),
    p AS (SELECT s.user_id, s.session_id, min(s.ts) AS purchase_ts
          FROM s JOIN c USING (user_id, session_id)
          WHERE s.event_type = 'purchase' AND s.ts >= c.click_ts
          GROUP BY s.user_id, s.session_id)
    SELECT f.user_id, CAST(f.session_id AS BIGINT) AS session_id,
           f.n_events, f.view_ts, c.click_ts, p.purchase_ts,
           CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                     WHEN c.click_ts IS NOT NULL THEN 2
                     WHEN f.view_ts IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
    FROM f LEFT JOIN c USING (user_id, session_id)
           LEFT JOIN p USING (user_id, session_id)""".format(
        gap=SESSION_GAP_SEC, w=_EVW))
def session_funnel(sf_dir: str):
    """Ordered funnel within sessions (view -> click -> purchase):
    per (user, session), the first view, the first click AT-OR-AFTER
    that view, the first purchase at-or-after that click, and the
    funnel stage reached — sequential pattern matching, the session
    analytics none of the plain aggregates express.

    Scale shape: identical to session_stats — the ONE user_id exchange
    co-locates each user's events, then the staged mins are three
    masked groupby-min passes over the sorted partition (broadcast of
    the previous stage's min back onto rows is a pandas merge inside
    the partition, never a cluster join)."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = add_session_ids(g, "user_id", "ts", SESSION_GAP_SEC)
        keys = ["user_id", "session_id"]
        base = g.groupby(keys, sort=False).agg(
            n_events=("ts", "size")).reset_index()
        base["n_events"] = base["n_events"].astype(np.int64)

        def staged_min(mask: pd.Series, name: str,
                       after: pd.DataFrame | None) -> pd.DataFrame:
            rows = g[mask]
            if after is not None:
                prev = after.columns[-1]
                rows = rows.merge(after, on=keys, how="inner")
                rows = rows[rows["ts"] >= rows[prev]]
            out = rows.groupby(keys, sort=False) \
                      .agg(**{name: ("ts", "min")}).reset_index()
            return out

        v = staged_min(g["event_type"] == "view", "view_ts", None)
        c = staged_min(g["event_type"] == "click", "click_ts", v)
        p = staged_min(g["event_type"] == "purchase", "purchase_ts", c)
        out = base.merge(v, on=keys, how="left") \
                  .merge(c, on=keys, how="left") \
                  .merge(p, on=keys, how="left")
        stage = np.zeros(len(out), np.int64)
        stage[out["view_ts"].notna()] = 1
        stage[out["click_ts"].notna()] = 2
        stage[out["purchase_ts"].notna()] = 3
        out["stage"] = stage
        return out[["user_id", "session_id", "n_events", "view_ts",
                    "click_ts", "purchase_ts", "stage"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


#: retention cohorts: Monday-aligned week truncation in integer day
#: arithmetic (1970-01-05, day index 4, was a Monday) — matches
#: DuckDB date_trunc('week', ts) exactly on naive timestamps.
_WEEK_US = 7 * 86_400_000_000


@register("retention_cohorts", sql="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w
      FROM events),
    fu AS (SELECT user_id, min(w) AS cw FROM act GROUP BY user_id)
    SELECT cw AS cohort_week,
           CAST((epoch(w) - epoch(cw)) / 604800 AS BIGINT)
             AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act JOIN fu USING (user_id)
    GROUP BY cohort_week, week_offset""")
def retention_cohorts(sf_dir: str):
    """Cohort retention: users grouped by first-activity week, counted
    in every later week they return — the engagement matrix behind
    retention curves.

    Scale shape: per-batch DISTINCT (user, week) partials collapse the
    event stream to at most users x weeks rows BEFORE the one user_id
    exchange; each partition derives cohort = min(week) per user
    locally and pre-aggregates (cohort, offset) counts, so the final
    combine is bounded by weeks^2 cells (guarded), not by users."""
    from ...stages.partition import partition_map

    DAY = 86_400_000_000
    ds = _events(sf_dir, ["user_id", "ts"])

    def act_partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["user_id"].to_numpy(np.int64)
        ts_us = batch["ts"].to_numpy("datetime64[us]").astype(np.int64)
        day = ts_us // DAY
        week = ((day - 4) // 7) * 7 + 4            # Monday-aligned
        out = pd.DataFrame({"user_id": us, "week_day": week})
        return out.drop_duplicates()

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "week_day"])
        cw = g.groupby("user_id", sort=False)["week_day"] \
              .transform("min")
        off = (g["week_day"].to_numpy(np.int64)
               - cw.to_numpy(np.int64)) // 7
        out = pd.DataFrame({"cohort_day": cw.to_numpy(np.int64),
                            "week_offset": off})
        agg = out.groupby(["cohort_day", "week_offset"],
                          as_index=False).size() \
                 .rename(columns={"size": "n_users"})
        agg["n_users"] = agg["n_users"].astype(np.int64)
        return agg

    parts = partition_map(
        ds.map_batches(act_partial, batch_format="pandas"),
        ["user_id"], per_user, EVENTS_P) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("retention_cohorts: cohort matrix too large "
                         "for the driver combine")
    out = parts.groupby(["cohort_day", "week_offset"],
                        as_index=False).agg(n_users=("n_users", "sum"))
    out["cohort_week"] = (out["cohort_day"].to_numpy(np.int64)
                          * DAY).astype("datetime64[us]")
    out["n_users"] = out["n_users"].astype(np.int64)
    out["week_offset"] = out["week_offset"].astype(np.int64)
    return out[["cohort_week", "week_offset", "n_users"]]


@register("session_concurrency", sql="""
    WITH s AS (
      SELECT user_id, ts,
             sum(CASE WHEN gap_sec IS NULL OR gap_sec > {gap}
                 THEN 1 ELSE 0 END)
               OVER ({w} ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM (SELECT *, epoch(ts - lag(ts) OVER ({w})) AS gap_sec
            FROM events)),
    b AS (SELECT user_id, session_id,
                 min(ts) AS start_ts, max(ts) AS end_ts
          FROM s GROUP BY user_id, session_id),
    d AS (SELECT *, unnest(generate_series(
              date_trunc('day', start_ts), date_trunc('day', end_ts),
              INTERVAL 1 DAY)) AS day
          FROM b),
    seg AS (SELECT day,
                   greatest(start_ts, day) AS s_ts,
                   least(end_ts, day + INTERVAL 1 DAY
                                     - INTERVAL 1 MICROSECOND) AS e_ts
            FROM d),
    ev AS (SELECT day, s_ts AS ts, 1 AS delta FROM seg
           UNION ALL
           SELECT day, e_ts AS ts, -1 AS delta FROM seg),
    c AS (SELECT day, delta,
                 sum(delta) OVER (PARTITION BY day
                     ORDER BY ts, delta DESC
                     ROWS UNBOUNDED PRECEDING) AS cur
          FROM ev)
    SELECT day, CAST(max(cur) AS BIGINT) AS max_concurrent,
           CAST(count(*) FILTER (WHERE delta = 1) AS BIGINT)
             AS n_sessions
    FROM c GROUP BY day""".format(gap=SESSION_GAP_SEC, w=_EVW))
def session_concurrency(sf_dir: str):
    """Peak session concurrency per calendar day: gap-sessionize per
    user, then a sweep line over session intervals (+1 at start, -1 at
    end, starts before ends on boundary ties — closed intervals).

    Scale shape: the global sweep is made embarrassingly parallel by
    CLIPPING each session to the days it covers (a session contributes
    one [max(start, day), min(end, day_end)] segment per day), so each
    day's sweep is independent — phase 1 is the same user_id exchange
    as session_stats emitting only (day, ts, ±1) boundary rows, phase
    2 one day-hash exchange + the vectorized segment-cumsum sweep
    (stages/window.concurrency_sweep). No global sort, no driver
    materialization; a 10^12-row corpus still exchanges only
    O(sessions · days_spanned) 24-byte rows."""
    from ...stages.partition import partition_map

    DAY = 86_400_000_000
    ds = _events(sf_dir, ["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = add_session_ids(g, "user_id", "ts", SESSION_GAP_SEC)
        b = g.groupby(["user_id", "session_id"], sort=False) \
             .agg(start=("ts", "min"), end=("ts", "max")).reset_index()
        s_us = b["start"].to_numpy("datetime64[us]").astype(np.int64)
        e_us = b["end"].to_numpy("datetime64[us]").astype(np.int64)
        s_day, e_day = s_us // DAY, e_us // DAY
        n_days = (e_day - s_day + 1).astype(np.int64)
        total = int(n_days.sum())
        rep = np.repeat(np.arange(len(b)), n_days)
        # day index within each session's span, fully vectorized
        off = np.arange(total) - np.repeat(
            np.cumsum(n_days) - n_days, n_days)
        day = (s_day[rep] + off) * DAY
        seg_s = np.maximum(s_us[rep], day)
        seg_e = np.minimum(e_us[rep], day + DAY - 1)
        return pd.DataFrame({
            "day_us": np.concatenate([day, day]),
            "ts_us": np.concatenate([seg_s, seg_e]),
            "delta": np.concatenate([
                np.ones(total, np.int64),
                np.full(total, -1, np.int64)]),
        })

    ev = partitioned_apply(ds, "user_id", sessions, EVENTS_P,
                           sort_cols=["user_id", "ts"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        out = concurrency_sweep(g, "day_us", "ts_us", "delta")
        out["day"] = out["day_us"].to_numpy(np.int64) \
                                  .astype("datetime64[us]")
        return out[["day", "max_concurrent", "n_sessions"]]

    return partition_map(ev, ["day_us"], sweep, 8)


@register("asof_quote", sql="""
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS view_ts, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts""")
def asof_quote(sf_dir: str):
    """Point-in-time join: each purchase sees the latest preceding view
    of the same user (J3, stages/asof.py)."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])
    probes = ev.filter(expr="event_type == 'purchase'") \
               .select_columns(["event_id", "user_id", "ts"])
    snaps = ev.filter(expr="event_type == 'view'") \
              .select_columns(["user_id", "ts", "value"])

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["user_id", "view_ts", "view_value"])

    snaps = snaps.map_batches(rn, batch_format="pyarrow")
    return asof_join(probes, snaps, key="user_id", probe_ts="ts",
                     snap_ts="view_ts", value_cols=["view_value"],
                     num_partitions=EVENTS_P)


@register("asof_quote_fwd", sql="""
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS view_ts, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts <= v.ts""")
def asof_quote_fwd(sf_dir: str):
    """FORWARD as-of join: each purchase sees the EARLIEST view of the
    same user at-or-after it — the next-snapshot lookup used to label
    outcomes in backtests (J3's direction mirror; same single-exchange
    sort-merge plan, pandas C merge with direction='forward')."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])
    probes = ev.filter(expr="event_type == 'purchase'") \
               .select_columns(["event_id", "user_id", "ts"])
    snaps = ev.filter(expr="event_type == 'view'") \
              .select_columns(["user_id", "ts", "value"])

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["user_id", "view_ts", "view_value"])

    snaps = snaps.map_batches(rn, batch_format="pyarrow")
    return asof_join(probes, snaps, key="user_id", probe_ts="ts",
                     snap_ts="view_ts", value_cols=["view_value"],
                     num_partitions=EVENTS_P, direction="forward")


@register("asof_quote_tol", sql="""
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN v.ts >= p.ts - INTERVAL 6 HOUR
                THEN v.ts END AS view_ts,
           CASE WHEN v.ts >= p.ts - INTERVAL 6 HOUR
                THEN v.value END AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts""")
def asof_quote_tol(sf_dir: str):
    """Tolerance-bounded point-in-time join: like asof_quote but a
    preceding view only counts within a 6-hour freshness window —
    staler matches null out (the standard staleness guard when serving
    features from snapshots). Exercises the ``tolerance`` parameter of
    stages/asof.asof_join end-to-end; same single co-partitioned
    exchange as asof_quote."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])
    probes = ev.filter(expr="event_type == 'purchase'") \
               .select_columns(["event_id", "user_id", "ts"])
    snaps = ev.filter(expr="event_type == 'view'") \
              .select_columns(["user_id", "ts", "value"])

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["user_id", "view_ts",
                                     "view_value"])

    snaps = snaps.map_batches(rn, batch_format="pyarrow")
    return asof_join(probes, snaps, key="user_id", probe_ts="ts",
                     snap_ts="view_ts", value_cols=["view_value"],
                     num_partitions=EVENTS_P,
                     tolerance=pd.Timedelta(hours=6))


@register("range_join_funnel", sql="""
    SELECT a.event_id AS view_id, a.user_id, a.ts AS view_ts,
           b.event_id AS purchase_id, b.ts AS purchase_ts,
           b.value AS purchase_value,
           epoch(b.ts - a.ts) AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'view') a
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 DAY""")
def range_join_funnel(sf_dir: str):
    """Interval join (stages/rangejoin.py): every purchase within one
    day AFTER each view by the same user — one row per (view,
    purchase) pair, the funnel/attribution shape.  One co-partitioning
    exchange; pair enumeration vectorized per partition."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])
    views = ev.filter(expr="event_type == 'view'") \
              .select_columns(["event_id", "user_id", "ts"])

    def rn_l(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["view_id", "user_id", "view_ts"])

    def rn_r(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["purchase_id", "user_id", "purchase_ts", "purchase_value"])

    purchases = ev.filter(expr="event_type == 'purchase'") \
                  .select_columns(["event_id", "user_id", "ts", "value"]) \
                  .map_batches(rn_r, batch_format="pyarrow")
    joined = range_join(views.map_batches(rn_l, batch_format="pyarrow"),
                        purchases, key="user_id",
                        left_ts="view_ts", right_ts="purchase_ts",
                        lo=pd.Timedelta(0), hi=pd.Timedelta(days=1),
                        num_partitions=EVENTS_P)

    def add_gap(batch: pa.Table) -> pa.Table:
        from ...stages.window import us_seconds
        us = pc.cast(pc.subtract(batch["purchase_ts"],
                                 batch["view_ts"]),
                     pa.int64()).to_numpy(zero_copy_only=False)
        return batch.append_column("gap_sec", pa.array(us_seconds(us)))

    return joined.map_batches(add_gap, batch_format="pyarrow")


@register("backfill", sql="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER ({w} ROWS UNBOUNDED PRECEDING) AS last_purchase_value
    FROM events""".format(w=_EVW))
def backfill(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g["pv"] = g["value"].where(g["event_type"] == "purchase")
        g = add_backfill(g, "user_id", "pv", "last_purchase_value")
        return g[["event_id", "user_id", "ts", "last_purchase_value"]]

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("time_slice", sql="""
    SELECT event_id, user_id, event_type, value,
           epoch(ts - TIMESTAMP '2024-01-10') AS ts_rebased_sec
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'""")
def time_slice(sf_dir: str):
    """Window filter + coordinate rebase — the filter-geojson analog
    (src/filter_geojson.rs:29-63): predicate, then shift the kept rows'
    coordinates by -offset."""
    t0 = datetime(2024, 1, 10)
    t1 = datetime(2024, 1, 20)
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["ts"], pa.scalar(t0)),
                    pc.less(batch["ts"], pa.scalar(t1)))
        b = batch.filter(m)
        from ...stages.window import us_seconds
        us = pc.cast(pc.subtract(b["ts"], pa.scalar(t0)),
                     pa.int64()).to_numpy(zero_copy_only=False)
        reb = pa.array(us_seconds(us))
        return b.drop_columns(["ts"]).append_column("ts_rebased_sec", reb)

    return ds.map_batches(fn, batch_format="pyarrow")


@register("props_extract", sql="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events""")
def props_extract(sf_dir: str):
    """Semi-structured sidecar parsing: pull the numeric field ``k``
    out of the JSON ``props`` column with ONE vectorized RE2 pass
    (``pc.extract_regex``) per batch — no per-row json.loads loop.
    Missing field -> null, matching json_extract. A pipeline needing
    arbitrary nested JSON would swap in ``pa.json`` block parsing in
    the same map_batches slot; for flat telemetry fields the regex
    path is the vectorized fast lane."""
    ds = _events(sf_dir, ["event_id", "event_type", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"],
                             r'"k"\s*:\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "k": k})

    return ds.map_batches(fn, batch_format="pyarrow")


@register("hourly_rate", sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value) / count(*), 6) AS avg_value,
           round(fmod(atan2(sum(sin(2 * pi() * (epoch_us(ts) % 86400000000)
                                    / 86400000000.0)),
                            sum(cos(2 * pi() * (epoch_us(ts) % 86400000000)
                                    / 86400000000.0)))
                      + 2 * pi(), 2 * pi()) / (2 * pi()) * 24, 6)
             AS circ_hour
    FROM events GROUP BY event_type""")
def hourly_rate(sf_dir: str):
    """Circular mean of event time-of-day per type — the reference's
    angle-aware hue mean recast (src/features/color.rs:144-155), with
    partial (sin, cos) sums combined associatively."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ang = 2 * np.pi * (us % 86_400_000_000) / 86_400_000_000.0
        d = pd.DataFrame({"event_type": batch["event_type"],
                          "s": np.sin(ang), "c": np.cos(ang),
                          "v": batch["value"]})
        g = d.groupby("event_type", as_index=False).agg(
            n=("s", "size"), s=("s", "sum"), c=("c", "sum"),
            v=("v", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return g

    b = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type"], ["n", "s", "c", "v"])
    ang = np.arctan2(b["s"], b["c"])
    hour = np.mod(ang + 2 * np.pi, 2 * np.pi) / (2 * np.pi) * 24
    return pd.DataFrame({
        "event_type": b["event_type"],
        "n": b["n"].astype(np.int64),
        "avg_value": (b["v"] / b["n"]).round(6),
        "circ_hour": hour.round(6),
    })
