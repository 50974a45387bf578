# round-5 session-2 additions, batch 3: the monotonic-deque time
# window surfaced as a first-class query (rolling_extrema_time), a
# point-in-time LOCF time-weighted average (twap_value), a
# bloom-pushdown semi-join with exact verification (bloom_semi_join),
# lead-lag cross-correlation between two daily series (xcorr_lag),
# and prefix-filtered AllPairs exact Jaccard (jaccard_prefix).
from __future__ import annotations

from ._shared import (EVENTS_P, ORACLE, _combine_partials, _events,
                      _path, np, pa, partition_map, partitioned_apply,
                      pc, pd, ray, rd, register)
from ...functions.texture import _sql_r6, r6
from ...stages.window import (_sparse_extreme, segment_codes,
                              time_window_lefts)

#: rolling_extrema_time: trailing time-window span (6 hours) — the
#: variable-width window the reference's fixed pixel windows never hit
_ROLL_SPAN_US = 6 * 3600 * 1_000_000

#: xcorr_lag: day offsets swept for the cross-correlation
_XCORR_LAGS = list(range(-3, 4))

#: jaccard_prefix: similarity threshold — higher than jaccard_pairs'
#: exploratory 0.08 because prefix filtering is the STRONG-near-dup
#: plan (prefix length shrinks as t grows)
_PREFIX_TAU = 0.5


@register("rolling_extrema_time", sql="""
    SELECT event_id, user_id, ts,
           min(value) OVER w AS roll6h_min,
           max(value) OVER w AS roll6h_max,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                AS BIGINT) AS roll6h_sum_cents,
           CAST(count(*) OVER w AS BIGINT) AS roll6h_count
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 6 HOUR PRECEDING
                       AND CURRENT ROW)""")
def rolling_extrema_time(sf_dir: str):
    """Trailing TIME-window (6 h, closed both ends) min / max / cents
    sum / count per user — the monotonic-deque window state of the
    north rule (state/deque.py is the streaming form; this query runs
    the equivalent vectorized sparse-table pass from stages/window:
    time_window_lefts' segment-offset searchsorted + _sparse_extreme's
    doubling tables, zero per-row Python). Peers under SQL RANGE
    semantics — rows sharing (user, ts) — all see the full peer run,
    so every stat is read at the run's LAST row and broadcast back.
    The sum is integer cents end to end (exact prefix difference, no
    float fold); min/max pick existing doubles — nothing rounds."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        ts_us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        vals = g["value"].to_numpy(np.float64)
        cents = np.floor(vals * 100 + 0.5).astype(np.int64)
        n = len(g)
        if n == 0:
            pos = np.empty(0, np.int64)
            lefts = pos
        else:
            lefts = time_window_lefts(codes, ts_us, _ROLL_SPAN_US)
            change = np.empty(n, bool)
            change[0] = True
            change[1:] = (codes[1:] != codes[:-1]) | \
                (ts_us[1:] != ts_us[:-1])
            run = np.cumsum(change) - 1
            last = np.zeros(run[-1] + 1, np.int64)
            np.maximum.at(last, run, np.arange(n))
            pos = last[run]
        idx = np.arange(n)
        pre = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "ts": g["ts"].to_numpy(),
            "roll6h_min": _sparse_extreme(vals, lefts,
                                          np.minimum)[pos],
            "roll6h_max": _sparse_extreme(vals, lefts,
                                          np.maximum)[pos],
            "roll6h_sum_cents": (pre[idx + 1] - pre[lefts])[pos]
                .astype(np.int64),
            "roll6h_count": (idx - lefts + 1)[pos].astype(np.int64)})

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("twap_value", sql="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events),
    a AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(us) - min(us) AS BIGINT) AS duration_us,
             CAST(coalesce(sum(CASE WHEN nxt IS NULL THEN NULL
                  ELSE CAST(cents AS HUGEINT) * (nxt - us) END), 0)
               AS HUGEINT) AS s_cus
      FROM s GROUP BY user_id
      HAVING count(*) >= 2 AND max(us) > min(us))
    SELECT user_id, n_events, duration_us,
           {t} AS twap
    FROM a ORDER BY user_id""".format(
        t=_sql_r6("CAST(s_cus AS DOUBLE)"
                  " / (100.0 * CAST(duration_us AS DOUBLE))")))
def twap_value(sf_dir: str):
    """Time-weighted average value per user — the point-in-time LOCF
    integral (each observation holds until the next one; the feature-
    store TWAP a naive mean misrepresents whenever sampling is
    bursty). The integral sum(cents_i * dus_i) folds in EXACT python
    ints (pandas object-dtype groupby sum — the engine-side HUGEINT),
    so the only float is ONE final division mirrored verbatim in the
    oracle; users with < 2 events or zero elapsed time are excluded
    on both sides. Scale shape: one user_id hash exchange, partition-
    local lag, bounded per-user output."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.floor(g["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
                "duration_us": pd.Series(dtype=np.int64),
                "twap": pd.Series(dtype=np.float64)})
        nxt_same = np.zeros(n, bool)
        nxt_same[:-1] = codes[1:] == codes[:-1]
        # exact python-int products/sums (object dtype): the HUGEINT
        term = np.where(nxt_same,
                        cents.astype(object)
                        * np.concatenate((us[1:] - us[:-1], [0]))
                        .astype(object),
                        0)
        agg = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "n": np.ones(n, np.int64),
            "us_min": us, "us_max": us, "s_cus": term}) \
            .groupby("user_id", as_index=False).agg(
                n_events=("n", "sum"), us_min=("us_min", "min"),
                us_max=("us_max", "max"), s_cus=("s_cus", "sum"))
        dur = agg["us_max"].to_numpy(np.int64) \
            - agg["us_min"].to_numpy(np.int64)
        keep = (agg["n_events"].to_numpy(np.int64) >= 2) & (dur > 0)
        agg = agg[keep]
        dur = dur[keep]
        twap = np.asarray([
            r6(float(s) / (100.0 * float(d)))
            for s, d in zip(agg["s_cus"], dur)], np.float64)
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(np.int64),
            "n_events": agg["n_events"].to_numpy(np.int64),
            "duration_us": dur.astype(np.int64),
            "twap": twap})

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("bloom_semi_join", sql="""
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')""")
def bloom_semi_join(sf_dir: str):
    """Semi-join with BLOOM-FILTER PUSHDOWN and exact verification:
    lineitem rows belonging to urgent orders. The urgent key set is
    built as per-batch 128 KiB Bloom bitmap partials OR-merged on the
    driver (fixed memory regardless of key count) and broadcast once;
    the lineitem scan then ships ONLY bloom-positive rows — already
    pre-aggregated per orderkey — into one co-partition exchange with
    the true key set, where false positives are discarded exactly.
    The result is exact (no FN in the filter, FP removed by the
    verify), while the exchange volume shrinks from every lineitem
    row to candidates-only: the classic join-pushdown a 100 TB fact
    scan needs. Revenue folds as integer cents."""
    from ...functions.sketch import (bloom_contains, bloom_merge,
                                     bloom_partial)

    M_BITS, K = 1 << 20, 7

    def _mix64(a: np.ndarray) -> np.ndarray:
        # splitmix64 finalizer — sequential orderkeys -> dispersed bits
        z = a.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    keys = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"))

    def bpart(b: pd.DataFrame) -> pd.DataFrame:
        h = _mix64(b["o_orderkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {"bmp": [bloom_partial(h, M_BITS, K).tobytes()]})

    parts = keys.map_batches(bpart, batch_format="pandas") \
        .limit(100_000).to_pandas()
    bmp = bloom_merge([np.frombuffer(p, np.uint8)
                       for p in parts["bmp"]])
    bref = ray.put(bmp)

    class Cand:
        def __init__(self):
            self.bmp = ray.get(bref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            k = b["l_orderkey"].to_numpy(np.int64)
            memb = bloom_contains(self.bmp, _mix64(k), K)
            cents = np.round(b["l_extendedprice"].to_numpy()[memb]
                             * 100).astype(np.int64)
            g = pd.DataFrame({
                "orderkey": k[memb],
                "n": np.ones(int(memb.sum()), np.int64),
                "cents": cents}) \
                .groupby("orderkey", as_index=False).sum()
            for c in ("n", "cents"):
                g[c] = g[c].astype(np.int64)
            g["side"] = np.zeros(len(g), np.int64)
            return g

    cand = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice"]) \
        .map_batches(Cand, batch_format="pandas", concurrency=2)

    def krows(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "orderkey": k, "n": np.zeros(len(k), np.int64),
            "cents": np.zeros(len(k), np.int64),
            "side": np.ones(len(k), np.int64)})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        real = set(g.loc[g["side"] == 1, "orderkey"].tolist())
        p = g[g["side"] == 0]
        p = p[p["orderkey"].isin(real)]
        agg = p.groupby("orderkey", as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"))
        return pd.DataFrame({
            "n_orders": [np.int64(len(agg))],
            "n_items": [np.int64(agg["n"].sum())],
            "revenue_cents": [np.int64(agg["cents"].sum())]})

    parts2 = partition_map(
        cand.union(keys.map_batches(krows, batch_format="pandas")),
        ["orderkey"], verify, 16).to_pandas()
    return pd.DataFrame({
        "n_orders": [np.int64(parts2["n_orders"].sum())],
        "n_items": [np.int64(parts2["n_items"].sum())],
        "revenue_cents": [np.int64(parts2["revenue_cents"].sum())]})


@register("xcorr_lag", sql="""
    WITH e AS (SELECT CAST(ts AS DATE) AS d, event_type FROM events),
    b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
    days AS (SELECT unnest(generate_series(lo, hi,
                           INTERVAL 1 DAY))::DATE AS d FROM b),
    cc AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM e
           WHERE event_type = 'click' GROUP BY d),
    pp AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM e
           WHERE event_type = 'purchase' GROUP BY d),
    c AS (SELECT days.d, coalesce(cc.n, 0) AS x,
                 coalesce(pp.n, 0) AS y
          FROM days LEFT JOIN cc USING (d) LEFT JOIN pp USING (d)),
    lags AS (SELECT unnest([{lags}]) AS lag),
    j AS (SELECT l.lag, a.x AS x, b2.y AS y
          FROM lags l JOIN c a ON true
          JOIN c b2 ON b2.d = a.d + CAST(l.lag AS INTEGER)),
    s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x*y) AS HUGEINT) AS sxy,
                 CAST(sum(x*x) AS HUGEINT) AS sxx,
                 CAST(sum(y*y) AS HUGEINT) AS syy
          FROM j GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
           CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0
                THEN NULL ELSE {r} END AS r
    FROM s ORDER BY lag""".format(
        lags=", ".join(str(v) for v in _XCORR_LAGS),
        r=_sql_r6("CAST(n*sxy - sx*sy AS DOUBLE)"
                  " / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)"
                  " * CAST(n*syy - sy*sy AS DOUBLE))")))
def xcorr_lag(sf_dir: str):
    """Lead-lag cross-correlation between the daily click and
    purchase volumes: Pearson r of (clicks_d, purchases_{d+L}) for
    each lag L in -3..3 over the dense observed day grid (missing
    days count 0) — does click volume LEAD purchases? The corpus
    collapses to per-batch (day, clicks, purchases) integer partials
    through one tiny combine; the bounded day table then yields every
    lag's five sufficient statistics as exact python-int sums on the
    driver, and r is ONE double expression (shared-r6) per lag —
    degenerate variance lags surface as NULL, never a crash."""
    ds = _events(sf_dir, columns=["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["ts"].to_numpy("datetime64[D]").astype(np.int64)
        et = b["event_type"].to_numpy(object)
        g = pd.DataFrame({
            "d": d,
            "x": (et == "click").astype(np.int64),
            "y": (et == "purchase").astype(np.int64)}) \
            .groupby("d", as_index=False).sum()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["d"], ["x", "y"])
    lo, hi = int(hist["d"].min()), int(hist["d"].max())
    grid = np.zeros((hi - lo + 1, 2), np.int64)
    grid[hist["d"].to_numpy(np.int64) - lo, 0] = \
        hist["x"].to_numpy(np.int64)
    grid[hist["d"].to_numpy(np.int64) - lo, 1] = \
        hist["y"].to_numpy(np.int64)
    x_all, y_all = grid[:, 0], grid[:, 1]
    nd = len(grid)
    rows = []
    for lag in _XCORR_LAGS:
        if lag >= 0:
            x, y = x_all[:nd - lag], y_all[lag:]
        else:
            x, y = x_all[-lag:], y_all[:nd + lag]
        xo = x.astype(object)
        yo = y.astype(object)
        n = len(x)
        sx, sy = xo.sum(), yo.sum()
        sxy = (xo * yo).sum()
        sxx = (xo * xo).sum()
        syy = (yo * yo).sum()
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        r = (np.nan if da == 0 or db == 0 else
             float(r6(float(n * sxy - sx * sy)
                      / np.sqrt(float(da) * float(db)))))
        rows.append({"lag": np.int64(lag), "n_days": np.int64(n),
                     "r": np.float64(r)})
    return pd.DataFrame(rows)


@register("jaccard_prefix")
def jaccard_prefix(sf_dir: str):
    """Exact near-dup pairs at Jaccard >= 0.5 via PREFIX-FILTERED
    AllPairs (stages/dedup.jaccard_pairs_prefix): candidate pairs are
    enumerated only over each doc's rarest-shingle prefix under the
    global df order, then verified exactly by two blob-attachment
    exchanges — no driver collect, no broadcast, hot shingles fall
    out of prefixes by construction. Oracle: the same brute-force SQL
    as jaccard_pairs at this threshold."""
    from ...stages import dedup as dedup_mod

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.jaccard_pairs_prefix(
        ds, "text", "doc_id", ngram=2, threshold=_PREFIX_TAU)


ORACLE["jaccard_prefix"] = """
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), sh AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) < 2
               THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1]) END) AS s
      FROM docs
    ), pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT a, b, inter * 1.0 / uni AS jaccard
    FROM pairs WHERE uni > 0 AND inter * 1.0 / uni >= 0.5"""
