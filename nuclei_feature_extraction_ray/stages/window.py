"""Windowed temporal operators: lag/lead, rolling (row- and time-based),
gap sessionize, backfill — the stateful core mandated by north_rule
(absent in the reference, whose windows are spatial and stateless;
SURVEY.md §2.3 ST6, §2.8).

Semantics / leakage: every kernel is TRAILING-only — row i sees rows of
the same entity with ``ts <= ts_i`` (and earlier position on ties). The
partition is sorted before kernels run, so the "watermark" is simply the
scan cursor: no later row can retroactively change an emitted value, a
property the leakage property test (tests/test_pipeline.py) verifies by
prefix recomputation.

All kernels take ONE sorted partition frame (many entities) and
vectorize across entities with pandas groupby (C implementation);
``state/deque.py`` holds the explicit monotonic-deque used for
rolling extremes in the flagship feature stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


_DAY_US = 86_400_000_000


def us_seconds(us: np.ndarray) -> np.ndarray:
    """int64 microseconds -> float seconds computed EXACTLY the way
    DuckDB's ``epoch(interval)`` does: a timestamp difference is
    normalized into (days, micros) and summed as
    ``days * 86400.0 + micros / 1e6`` in doubles (verified against
    DuckDB on boundary cases) — which differs from pandas
    ``total_seconds()`` (one correctly-rounded division) in the last
    ulp on ~1%% of multi-day values. Both engines use this one
    formula so seconds columns are bit-identical."""
    us = np.asarray(us)
    neg = us < 0
    a = np.abs(us)
    days = a // _DAY_US
    rem = a - days * _DAY_US
    out = days * 86400.0 + rem / 1e6
    return np.where(neg, -out, out)


def td_seconds(td) -> np.ndarray:
    """timedelta -> float seconds via the DuckDB epoch formula
    (``us_seconds``); NaT -> NaN."""
    arr = np.asarray(td).astype("timedelta64[us]")
    nat = np.isnat(arr)
    out = us_seconds(arr.astype(np.int64))
    out[nat] = np.nan
    return out


def add_lag_lead(g: pd.DataFrame, key: str, cols: list[str],
                 ts_col: str | None = None) -> pd.DataFrame:
    """prev_/next_ per entity + gap seconds; frame must be sorted by
    (key, ts, tiebreak)."""
    gb = g.groupby(key, sort=False)
    for c in cols:
        g["prev_" + c] = gb[c].shift(1)
        g["next_" + c] = gb[c].shift(-1)
        g["delta_" + c] = g[c] - g["prev_" + c]
    if ts_col is not None:
        prev_ts = gb[ts_col].shift(1)
        g["gap_sec"] = td_seconds(g[ts_col] - prev_ts)
    return g


# -- vectorized trailing-window machinery ----------------------------------
# The left window bound per row is non-decreasing (a watermark cursor
# over the sorted partition). sum/mean/count come from prefix sums;
# min/max from a sparse (doubling) table — O(n log n), zero Python
# per-entity calls. state/deque.py holds the equivalent streaming
# monotonic deque; tests assert all three implementations agree.

def segment_codes(sorted_keys: np.ndarray) -> np.ndarray:
    """Contiguous 0-based segment id per row of a key-sorted array."""
    if len(sorted_keys) == 0:
        return np.empty(0, np.int64)
    change = np.empty(len(sorted_keys), bool)
    change[0] = True
    change[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return np.cumsum(change) - 1


def segment_starts(codes: np.ndarray) -> np.ndarray:
    """Per-row global index of the row's segment start."""
    if len(codes) == 0:
        return np.empty(0, np.int64)
    idx = np.arange(len(codes))
    first = np.zeros(len(codes), bool)
    first[0] = True
    first[1:] = codes[1:] != codes[:-1]
    return idx[first][codes]


def row_window_lefts(codes: np.ndarray, window: int) -> np.ndarray:
    """Left bound of the trailing row window (current + window-1
    preceding, clipped at the entity boundary)."""
    idx = np.arange(len(codes))
    return np.maximum(segment_starts(codes), idx - window + 1)


def time_window_lefts(codes: np.ndarray, ts_us: np.ndarray,
                      span_us: int) -> np.ndarray:
    """Left bound of the trailing time window — CLOSED-left
    ``[ts_i - span, ts_i]`` (searchsorted side="left"; state/deque.py
    agrees), never crossing an entity boundary. Vectorized via the
    offset trick:
    each segment's timestamps are shifted onto a private int64 range
    separated by > span, so ONE global searchsorted respects segments.
    """
    if len(codes) == 0:
        return np.empty(0, np.int64)
    starts = segment_starts(codes)
    base = ts_us[starts]                       # per-row segment base ts
    rel = ts_us - base                         # within-segment offset
    seg_span = np.zeros(codes.max() + 1, np.int64)
    np.maximum.at(seg_span, codes, rel)
    stride = np.concatenate([[0], np.cumsum(seg_span + span_us + 1)[:-1]])
    vts = rel + stride[codes]
    return np.searchsorted(vts, vts - span_us, side="left")


def _sparse_extreme(values: np.ndarray, lefts: np.ndarray, op) -> np.ndarray:
    n = len(values)
    out = np.empty(n, np.float64)
    if n == 0:
        return out
    idx = np.arange(n)
    length = idx - lefts + 1
    tables = [values.astype(np.float64)]
    while (1 << len(tables)) <= length.max():
        half = 1 << (len(tables) - 1)
        prev = tables[-1]
        tables.append(op(prev[:-half], prev[half:]))
    j = np.int64(np.log2(length))
    for jv in np.unique(j):
        m = j == jv
        t = tables[jv]
        out[m] = op(t[lefts[m]], t[idx[m] - (1 << jv) + 1])
    return out


def windowed_stats(values: np.ndarray, lefts: np.ndarray) -> dict:
    """min/max/sum/mean/count over [lefts[i], i] for every i."""
    idx = np.arange(len(values))
    count = (idx - lefts + 1).astype(np.int64)
    prefix = np.concatenate([[0.0], np.cumsum(values, dtype=np.float64)])
    wsum = prefix[idx + 1] - prefix[lefts]
    return {
        "min": _sparse_extreme(values, lefts, np.minimum),
        "max": _sparse_extreme(values, lefts, np.maximum),
        "sum": wsum,
        "mean": wsum / count,
        "count": count,
    }


def add_rolling_rows(g: pd.DataFrame, key: str, col: str, window: int,
                     prefix: str | None = None) -> pd.DataFrame:
    """Trailing row-window (current + window-1 preceding) min/max/mean/
    count per entity; frame must be sorted by (key, ts)."""
    p = prefix or ("roll%d_" % window)
    codes = segment_codes(g[key].to_numpy())
    lefts = row_window_lefts(codes, window)
    st = windowed_stats(g[col].to_numpy(np.float64), lefts)
    for stat in ("min", "max", "mean", "count"):
        g[p + stat] = st[stat]
    return g


def _window_matrix(vals: np.ndarray, codes: np.ndarray,
                   window: int) -> np.ndarray:
    """(n, window) matrix of each row's trailing window values (NaN
    where the window is clipped by the entity boundary) — built from
    ``window - 1`` vectorized shifted copies, no per-row Python."""
    n = len(vals)
    mat = np.full((n, window), np.nan)
    if n == 0:
        return mat
    mat[:, 0] = vals
    idx = np.arange(n)
    for s in range(1, window):
        src = idx - s
        ok = src >= 0
        ok[ok] &= codes[src[ok]] == codes[idx[ok]]
        mat[ok, s] = vals[src[ok]]
    return mat


def add_rolling_quantiles(g: pd.DataFrame, key: str, col: str,
                          window: int, qs: dict[str, float]) -> pd.DataFrame:
    """Trailing row-window ORDER-STATISTIC aggregates (continuous
    quantiles) per entity — the windowed kernel ``windowed_stats``'
    prefix sums cannot express. Bounded ``window`` keeps it vectorized:
    an (n, window) shifted-copy matrix is sorted once, then every
    requested quantile is DuckDB's ``quantile_cont`` formula
    ``lo * (1 - frac) + hi * frac`` at ``idx = q * (count - 1)`` —
    verified bit-identical to ``quantile_cont(col) OVER (... ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)``. Sorted-frame
    precondition, as every kernel in this module."""
    codes = segment_codes(g[key].to_numpy())
    mat = _window_matrix(g[col].to_numpy(np.float64), codes, window)
    mat.sort(axis=1)                          # NaN sorts to the end
    n = len(mat)
    cnt = window - np.isnan(mat).sum(axis=1)
    rows = np.arange(n)
    for name, q in qs.items():
        pos = q * (cnt - 1)
        lo = np.floor(pos).astype(np.int64)
        frac = pos - lo
        hi = np.minimum(lo + 1, np.maximum(cnt - 1, 0))
        g[name] = mat[rows, lo] * (1.0 - frac) + mat[rows, hi] * frac
    return g


def add_rolling_distinct(g: pd.DataFrame, key: str, col: str,
                         window: int, out_col: str) -> pd.DataFrame:
    """Trailing row-window DISTINCT-count of a (categorical) column
    per entity — the windowed aggregate neither prefix sums nor sparse
    extreme tables can express. Values are factorized to int codes,
    the bounded window becomes a shifted-copy int matrix (sentinel -1
    where clipped), and one row-wise sort + adjacent-inequality scan
    counts distincts — vectorized end to end. Matches DuckDB's
    ``len(list_distinct(list(col) OVER w))``. Sorted-frame
    precondition."""
    codes = segment_codes(g[key].to_numpy())
    vals, _ = pd.factorize(g[col], sort=False)
    n = len(vals)
    mat = np.full((n, window), -1, np.int64)
    if n:
        mat[:, 0] = vals
        idx = np.arange(n)
        for s in range(1, window):
            src = idx - s
            ok = src >= 0
            ok[ok] &= codes[src[ok]] == codes[idx[ok]]
            mat[ok, s] = vals[src[ok]]
        mat.sort(axis=1)                      # sentinels sort first
    valid = mat >= 0
    neq = np.ones((n, window), bool)
    neq[:, 1:] = mat[:, 1:] != mat[:, :-1]
    g[out_col] = (valid & neq).sum(axis=1).astype(np.int64)
    return g


def add_rolling_lag1_corr(g: pd.DataFrame, key: str, col: str,
                          window: int, out_col: str,
                          n_col: str) -> pd.DataFrame:
    """Trailing row-window lag-1 autocorrelation per entity, computed
    on INTEGER micro-units so every windowed sum is exact in both
    engines regardless of fold order: ``x = floor(col*100 + 0.5)``
    (the value columns are 2-decimal by contract), ``y = lag(x)``
    within the entity, then the five pair sums (n, sx, sy, sxx, syy,
    sxy) over the trailing window via int64 cumulative sums, and ONE
    final double expression
    ``(n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))``
    evaluated in the same left-to-right order as the SQL oracle —
    bit-exact before the shared half-away round.  NaN where n < 2 or
    either variance is zero.  Sorted-frame precondition."""
    from ..functions.texture import r6
    codes = segment_codes(g[key].to_numpy())
    v = g[col].to_numpy(np.float64)
    x = np.floor(v * 100.0 + 0.5).astype(np.int64)
    n = len(x)
    y = np.zeros(n, np.int64)
    valid = np.zeros(n, bool)
    if n > 1:
        y[1:] = x[:-1]
        valid[1:] = codes[1:] == codes[:-1]
    y[~valid] = 0
    xm = np.where(valid, x, 0)
    lefts = row_window_lefts(codes, window)
    idx = np.arange(n)

    def wsum(a: np.ndarray) -> np.ndarray:
        cs = np.concatenate(([0], np.cumsum(a, dtype=np.int64)))
        return cs[idx + 1] - cs[lefts]

    cnt = wsum(valid.astype(np.int64))
    sx, sy = wsum(xm), wsum(y)
    sxx, syy, sxy = wsum(xm * xm), wsum(y * y), wsum(xm * y)
    nf = cnt.astype(np.float64)
    varx = nf * sxx.astype(np.float64) \
        - sx.astype(np.float64) * sx.astype(np.float64)
    vary = nf * syy.astype(np.float64) \
        - sy.astype(np.float64) * sy.astype(np.float64)
    cov = nf * sxy.astype(np.float64) \
        - sx.astype(np.float64) * sy.astype(np.float64)
    ok = (cnt >= 2) & (varx > 0) & (vary > 0)
    out = np.full(n, np.nan)
    out[ok] = r6(cov[ok] / (np.sqrt(varx[ok]) * np.sqrt(vary[ok])))
    g[out_col] = out
    g[n_col] = cnt
    return g


def add_ewma_rows(g: pd.DataFrame, key: str, col: str, window: int,
                  alpha: float, out_col: str) -> pd.DataFrame:
    """Trailing bounded-window EWMA per entity: the sequential
    recurrence ``acc = acc * (1 - alpha) + x * alpha`` folded left to
    right over the trailing ``window`` rows, initialised at the oldest
    row in the window. Vectorized as ``window - 1`` masked numpy
    passes, each performing exactly the per-element fold step — so the
    result is bit-identical to DuckDB's
    ``list_reduce(list(col) OVER w, (acc, x) -> acc*(1-a) + x*a)``
    (verified; pick alpha with an exact binary representation so
    ``1 - alpha`` is exact too). Bounding the window is what makes the
    fold salt-safe at scale: a hot entity can be split into overlapping
    time buckets exactly like ``salted_time_windows``."""
    codes = segment_codes(g[key].to_numpy())
    lefts = row_window_lefts(codes, window)
    v = g[col].to_numpy(np.float64)
    idx = np.arange(len(v))
    acc = v[lefts].copy() if len(v) else np.empty(0)
    for s in range(1, window):
        pos = lefts + s
        m = pos <= idx
        acc[m] = acc[m] * (1.0 - alpha) + v[pos[m]] * alpha
    g[out_col] = acc
    return g


def concurrency_sweep(g: pd.DataFrame, group_col: str, ts_col: str,
                      delta_col: str) -> pd.DataFrame:
    """Interval-overlap sweep line over (+1 start / -1 end) boundary
    events, one independent sweep per ``group_col`` value: sort by
    ``(ts, delta DESC)`` (starts before ends on ties — closed
    intervals overlap at their boundary), running-sum the deltas, and
    report the per-group maximum concurrency plus the interval count.
    Vectorized across ALL groups in the frame via segment-wise cumsum
    (one np.lexsort + np.maximum.reduceat, no per-group Python)."""
    order = np.lexsort((-g[delta_col].to_numpy(np.int64),
                        g[ts_col].to_numpy(np.int64),
                        g[group_col].to_numpy()))
    grp = g[group_col].to_numpy()[order]
    delta = g[delta_col].to_numpy(np.int64)[order]
    codes = segment_codes(grp)
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) \
        if len(codes) else np.empty(0, np.int64)
    run = np.cumsum(delta)
    # subtract each segment's preceding total to restart the cumsum
    base = np.zeros(len(delta), np.int64)
    if len(starts) > 1:
        base = np.repeat(np.r_[0, run[starts[1:] - 1]],
                         np.diff(np.r_[starts, len(delta)]))
    seg_run = run - base
    mx = np.maximum.reduceat(seg_run, starts) if len(starts) else \
        np.empty(0, np.int64)
    n_iv = np.add.reduceat((delta > 0).astype(np.int64), starts) \
        if len(starts) else np.empty(0, np.int64)
    return pd.DataFrame({group_col: grp[starts],
                         "max_concurrent": mx.astype(np.int64),
                         "n_sessions": n_iv})


def add_rolling_time(g: pd.DataFrame, key: str, ts_col: str, col: str,
                     span: pd.Timedelta, prefix: str) -> pd.DataFrame:
    """Trailing TIME-window aggregates (rows with ts in
    [ts_i - span, ts_i], closed-left) per entity — variable-width
    windows, the case the reference's fixed pixel windows never hit."""
    codes = segment_codes(g[key].to_numpy())
    ts_us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
    lefts = time_window_lefts(codes, ts_us,
                              int(span.value // 1000))
    st = windowed_stats(g[col].to_numpy(np.float64), lefts)
    for stat in ("min", "max", "mean", "count"):
        g[prefix + stat] = st[stat]
    return g


def add_session_ids(g: pd.DataFrame, key: str, ts_col: str,
                    gap_seconds: float,
                    out_col: str = "session_id") -> pd.DataFrame:
    """Gap-based sessionize: a new session starts when the gap to the
    previous row of the same entity exceeds ``gap_seconds`` (strictly).
    session_id is 0-based per entity. Sorted-frame precondition."""
    gb = g.groupby(key, sort=False)
    gap = pd.Series(td_seconds(g[ts_col] - gb[ts_col].shift(1)),
                    index=g.index)
    new = gap.isna() | (gap > gap_seconds)
    g[out_col] = new.groupby(g[key], sort=False).cumsum().astype(np.int64) - 1
    return g


def add_backfill(g: pd.DataFrame, key: str, src_col: str,
                 out_col: str) -> pd.DataFrame:
    """Forward-fill the last non-null ``src_col`` per entity (point-in-
    time backfill: each row carries the most recent known value)."""
    g[out_col] = g.groupby(key, sort=False)[src_col].ffill()
    return g


def session_aggregate(g: pd.DataFrame, key: str, ts_col: str,
                      value_col: str, gap_seconds: float) -> pd.DataFrame:
    """Sessionize then reduce to one row per (entity, session)."""
    g = add_session_ids(g, key, ts_col, gap_seconds)
    agg = g.groupby([key, "session_id"], sort=False).agg(
        n_events=(ts_col, "size"),
        start_ts=(ts_col, "min"),
        end_ts=(ts_col, "max"),
        sum_value=(value_col, "sum"),
    ).reset_index()
    agg["duration_sec"] = td_seconds(agg["end_ts"] - agg["start_ts"])
    agg["n_events"] = agg["n_events"].astype(np.int64)
    return agg


# -- hot-entity salting for windowed operators ------------------------------

def salted_time_windows(ts_us: np.ndarray, values: np.ndarray,
                        span_us: int, n_buckets: int) -> dict:
    """Trailing time-window stats for ONE hot entity computed as if the
    entity were split across ``n_buckets`` salted sub-partitions.

    This is the correctness recipe for skew salting of windowed
    operators (SURVEY.md §7 hard part b): each time bucket is extended
    LEFT by the window span (the overlap region), stats are computed
    bucket-locally, and only rows owned by the bucket are emitted — so
    every emitted row saw its full trailing window and the result is
    byte-identical to the unsalted computation. ``ts_us`` sorted.

    Returned dict matches ``windowed_stats`` (min/max/sum/mean/count).
    """
    n = len(ts_us)
    out = {k: np.empty(n, np.float64) for k in
           ("min", "max", "sum", "mean")}
    out["count"] = np.empty(n, np.int64)
    if n == 0:
        return out
    bounds = np.linspace(ts_us[0], ts_us[-1] + 1,
                         n_buckets + 1).astype(np.int64)
    for b in range(n_buckets):
        lo, hi = bounds[b], bounds[b + 1]
        own = (ts_us >= lo) & (ts_us < hi)
        if not own.any():
            continue
        ext = (ts_us >= lo - span_us) & (ts_us < hi)   # + overlap
        lefts = np.searchsorted(
            ts_us[ext], ts_us[ext] - span_us, side="left")
        st = windowed_stats(values[ext], lefts)
        own_in_ext = own[ext]
        for k in out:
            out[k][own] = st[k][own_in_ext]
    return out
