"""Range (interval) join — SURVEY.md §2.4 J-family completion.

The as-of join (stages/asof.py) answers "latest snapshot at or before
t"; the range join answers "ALL right rows of the same entity with
``right_ts`` in ``[left_ts + lo, left_ts + hi)``" and emits one output
row per matched pair (inner). The reference's only join is a
key-aligned column concat (src/main.rs:76-87); this operator is the
windowed-pair shape a funnel / attribution pipeline needs (view →
purchases within a day, impression → clicks within an hour).

Plan — identical exchange discipline to the as-of join:

* both sides are tagged and unioned, then ONE hash exchange on the
  entity key (stages/partition.partition_map) co-locates each entity's
  left and right rows; the join itself adds no second shuffle;
* per partition, pair enumeration is FULLY vectorized — no Python loop
  over keys.  The right side is lexsorted by ``(key, ts)``; for every
  left row the slice of matching right rows is ``[searchsorted(key,
  ts+lo), searchsorted(key, ts+hi))`` in that lexicographic order.
  numpy's ``searchsorted`` can't binary-search a 2-key composite, so
  both bounds for all left rows are computed with ONE merged lexsort:
  the sorted right rows and two boundary probes per left row are
  sorted together (probes tie-break BEFORE equal right rows =
  'left' semantics), and each probe's bound is the count of right rows
  preceding it in the merged order — O((R + 2 L) log) per partition,
  all in C;
* pair materialization is the standard repeat/arange gather.

Skew note (100-TB): output cardinality is sum over pairs, so a hot
entity with V views × P purchases in-window emits V·P rows.  The
kernel never builds per-key Python state, and each partition streams
out one Arrow table; if one entity dominates, salt it with
``stages/salt`` time buckets sized ≥ the window (same rule as the
windowed operators — sub-partitions need ``hi - lo`` overlap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .partition import partition_map

_SIDE = "__side"


def _arrow_fields(ds) -> list[tuple[str, pa.DataType]]:
    sch = ds.schema()
    out = []
    for n, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                t = pa.string()
        out.append((n, t))
    return out


def interval_bounds(rk: np.ndarray, rt: np.ndarray,
                    lk: np.ndarray, t_lo: np.ndarray,
                    t_hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For right rows sorted lexicographically by ``(rk, rt)``, return
    per-left-row ``(lo, hi)`` positions such that rows ``lo..hi`` are
    exactly those with key == lk[i] and rt in ``[t_lo[i], t_hi[i])``.

    Single merged lexsort over right rows + 2 probes per left row;
    probes sort before right rows with equal (key, ts), giving
    ``searchsorted(..., side='left')`` semantics for both ends —
    correct for a half-open ``[lo, hi)`` window.  Rows between the two
    bounds necessarily share the probe's key: any later key compares
    lexicographically ≥ ``(lk, t_hi)``.
    """
    n_r, n_l = len(rk), len(lk)
    keys = np.concatenate([rk, lk, lk])
    ts = np.concatenate([rt, t_lo, t_hi])
    tie = np.zeros(n_r + 2 * n_l, np.int8)
    tie[:n_r] = 1                       # probes first on full ties
    order = np.lexsort((tie, ts, keys))
    is_right = (order < n_r)
    before = np.cumsum(is_right) - is_right   # right rows strictly before
    pos = np.empty(n_r + 2 * n_l, np.int64)
    pos[order] = before
    return pos[n_r:n_r + n_l], pos[n_r + n_l:]


def interval_pairs(rk, rt, lk, lt, lo_us: int, hi_us: int):
    """Vectorized pair enumeration.  Returns ``(li, ri)`` index arrays
    into the (unsorted) left rows and the LEXSORTED right rows."""
    lo_b, hi_b = interval_bounds(rk, rt, lk, lt + lo_us, lt + hi_us)
    counts = hi_b - lo_b
    li = np.repeat(np.arange(len(lk), dtype=np.int64), counts)
    starts = np.repeat(lo_b, counts)
    csum = np.cumsum(counts) - counts          # exclusive prefix sum
    offs = np.arange(counts.sum(), dtype=np.int64) \
        - np.repeat(csum, counts)
    return li, starts + offs


def range_join(left, right, key: str, left_ts: str, right_ts: str,
               lo: pd.Timedelta, hi: pd.Timedelta,
               num_partitions: int = 32):
    """Inner interval join: one output row per (left, right) pair with
    equal ``key`` and ``left[left_ts] + lo <= right[right_ts] <
    left[left_ts] + hi``.  Column names of the two sides must be
    disjoint apart from ``key`` (rename upstream, as with asof_join).
    Output columns: all left columns, then right's non-key columns.
    """
    l_fields = _arrow_fields(left)
    r_fields = [(n, t) for n, t in _arrow_fields(right) if n != key]
    l_names = [n for n, _ in l_fields]
    r_names = [n for n, _ in r_fields]
    out_types = dict(l_fields + r_fields)
    out_cols = l_names + r_names
    lo_us = int(lo // pd.Timedelta(microseconds=1))
    hi_us = int(hi // pd.Timedelta(microseconds=1))

    def pad(missing):
        def fn(batch: pa.Table) -> pa.Table:
            for name, typ in missing:
                if name not in batch.column_names:
                    batch = batch.append_column(
                        name, pa.nulls(len(batch), typ))
            return batch
        return fn

    p = left.map_batches(pad(r_fields), batch_format="pyarrow") \
        .add_column(_SIDE, lambda df: np.zeros(len(df), np.int8),
                    batch_format="pandas")
    r = right.map_batches(pad([(n, t) for n, t in l_fields
                               if n != key]),
                          batch_format="pyarrow") \
        .add_column(_SIDE, lambda df: np.ones(len(df), np.int8),
                    batch_format="pandas")
    both = p.union(r)

    def to_output(df: pd.DataFrame) -> pa.Table:
        return pa.table({c: pa.array(df[c], type=out_types[c],
                                     from_pandas=True)
                         for c in out_cols})

    def ts_int64(s: pd.Series) -> np.ndarray:
        return s.to_numpy().astype("datetime64[us]").astype(np.int64)

    def merge(g: pd.DataFrame) -> pa.Table:
        lf = g[g[_SIDE] == 0]
        rf = g[g[_SIDE] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return to_output(pd.DataFrame({c: [] for c in out_cols}))
        rk = rf[key].to_numpy()
        rt = ts_int64(rf[right_ts])
        order = np.lexsort((rt, rk))
        rf = rf.iloc[order]
        li, ri = interval_pairs(rk[order], rt[order],
                                lf[key].to_numpy(),
                                ts_int64(lf[left_ts]), lo_us, hi_us)
        out = lf[l_names].iloc[li].reset_index(drop=True)
        rvals = rf[r_names].iloc[ri].reset_index(drop=True)
        for c in r_names:
            out[c] = rvals[c]
        return to_output(out)

    return partition_map(both, [key], merge, num_partitions)
