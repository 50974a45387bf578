"""Sort-merge point-in-time (as-of) join — SURVEY.md §2.4 J3, the core
operator the north_rule adds over the reference (whose only join is a
key-aligned column concat, ``src/main.rs:76-87``).

Plan: both sides are tagged and unioned, and ONE hash exchange on the
entity key (stages/partition.partition_map) delivers each partition's
probes and snapshots to the same task, which sorts by ts and runs a C
merge pass
(``pandas.merge_asof``, backward, allow_exact_matches=True, i.e.
``snapshot_ts <= probe_ts``: strict point-in-time, zero leakage).
Because probe and snapshot of the same entity always hash to the same
partition, the join itself adds no second shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .partition import partition_map

_SIDE = "__side"


def _pandas_dtypes(ds, cols: list[str]) -> dict:
    """The pandas dtype each Arrow column converts to WITHOUT null
    padding — the dtype the oracle (and a plain read) would produce."""
    sch = ds.schema()
    fields = [pa.field(n, t) for n, t in zip(sch.names, sch.types)
              if n in cols and isinstance(t, pa.DataType)]
    if not fields:
        return {}
    return dict(pa.schema(fields).empty_table().to_pandas().dtypes)


def asof_join(probes, snapshots, key: str, probe_ts: str, snap_ts: str,
              value_cols: list[str], num_partitions: int = 32,
              tolerance: pd.Timedelta | None = None,
              direction: str = "backward"):
    """Left as-of join: every probe row survives; matched rows carry the
    ``value_cols`` of the latest snapshot with ``snap_ts <= probe_ts``
    (within ``tolerance`` if given), else nulls.
    ``direction="forward"`` flips the inequality: the EARLIEST snapshot
    with ``snap_ts >= probe_ts`` (DuckDB ``ASOF ... ON p.ts <= v.ts``)
    — the "next-snapshot" lookup of backtest labelling.

    Returns a Dataset with probe columns + ``snap_ts`` + value_cols.
    """
    probe_cols = [c for c in probes.schema().names]
    snap_keep = [key, snap_ts] + value_cols

    p = probes.select_columns(probe_cols)
    s = snapshots.select_columns(snap_keep)

    # The union pads each side with nulls for the other side's columns,
    # so when the exchanged block becomes pandas, null-padded integer
    # probe columns upcast to float64. Probe rows themselves are never
    # null in probe columns, so after the merge we restore the probes'
    # original dtypes (the dtype pandas would give the un-padded side).
    probe_dtypes = _pandas_dtypes(probes, probe_cols)

    # Align schemas for union: each side gets the other's columns as null.
    def pad(missing_schema_cols):
        def fn(batch: pa.Table) -> pa.Table:
            for name, typ in missing_schema_cols:
                if name not in batch.column_names:
                    batch = batch.append_column(
                        name, pa.nulls(len(batch), typ))
            return batch
        return fn

    def fields_of(ds) -> list[tuple[str, pa.DataType]]:
        sch = ds.schema()
        out = []
        for n, t in zip(sch.names, sch.types):
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()   # pandas object dtype
            out.append((n, t))
        return out

    s_schema = [(n, t) for n, t in fields_of(snapshots)
                if n in snap_keep and n != key]
    p_schema = [(n, t) for n, t in fields_of(probes) if n != key]
    p = p.map_batches(pad(s_schema), batch_format="pyarrow") \
         .add_column(_SIDE, lambda df: np.zeros(len(df), np.int8),
                     batch_format="pandas")
    s = s.map_batches(pad(p_schema), batch_format="pyarrow") \
         .add_column(_SIDE, lambda df: np.ones(len(df), np.int8),
                     batch_format="pandas")
    both = p.union(s)

    out_cols = probe_cols + [snap_ts] + value_cols

    # Restore is SCHEMA-driven, at the Arrow layer: each probe column
    # is converted back to its ORIGINAL Arrow type (null-padded int64
    # probe columns upcast to float64 in the pandas merge; a
    # data-dependent isna() heuristic would leave a legitimately-null
    # probe column float64 in some partitions and int64 in others —
    # inconsistent block schemas on union). Arrow int64 carries nulls,
    # so nullable probe columns keep their type end-to-end.
    probe_arrow_types = {n: t for n, t in fields_of(probes)}

    def to_output(df: pd.DataFrame) -> pa.Table:
        cols = {}
        for c in out_cols:
            typ = probe_arrow_types.get(c)
            cols[c] = pa.array(df[c], type=typ, from_pandas=True) \
                if typ is not None else pa.array(df[c], from_pandas=True)
        return pa.table(cols)

    def merge(g: pd.DataFrame) -> pa.Table:
        pr = g[g[_SIDE] == 0]
        sn = g[g[_SIDE] == 1]
        if len(sn) == 0 and len(pr) == 0:
            return to_output(pd.DataFrame(
                {c: pd.Series(dtype=probe_dtypes.get(c, g[c].dtype))
                 for c in out_cols}))
        return to_output(local_asof_merge(
            pr, sn, key, probe_ts, snap_ts, value_cols, probe_cols,
            tolerance=tolerance, direction=direction))

    return partition_map(both, [key], merge, num_partitions)


def local_asof_merge(pr: pd.DataFrame, sn: pd.DataFrame, key: str,
                     probe_ts: str, snap_ts: str,
                     value_cols: list[str],
                     probe_cols: list[str],
                     tolerance: pd.Timedelta | None = None,
                     direction: str = "backward") -> pd.DataFrame:
    """Single-partition backward as-of merge. The snapshot side can be
    very wide (e.g. the 80+-column feature table): sorting/merging the
    full frame would copy every column for every snapshot row, so the
    C merge runs on a NARROW (key, ts, row-index) frame and the wide
    value columns are gathered once, only for the matched rows."""
    out_cols = probe_cols + [snap_ts] + value_cols
    pr = pr.sort_values([probe_ts, key], kind="mergesort")
    if len(sn) == 0:
        out = pr[probe_cols].reset_index(drop=True)
        out[snap_ts] = pd.Series(pd.NaT, index=out.index,
                                 dtype=pr[probe_ts].dtype) \
            if np.issubdtype(pr[probe_ts].dtype, np.datetime64) \
            else np.nan
        for c in value_cols:
            out[c] = np.nan
        return out[out_cols]
    sn = sn.reset_index(drop=True)
    sn_keys = sn[[key, snap_ts]].copy()
    sn_keys["__i"] = np.arange(len(sn), dtype=np.int64)
    sn_keys = sn_keys.sort_values([snap_ts, key], kind="mergesort")
    merged = pd.merge_asof(
        pr[probe_cols], sn_keys,
        left_on=probe_ts, right_on=snap_ts, by=key,
        direction=direction, allow_exact_matches=True,
        tolerance=tolerance)
    vals = sn[value_cols].reindex(merged["__i"].to_numpy()) \
        .reset_index(drop=True)
    out = pd.concat(
        [merged[probe_cols + [snap_ts]].reset_index(drop=True),
         vals], axis=1)
    return out[out_cols]
