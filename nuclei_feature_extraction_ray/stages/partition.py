"""Hash partitioning with skew salting — the explicit layout layer.

Design (SURVEY.md §3.4 / §4): pick ONE partition key (``hash(entity) %
P``), attach it once, and reuse it for every wide step (dedup, window
apply, as-of join) so the job pays a single logical shuffle key. An
entity (url / user) never spans partitions, which is the invariant all
partition-local window state relies on.

Skew: a hot entity (e.g. a crawl-heavy domain) makes one partition huge.
``salted_partition`` splits any entity whose per-batch row count exceeds
a threshold into sub-partitions by a secondary column (e.g. time bucket)
— safe only for operators that are entity×time-local with bounded
window, in which case the caller must add window-sized overlap. The
flagship pipeline keeps url-grain partitioning (urls are fine-grained
enough that P balances); salting is exposed for domain-grain use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64

PART_COL = "__part"


def _part_values(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    if keys.dtype.kind in "iu":
        # Fibonacci hashing: spreads sequential int keys uniformly.
        h = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        return (h % np.uint64(num_partitions)).astype(np.int64)
    return (hash64(keys) % np.uint64(num_partitions)).astype(np.int64)


def with_partition(ds, key_col: str, num_partitions: int,
                   part_col: str = PART_COL):
    """Attach ``part_col = hash(key) % P`` via a vectorized map_batches."""

    def add(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        part = _part_values(keys, num_partitions)
        return batch.append_column(part_col, pa.array(part))

    return ds.map_batches(add, batch_format="pyarrow")


def salted_partition(ds, key_col: str, num_partitions: int,
                     salt_col: str, salt_buckets: int,
                     hot_keys: set, part_col: str = PART_COL):
    """Partition id with hot keys split across ``salt_buckets``
    sub-partitions by a secondary column. ``hot_keys`` is the
    (small, broadcast) set of keys detected as hot — pass the result of
    a cheap pre-aggregation. Non-hot keys hash as usual."""
    import ray
    hot_ref = ray.put(frozenset(hot_keys))

    class AddSalted:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch[key_col].to_numpy(zero_copy_only=False)
            part = _part_values(keys, num_partitions)
            if self.hot:
                mask = np.asarray([k in self.hot for k in keys])
                if mask.any():
                    salt = batch[salt_col].to_numpy(zero_copy_only=False)
                    sub = _part_values(salt[mask], salt_buckets)
                    part[mask] = (num_partitions
                                  + part[mask] * salt_buckets + sub)
            return batch.append_column(part_col, pa.array(part))

    return ds.map_batches(AddSalted, batch_format="pyarrow", concurrency=2)


def partitioned_apply(ds, key_col: str, fn, num_partitions: int,
                      sort_cols: list[str] | None = None,
                      part_col: str = PART_COL, **map_groups_kwargs):
    """THE wide primitive: hash-partition by entity key, then run ``fn``
    once per partition over the partition's full pandas frame, sorted by
    ``sort_cols``.

    Each "group" handed to Ray's ``groupby().map_groups`` is a whole
    hash partition containing MANY entities, so there are only P Python
    calls and ``fn`` can vectorize across entities (pandas groupby is C).
    This is how the graft realizes "range-partition by url-hash +
    per-partition sort" (north_rule) on Ray Data: the groupby is the one
    all-to-all shuffle; everything downstream is partition-local.
    """
    ds = with_partition(ds, key_col, num_partitions, part_col)

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        if sort_cols:
            g = g.sort_values(sort_cols, kind="mergesort")
        out = fn(g)
        if part_col in out.columns:
            out = out.drop(columns=[part_col])
        return out

    return ds.groupby(part_col).map_groups(
        apply, batch_format="pandas", **map_groups_kwargs)
