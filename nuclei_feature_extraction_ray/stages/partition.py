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

class _ThreadLocalSizeHint:
    """Per-THREAD list of input sizes: the hint is driver-side build
    state, so two queries building concurrently on different threads
    must not cross-clamp each other's exchanges. List-like surface
    (append/extend/clear/iter/bool/eq) so call sites read naturally."""

    def __init__(self):
        import threading
        self._tl = threading.local()

    def _lst(self) -> list:
        lst = getattr(self._tl, "lst", None)
        if lst is None:
            lst = self._tl.lst = []
        return lst

    def append(self, v) -> None:
        self._lst().append(v)

    def extend(self, vs) -> None:
        self._lst().extend(vs)

    def clear(self) -> None:
        self._lst().clear()

    def __iter__(self):
        return iter(self._lst())

    def __len__(self) -> int:
        return len(self._lst())

    def __bool__(self) -> bool:
        return bool(self._lst())

    def __eq__(self, other) -> bool:
        return self._lst() == other


#: Per-query input-size hint (bytes of the parquet inputs the current
#: registered query reads), appended by the read-path helpers in
#: pipelines.queries and cleared by the query registry wrapper before
#: each build. When present, ``partition_map`` clamps its exchange
#: width to ~one partition per _PART_TARGET_BYTES of input (floor
#: ``_PART_FLOOR`` = 8, cap = the caller's scale-design width):
#: hash-shuffle aggregator fixed costs dominate tiny exchanges, and
#: partition_map results are partition-count-invariant by design
#: (asserted by the scale-invariance tests), so the clamp changes
#: physical width only. Ordering assumption: a query build reads
#: (and hints) all its inputs BEFORE the partition_map call — a
#: table first read after the exchange is built does not widen it.
#: Thread-local so concurrent query builders can't cross-clamp.
INPUT_SIZE_HINT = _ThreadLocalSizeHint()

_PART_TARGET_BYTES = 4 << 20

#: Never clamp below this width: exchanged rows can vastly outnumber
#: input bytes (gram explosion) and the per-partition fn wants CPU
#: parallelism even on tiny inputs — only genuinely WIDE exchanges
#: (16/32+) shrink, and only when the input doesn't justify them.
_PART_FLOOR = 8


def clamped_parts(num_partitions: int) -> int:
    """Clamp an exchange width to the current query's input size; the
    caller's value is the cap (what a full-scale run would use)."""
    if not INPUT_SIZE_HINT:
        return num_partitions
    fit = sum(INPUT_SIZE_HINT) // _PART_TARGET_BYTES + 1
    return min(num_partitions, max(_PART_FLOOR, fit))


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


def _sync_ds_context(ds, global_ctx):
    """Every Dataset snapshots its DataContext at creation, so a caller
    may hold one built before our context setup ran — patch the captured
    context to match the process-global one."""
    try:
        ds_ctx = ds.context
    except AttributeError:
        return
    for attr in ("shuffle_strategy", "max_hash_shuffle_aggregators",
                 "hash_shuffle_operator_actor_num_cpus_per_partition_override",
                 "hash_aggregate_operator_actor_num_cpus_per_partition_"
                 "override"):
        if hasattr(global_ctx, attr):
            setattr(ds_ctx, attr, getattr(global_ctx, attr))


def keyed_repartition(ds, keys: list[str], num_partitions: int):
    """Hash-exchange so all rows sharing ``keys`` land in ONE block.
    Requires hash-shuffle mode (see util.configure_context)."""
    from ..util import configure_context
    _sync_ds_context(ds, configure_context())
    return ds.repartition(num_blocks=num_partitions, keys=keys,
                          sort=False)


def partition_map(ds, keys: list[str], fn, num_partitions: int,
                  sort_cols: list[str] | None = None,
                  drop_part_col: bool = True,
                  arrow_pre_fn=None):
    """Co-locate all rows sharing ``keys`` and run ``fn`` once per
    partition over a pandas frame of MANY whole key-groups.

    Two physical plans, same semantics:
    * hash-shuffle (>= 8 CPUs): ``repartition(keys=...)`` + one
      ``map_batches`` call per block — the fast path;
    * sort-shuffle fallback (tiny clusters, where the hash operator's
      aggregator actors would starve the pipeline): derive a coarse
      ``hash(keys) % P`` column and ``groupby(part).map_groups`` — P
      Python calls, never one per fine key value.

    ``arrow_pre_fn``: optional row-local pyarrow transform applied
    around the exchange (after it on the hash path, before it on the
    fallback) — used to unpack columns that were packed to keep the
    exchange narrow (the hash shuffle pays per column per partition
    per block).
    """
    from ray.data.context import ShuffleStrategy

    from ..util import configure_context
    global_ctx = configure_context()
    _sync_ds_context(ds, global_ctx)
    num_partitions = clamped_parts(num_partitions)

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        if drop_part_col and PART_COL in g.columns and \
                PART_COL not in keys:
            g = g.drop(columns=[PART_COL])
        if sort_cols:
            g = g.sort_values(sort_cols, kind="mergesort")
        return fn(g)

    if global_ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE:
        ds = ds.repartition(num_blocks=num_partitions, keys=keys,
                            sort=False)
        if arrow_pre_fn is not None:
            ds = ds.map_batches(arrow_pre_fn, batch_format="pyarrow",
                                batch_size=None)
        return ds.map_batches(apply, batch_format="pandas",
                              batch_size=None)
    if arrow_pre_fn is not None:
        ds = ds.map_batches(arrow_pre_fn, batch_format="pyarrow")

    # sort-shuffle fallback: coarse partition column (P groups -> P
    # Python calls; never one per fine key value)
    if keys == [PART_COL]:
        return ds.groupby(PART_COL).map_groups(
            apply, batch_format="pandas")

    def add(batch: pa.Table) -> pa.Table:
        h = None
        with np.errstate(over="ignore"):
            for k in keys:
                kv = batch[k].to_numpy(zero_copy_only=False)
                hk = (kv.astype(np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15)
                      if kv.dtype.kind in "iu" else hash64(kv))
                h = hk if h is None else h * np.uint64(1000003) + hk
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column(PART_COL, pa.array(part))

    ds = ds.map_batches(add, batch_format="pyarrow")
    return ds.groupby(PART_COL).map_groups(apply, batch_format="pandas")


def partitioned_apply(ds, key_col: str, fn, num_partitions: int,
                      sort_cols: list[str] | None = None):
    """THE wide primitive: hash-partition by entity key, then run ``fn``
    once per PARTITION (not per entity) over the partition's full pandas
    frame, sorted by ``sort_cols`` — many whole entities per call, so
    ``fn`` vectorizes across them (pandas groupby is C).

    This realizes "range-partition by url-hash + per-partition sort"
    (north_rule) on Ray Data: the exchange in ``partition_map`` is the
    one all-to-all shuffle; everything downstream is partition-local.
    """
    return partition_map(ds, [key_col], fn, num_partitions,
                         sort_cols=sort_cols)
