"""Small runtime utilities (no ray.init anywhere)."""

from __future__ import annotations

import ray


def _cpus(default: int = 8) -> int:
    if not ray.is_initialized():
        return default
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def pool_size(frac: float = 0.5, cap: int = 16, floor: int = 1) -> int:
    """Actor-pool concurrency that leaves CPU headroom for the read /
    write / shuffle stages of the same pipeline. An actor pool sized to
    the whole cluster starves the other operators and can deadlock the
    streaming executor (observed: pool=4 on a 4-CPU local cluster).
    """
    return max(floor, min(cap, int(_cpus() * frac)))


def configure_context():
    """Engine-wide Ray Data settings: hash-based shuffle (required for
    key-based repartition; measured ~1.6x faster than the sort shuffle
    for our partition exchanges) with a bounded aggregator-actor pool —
    the default pool (one actor per partition) costs ~45 s of actor
    startup on first use in a fresh session.

    Idempotent; called by the wide stages. Never calls ray.init.
    """
    import os

    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy
    ctx = DataContext.get_current()
    cpus = _cpus()
    # Read parallelism floor: one read task per core, not Ray's default
    # 200-block floor — a 2 MB dimension table shredded into 64+
    # 78-row blocks pays the exchange's per-block fixed costs ~8x for
    # nothing (measured: dedup_normalized 6.9 -> ~2.3 s cold, headline
    # min 10.4 -> 8.8 s). At real scale the floor is irrelevant: block
    # count is bytes / target_max_block_size. Override with
    # NFX_READ_MIN_BLOCKS for read-bound jobs that want more waves.
    ctx.read_op_min_num_blocks = int(os.environ.get(
        "NFX_READ_MIN_BLOCKS", str(max(8, cpus))))
    min_hash = int(os.environ.get("NFX_HASH_SHUFFLE_MIN_CPUS", "8"))
    if cpus >= min_hash:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ctx.max_hash_shuffle_aggregators = max(2, min(16, cpus // 2))
        # Aggregator actors must not reserve whole CPUs, or they starve
        # the map/actor-pool stages of the same pipeline on small
        # clusters (observed deadlock at 4 CPUs).
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = \
            0.05
    else:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    return ctx
