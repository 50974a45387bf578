"""Small runtime utilities."""

from __future__ import annotations

import ray


def pool_size(frac: float = 0.5, cap: int = 16, floor: int = 1) -> int:
    """Actor-pool concurrency that leaves CPU headroom for the read /
    write / shuffle stages of the same pipeline. An actor pool sized to
    the whole cluster starves the other operators and can deadlock the
    streaming executor (observed: pool=4 on a 4-CPU local cluster).
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(floor, min(cap, int(cpus * frac)))
