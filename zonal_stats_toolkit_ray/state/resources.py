"""Per-stage resource sizing helpers.

An actor pool that reserves EVERY CPU starves the read / shuffle / write
operators of the same streaming execution and the pipeline deadlocks
(observed: a 4-actor pool on a 4-CPU session stalls the partials→groupby
plan forever).  Default pool size therefore leaves headroom for the
stateless operators.
"""

from __future__ import annotations


def default_pool_size(reserve: int = 2, cap: int | None = None) -> int:
    """Actor-pool concurrency: cluster CPUs minus ``reserve``, at least 1."""
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 4))
        else:
            import os

            ncpu = os.cpu_count() or 4
    except ImportError:
        import os

        ncpu = os.cpu_count() or 4
    n = max(1, ncpu - reserve)
    if cap is not None:
        n = min(n, cap)
    return n
