"""Per-stage resource sizing helpers.

An actor pool that reserves EVERY CPU starves the read / shuffle / write
operators of the same streaming execution and the pipeline deadlocks
(observed: a 4-actor pool on a 4-CPU session stalls the partials→groupby
plan forever).  Default pool size therefore leaves headroom for the
stateless operators.
"""

from __future__ import annotations


def prefault(mb: int = 64) -> None:
    """Pre-fault worker heap pages.

    This sandbox kernel zero-fills fresh pages at ~75 MB/s, so the FIRST
    large NumPy allocation in a new worker/actor process costs seconds.
    Touching (and freeing) a scratch buffer once in ``__init__`` moves that
    cost out of the first data batch; combined with high malloc trim/mmap
    thresholds (set in bench.py) the faulted pages stay in the arena and
    every later allocation reuses them."""
    import numpy as np

    scratch = np.empty(mb * 1024 * 1024 // 8, dtype=np.int64)
    scratch[:: 512] = 1  # touch every page
    del scratch


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


def warm_lazy_imports() -> None:
    """Pre-resolve imports Ray's read path probes lazily, so concurrent
    driver threads can't race a repeatedly-failing import.

    Ray probes ``from fsspec.implementations.http import HTTPFileSystem``
    on every dataset creation and catches only ModuleNotFoundError; when
    aiohttp is absent the failed import is never cached (failed imports
    are removed from sys.modules), and a second thread can observe the
    half-initialized module — a plain ImportError Ray does not catch.
    Installing a minimal stub caches the outcome once; the stub class is
    only ever an isinstance target (False for real filesystems)."""
    try:  # pragma: no cover - depends on installed extras
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class _StubHTTPFileSystem:  # never constructed; type-check target only
            pass

        mod.HTTPFileSystem = _StubHTTPFileSystem
        sys.modules.setdefault("fsspec.implementations.http", mod)
    except Exception:
        pass
