"""Per-partition checkpoint manifest with lineage + metrics.

The reference gets resume-for-free from ecoshard taskgraph's on-disk memo
DB (``/root/reference/runner.py:1093-1098``: a task is skipped when its
target files exist and its argument hash matches).  Ray gives task-level
*retry* but not job-level *resume*, so this module implements it
explicitly (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"):

* output layout: ``out_dir/part=<partition_id>/`` (one directory per input
  shard / key range — a failed run reruns only missing partitions)
* ``manifest.jsonl``: one record per completed partition with
  ``partition_id``, ``fingerprint`` (hash of input spec + code version —
  stale checkpoints never poison a rerun), row count, wall seconds, and
  arbitrary stage metrics
* writes are atomic: partition output goes to ``<dir>.tmp`` then a rename;
  the manifest line is appended only after the rename.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Callable

from .. import __version__


def fingerprint(spec: Any, code_version: str = __version__) -> str:
    """Stable lineage hash of a partition's input spec + engine version."""
    payload = json.dumps({"spec": spec, "code": code_version}, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class CheckpointManifest:
    def __init__(self, out_dir: str | Path):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.out_dir / "manifest.jsonl"

    def load(self) -> dict[str, dict]:
        done: dict[str, dict] = {}
        if self.path.exists():
            with self.path.open() as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    done[rec["partition_id"]] = rec
        return done

    def is_done(self, partition_id: str, fp: str) -> bool:
        rec = self.load().get(partition_id)
        if rec is None or rec.get("fingerprint") != fp:
            return False
        out = rec.get("out_path")
        return out is None or Path(out).exists()

    def record(self, rec: dict) -> None:
        with self.path.open("a") as f:
            f.write(json.dumps(rec, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def partition_dir(self, partition_id: str) -> Path:
        return self.out_dir / f"part={partition_id}"


def run_partitioned(
    partitions: list[tuple[str, Any]],
    run_fn: Callable[[Any, str], dict],
    out_dir: str | Path,
    *,
    code_version: str = __version__,
    max_concurrent: int = 1,
) -> dict:
    """Run ``run_fn(spec, tmp_output_dir)`` for every partition not already
    complete in the manifest.  ``run_fn`` must write its partition output
    under the given directory (e.g. ``ds.write_parquet(tmp_dir)``) and
    return a metrics dict (at least ``rows``).

    ``max_concurrent > 1`` runs that many partitions at once (driver
    threads, each driving its own Ray pipeline); the atomic
    tmp-dir→rename publish is already per-partition, and manifest appends
    serialize through a lock, so a kill mid-run still resumes exactly:
    only manifest-recorded partitions skip.

    Returns {"completed": [...], "skipped": [...], "manifest": path};
    ``completed`` preserves submission order.
    """
    import threading

    man = CheckpointManifest(out_dir)
    completed, skipped, todo = [], [], []
    for pid, spec in partitions:
        fp = fingerprint(spec, code_version)
        if man.is_done(pid, fp):
            skipped.append(pid)
        else:
            todo.append((pid, spec, fp))

    record_lock = threading.Lock()

    def run_one(pid: str, spec: Any, fp: str) -> None:
        part_dir = man.partition_dir(pid)
        tmp_dir = Path(str(part_dir) + ".tmp")
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)
        if part_dir.exists():  # stale output from a different fingerprint
            shutil.rmtree(part_dir)
        tmp_dir.mkdir(parents=True)
        t0 = time.perf_counter()
        metrics = run_fn(spec, str(tmp_dir))
        wall = time.perf_counter() - t0
        os.replace(tmp_dir, part_dir)  # atomic publish
        with record_lock:
            man.record(
                {
                    "partition_id": pid,
                    "fingerprint": fp,
                    "out_path": str(part_dir),
                    "wall_s": round(wall, 4),
                    **(metrics or {}),
                }
            )

    if max_concurrent <= 1 or len(todo) <= 1:
        for pid, spec, fp in todo:
            run_one(pid, spec, fp)
            completed.append(pid)
    else:
        from concurrent.futures import ThreadPoolExecutor

        from .resources import warm_lazy_imports

        warm_lazy_imports()
        with ThreadPoolExecutor(max_workers=max_concurrent) as ex:
            futs = [(pid, ex.submit(run_one, pid, spec, fp)) for pid, spec, fp in todo]
            for pid, f in futs:
                f.result()
                completed.append(pid)
    return {"completed": completed, "skipped": skipped, "manifest": str(man.path)}
