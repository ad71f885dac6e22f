"""Resumable pages-zonal job over real data: kill after K partitions →
resume recomputes only the remainder; final stats identical (FIXTURES.md
invariant 6, north_rule resume)."""

import numpy as np
import pandas as pd
import pytest

from zonal_stats_toolkit_ray.pipelines import pages_job
from zonal_stats_toolkit_ray.sources.zones import synth_zones
from zonal_stats_toolkit_ray.state.checkpoint import CheckpointManifest

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_pages_job_resume(ray_session, tmp_path):
    zones = synth_zones(seed=42, n_zones=16)

    # full run in one go → reference result
    full = pages_job.run_pages_job(DOCS, zones, tmp_path / "full", n_partitions=3)
    assert full["report"]["completed"] == ["mod000", "mod001", "mod002"]

    # interrupted run: fail inside partition 2
    orig = pages_job._run_partition
    calls = {"n": 0}

    def failing(spec, out_dir):
        if spec["mod"] == 2 and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("killed mid-run")
        return orig(spec, out_dir)

    pages_job._run_partition = failing
    try:
        with pytest.raises(RuntimeError):
            pages_job.run_pages_job(DOCS, zones, tmp_path / "resume", n_partitions=3)
        # resume: only the failed partition is recomputed
        res = pages_job.run_pages_job(DOCS, zones, tmp_path / "resume", n_partitions=3)
    finally:
        pages_job._run_partition = orig
    assert res["report"]["skipped"] == ["mod000", "mod001"]
    assert res["report"]["completed"] == ["mod002"]

    a = full["stats"].fillna(-1).reset_index(drop=True)
    b = res["stats"].fillna(-1).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # manifest carries lineage + metrics
    man = CheckpointManifest(tmp_path / "resume").load()
    assert set(man) == {"mod000", "mod001", "mod002"}
    for rec in man.values():
        assert rec["rows"] > 0 and rec["wall_s"] > 0 and rec["fingerprint"]

    # partition rows sum to the corpus size
    total = sum(rec["rows"] for rec in man.values())
    import pyarrow.parquet as pq

    assert total == pq.read_metadata(DOCS).num_rows


def test_rerun_with_different_zones_invalidates_checkpoint(ray_session, tmp_path):
    """Regression (round-1 advisor): rerunning into the same out_dir with a
    DIFFERENT zones table must rewrite zones.arrow and re-run every
    partition — the fingerprint now includes the zones content hash, so a
    stale checkpoint can't pair old joins with new finalize zones."""
    out = tmp_path / "job"
    zones_a = synth_zones(seed=42, n_zones=16)
    run_a = pages_job.run_pages_job(DOCS, zones_a, out, n_partitions=2)
    assert run_a["report"]["skipped"] == []

    zones_b = synth_zones(seed=7, n_zones=9)
    run_b = pages_job.run_pages_job(DOCS, zones_b, out, n_partitions=2)
    # nothing may be skipped: all partitions re-run against the new zones
    assert run_b["report"]["skipped"] == []
    assert run_b["report"]["completed"] == ["mod000", "mod001"]

    # the result equals a fresh run with zones_b (no stale-join poisoning)
    fresh = pages_job.run_pages_job(DOCS, zones_b, tmp_path / "fresh", n_partitions=2)
    pd.testing.assert_frame_equal(
        run_b["stats"].fillna(-1).reset_index(drop=True),
        fresh["stats"].fillna(-1).reset_index(drop=True),
    )

    # idempotent rerun with the SAME zones skips everything
    run_b2 = pages_job.run_pages_job(DOCS, zones_b, out, n_partitions=2)
    assert run_b2["report"]["completed"] == []
    assert run_b2["report"]["skipped"] == ["mod000", "mod001"]


def test_rerun_with_fewer_partitions_ignores_orphan_parts(ray_session, tmp_path):
    """Round-3 (advisor): rerunning into the same out_dir with a SMALLER
    n_partitions leaves orphan part=modXXX dirs from the old partitioning;
    the final reduce must glob only the CURRENT run's partition ids, not
    silently merge stale partials (double-counting every row)."""
    out = tmp_path / "job"
    zones = synth_zones(seed=42, n_zones=12)
    pages_job.run_pages_job(DOCS, zones, out, n_partitions=3)
    assert (out / "part=mod002").exists()

    rerun = pages_job.run_pages_job(DOCS, zones, out, n_partitions=2)
    # the orphan part=mod002 dir is still on disk…
    assert (out / "part=mod002" / "partials").exists()
    # …but the stats equal a fresh 2-partition run (no double counting)
    fresh = pages_job.run_pages_job(DOCS, zones, tmp_path / "fresh", n_partitions=2)
    pd.testing.assert_frame_equal(
        rerun["stats"].fillna(-1).reset_index(drop=True),
        fresh["stats"].fillna(-1).reset_index(drop=True),
    )


def test_concurrent_partitions_match_serial(ray_session, tmp_path):
    """Round-2: partition_concurrency>1 overlaps partitions (threads);
    results and manifest must match the serial run, and resume semantics
    hold when a partition fails mid-flight."""
    zones = synth_zones(seed=42, n_zones=12)
    serial = pages_job.run_pages_job(DOCS, zones, tmp_path / "s", n_partitions=3)
    conc = pages_job.run_pages_job(
        DOCS, zones, tmp_path / "c", n_partitions=3, partition_concurrency=3
    )
    assert sorted(conc["report"]["completed"]) == ["mod000", "mod001", "mod002"]
    pd.testing.assert_frame_equal(
        serial["stats"].fillna(-1).reset_index(drop=True),
        conc["stats"].fillna(-1).reset_index(drop=True),
    )

    # failure in one partition: the others' manifest entries survive
    orig = pages_job._run_partition

    def failing(spec, out_dir):
        if spec["mod"] == 1:
            raise RuntimeError("killed")
        return orig(spec, out_dir)

    pages_job._run_partition = failing
    try:
        with pytest.raises(RuntimeError):
            pages_job.run_pages_job(
                DOCS, zones, tmp_path / "f", n_partitions=3, partition_concurrency=3
            )
    finally:
        pages_job._run_partition = orig
    res = pages_job.run_pages_job(
        DOCS, zones, tmp_path / "f", n_partitions=3, partition_concurrency=3
    )
    assert "mod001" in res["report"]["completed"]
    assert set(res["report"]["completed"]) | set(res["report"]["skipped"]) == {
        "mod000", "mod001", "mod002",
    }
    pd.testing.assert_frame_equal(
        serial["stats"].fillna(-1).reset_index(drop=True),
        res["stats"].fillna(-1).reset_index(drop=True),
    )
