"""Distributed Q4 fallback (many occluded zones) must match the golden
oracle exactly — same path the serial driver fallback covers, but computed
in one distributed tile sweep."""

import numpy as np
import pytest

from zonal_stats_toolkit_ray.geom.window import GridSpec
from zonal_stats_toolkit_ray.pipelines.zonal import zonal_stats_raster
from zonal_stats_toolkit_ray.sources.raster import dense_array, synth_tiles_table
from zonal_stats_toolkit_ray.sources.zones import ZoneSet, zones_table

from golden_oracle import oracle_zonal_statistics

GRID = GridSpec(
    x0=-180.0, y0=90.0, dx=1.875, dy=-1.875, width=192, height=96,
    nodata=-9999.0, tile_size=64,
)


def _overlapping_zones(n=64, seed=7):
    rng = np.random.default_rng(seed)
    fids, parts, groups, rings = [], [], [], []
    for i in range(n):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        r = rng.uniform(15, 40)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 16))
        rad = rng.uniform(0.6 * r, r, 16)
        fids.append(i)
        parts.append(0)
        groups.append(f"g{i % 6}")
        rings.append(
            (
                np.clip(cx + rad * np.cos(ang), -180, 180),
                np.clip(cy + rad * np.sin(ang), -90, 90),
            )
        )
    return zones_table(fids, parts, groups, rings)


def test_distributed_fallback_matches_oracle(ray_session):
    import ray.data as rd

    zt = _overlapping_zones()
    zs = ZoneSet(zt)
    tiles = rd.from_arrow(synth_tiles_table(GRID, seed=3)).repartition(6)
    got = zonal_stats_raster(tiles, GRID, zs)  # no percentiles → distributed path
    # sanity: this workload actually exercises the fallback heavily
    arr = dense_array(GRID, seed=3)
    want = oracle_zonal_statistics(arr, GRID, zt, None)
    assert set(got) == set(want)
    for g in want:
        for k, wv in want[g].items():
            gv = got[g][k]
            if wv is None:
                assert gv is None, (g, k)
            elif k in ("count", "nodata_count", "valid_count"):
                assert int(gv) == int(wv), (g, k, gv, wv)
            else:
                assert np.isclose(float(gv), float(wv), rtol=1e-6), (g, k, gv, wv)


def test_distributed_fallback_percentiles_match_oracle(ray_session):
    """Percentile mode with a large fallback set: the distributed values
    sweep must reproduce the oracle's per-part value bags exactly."""
    import ray.data as rd

    zt = _overlapping_zones(n=48, seed=21)
    zs = ZoneSet(zt)
    tiles = rd.from_arrow(synth_tiles_table(GRID, seed=9)).repartition(5)
    got = zonal_stats_raster(tiles, GRID, zs, percentiles=[5.0, 50.0, 95.0])
    want = oracle_zonal_statistics(
        dense_array(GRID, seed=9), GRID, zt, [5.0, 50.0, 95.0]
    )
    assert set(got) == set(want)
    for g in want:
        for k in ("p5", "p50", "p95", "sum", "count"):
            wv, gv = want[g][k], got[g][k]
            if wv is None:
                assert gv is None, (g, k)
            else:
                assert np.isclose(float(gv), float(wv), rtol=1e-6), (g, k, gv, wv)


def test_fallback_paths_agree(ray_session):
    """Driver path (forced via percentile mode) and distributed path agree
    on the shared stats fields."""
    import ray.data as rd

    zt = _overlapping_zones(n=40, seed=11)
    zs = ZoneSet(zt)
    tiles = rd.from_arrow(synth_tiles_table(GRID, seed=5)).repartition(4)
    dist = zonal_stats_raster(tiles, GRID, zs)
    drv = zonal_stats_raster(tiles, GRID, zs, percentiles=[50.0])
    for g in dist:
        for k in ("min", "max", "count", "nodata_count", "valid_count", "sum", "stdev"):
            a, b = dist[g][k], drv[g][k]
            if a is None or b is None:
                assert a is b, (g, k, a, b)
            else:
                assert np.isclose(float(a), float(b), rtol=1e-9), (g, k, a, b)


def test_window_stats_tree_merge_matches_flat(ray_session):
    """Round-3 (VERDICT #4): with tree_threshold=0 the Q4 fallback merge
    runs through the partials reduction tree instead of one driver groupby
    over every (window, tile) row — results must be identical, and a ~10³
    window sweep completes without a driver blowup."""
    import ray.data as rd

    from zonal_stats_toolkit_ray.pipelines.zonal import _window_stats_distributed

    rng = np.random.default_rng(3)
    n_win = 1000
    specs = []
    for i in range(n_win):
        xoff = int(rng.integers(0, GRID.width - 4))
        yoff = int(rng.integers(0, GRID.height - 4))
        specs.append((i, xoff, yoff, int(rng.integers(1, 5)), int(rng.integers(1, 5))))
    tiles = rd.from_arrow(synth_tiles_table(GRID, seed=13)).repartition(6)

    flat = _window_stats_distributed(tiles, GRID, specs)
    tree = _window_stats_distributed(tiles, GRID, specs, tree_threshold=0)
    assert set(flat) == set(tree) == set(range(n_win))
    for w in flat:
        for k in ("count", "nodata_count", "sum", "sumsq", "min", "max"):
            a, b = flat[w][k], tree[w][k]
            assert np.isclose(float(a), float(b), rtol=1e-12), (w, k, a, b)

    # spot-check a handful of windows against the dense array
    arr = dense_array(GRID, seed=13)
    for w in (0, 17, 555, 999):
        _, xoff, yoff, wx, wy = specs[w]
        block = arr[yoff : yoff + wy, xoff : xoff + wx]
        nd = np.isclose(block, GRID.nodata)
        valid = block[~nd]
        assert flat[w]["count"] == block.size
        assert flat[w]["nodata_count"] == int(nd.sum())
        if valid.size:
            assert np.isclose(flat[w]["sum"], float(valid.sum(dtype=np.float64)))
