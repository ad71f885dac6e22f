"""Douglas-Peucker ring simplification (reference M2/Q6 parity)."""

import numpy as np

from zonal_stats_toolkit_ray.geom.pip import points_in_ring
from zonal_stats_toolkit_ray.geom.simplify import simplify_ring, simplify_zones_table
from zonal_stats_toolkit_ray.sources.zones import synth_zones


def test_collinear_points_removed():
    # square with redundant midpoints on each edge
    rx = np.array([0.0, 5.0, 10.0, 10.0, 10.0, 5.0, 0.0, 0.0])
    ry = np.array([0.0, 0.0, 0.0, 5.0, 10.0, 10.0, 10.0, 5.0])
    sx, sy = simplify_ring(rx, ry, 0.01)
    assert sx.size == 4
    assert set(zip(sx.tolist(), sy.tolist())) == {
        (0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0),
    }


def test_zero_tolerance_noop():
    rng = np.random.default_rng(2)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
    rx, ry = 5 * np.cos(ang), 5 * np.sin(ang)
    sx, sy = simplify_ring(rx, ry, 0.0)
    assert sx.size == 12


def test_containment_mostly_preserved():
    rng = np.random.default_rng(3)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 64))
    rx, ry = 10 * np.cos(ang), 10 * np.sin(ang)
    sx, sy = simplify_ring(rx, ry, 0.05)
    assert 3 <= sx.size < 64
    px = rng.uniform(-11, 11, 3000)
    py = rng.uniform(-11, 11, 3000)
    a = points_in_ring(px, py, rx, ry)
    b = points_in_ring(px, py, sx, sy)
    # tolerance 0.05 on a radius-10 circle: <2% of samples may flip
    assert (a != b).mean() < 0.02


def test_simplify_zones_table_shapes():
    zt = synth_zones(seed=42, n_zones=8)
    st = simplify_zones_table(zt, 0.5)
    assert st.num_rows == zt.num_rows
    assert st["zone_fid"].to_pylist() == zt["zone_fid"].to_pylist()
    for r0, r1 in zip(zt["ring_x"].to_pylist(), st["ring_x"].to_pylist()):
        assert len(r1) <= len(r0) + 1
