"""Geometry simplification: Douglas-Peucker on polygon rings.

The reference simplifies the aggregate vector with
``simplifyTolerance = 0.5 × pixel_width`` before rasterizing
(``/root/reference/runner.py:297-298, 349-365`` via gdal.VectorTranslate)
— quirk Q6: simplification changes which pixels fall inside.  The engine
wires the same default through the reference-parity API layer
(``fast_zonal_statistics(simplify_tolerance="auto")`` and ``run_job``
both apply 0.5 × |dx|, round-3); the lower-level ``zonal_stats_raster``
keeps the knob explicit (default off) for callers composing their own
pipelines.  Engine and golden oracle apply this same kernel so outputs
stay row-identical even on simplification-UNstable fixtures.
"""

from __future__ import annotations

import numpy as np


def _dp_mask(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas-Peucker keep-mask for an open polyline."""
    n = x.size
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = x[i], y[i]
        bx, by = x[j], y[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        px = x[i + 1 : j]
        py = y[i + 1 : j]
        if seg2 == 0.0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            t = ((px - ax) * dx + (py - ay) * dy) / seg2
            t = np.clip(t, 0.0, 1.0)
            d2 = (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2
        kmax = int(np.argmax(d2))
        if d2[kmax] > tol2:
            mid = i + 1 + kmax
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return keep


def simplify_ring(
    ring_x: np.ndarray, ring_y: np.ndarray, tolerance: float
) -> tuple[np.ndarray, np.ndarray]:
    """Douglas-Peucker simplify a closed ring (closing vertex optional in,
    absent out).  Degenerate results (<3 vertices) return the original ring."""
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    closed = rx.size >= 2 and rx[0] == rx[-1] and ry[0] == ry[-1]
    if closed:
        rx, ry = rx[:-1], ry[:-1]
    if tolerance <= 0 or rx.size < 4:
        return rx, ry
    # split the ring at its two extreme points so DP anchors are stable
    a = int(np.argmin(rx + ry))
    rx = np.roll(rx, -a)
    ry = np.roll(ry, -a)
    b = int(np.argmax(rx + ry))
    m1 = _dp_mask(rx[: b + 1], ry[: b + 1], tolerance)
    x2 = np.concatenate([rx[b:], rx[:1]])
    y2 = np.concatenate([ry[b:], ry[:1]])
    m2 = _dp_mask(x2, y2, tolerance)
    keep = np.zeros(rx.size, dtype=bool)
    keep[: b + 1] = m1
    keep[b:] |= m2[:-1]
    keep[0] |= m2[-1]
    out_x, out_y = rx[keep], ry[keep]
    if out_x.size < 3:
        return rx, ry
    return out_x, out_y


def simplify_zones_table(zones_table, tolerance: float):
    """Zones table → zones table with simplified rings + refreshed bboxes
    (the engine-side analogue of the reference's VectorTranslate step)."""
    from ..sources.zones import zones_table as make_table

    fids = zones_table["zone_fid"].to_pylist()
    parts = zones_table["part_idx"].to_pylist()
    groups = zones_table["group_value"].to_pylist()
    rings = []
    for rx, ry in zip(
        zones_table["ring_x"].to_pylist(), zones_table["ring_y"].to_pylist()
    ):
        rings.append(
            simplify_ring(np.asarray(rx), np.asarray(ry), tolerance)
        )
    return make_table(fids, parts, groups, rings)
