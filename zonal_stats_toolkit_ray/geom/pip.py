"""Vectorized point-in-polygon (ray casting) in pure NumPy.

Replaces the reference's ``gdal.RasterizeLayer(..., ALL_TOUCHED=FALSE)``
attribute burn (``/root/reference/runner.py:463-469, 599-606``): a pixel
belongs to a polygon iff its *center* is inside — i.e. exactly a
point-in-polygon test on cell/pixel centers, which is what this module
provides.  Even-odd crossing rule; conformance fixtures avoid
center-on-edge ambiguity (SURVEY.md Q5/Q6) so boundary tie-breaks are moot.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(
    px: np.ndarray,
    py: np.ndarray,
    ring_x: np.ndarray,
    ring_y: np.ndarray,
) -> np.ndarray:
    """Even-odd crossing test of N points against one ring.

    ``ring_x/ring_y`` are the ring vertices (closing vertex optional).
    Vectorized over points; loops only over the (few) ring edges.
    Returns a boolean mask of length N.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    if rx.size >= 2 and rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    n = rx.size
    inside = np.zeros(px.shape, dtype=bool)
    if n < 3:
        return inside
    x1, y1 = rx[-1], ry[-1]
    for i in range(n):
        x2, y2 = rx[i], ry[i]
        if y1 != y2:
            crosses = (y1 > py) != (y2 > py)
            if np.any(crosses):
                # x coordinate where the edge crosses the horizontal ray
                xcross = (x2 - x1) * (py[crosses] - y1) / (y2 - y1) + x1
                hit = px[crosses] < xcross
                inside[crosses] ^= hit
        x1, y1 = x2, y2
    return inside


def ring_bbox(ring_x, ring_y) -> tuple[float, float, float, float]:
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    return float(rx.min()), float(ry.min()), float(rx.max()), float(ry.max())


def ring_contains_bbox(
    ring_x, ring_y, minx: float, miny: float, maxx: float, maxy: float
) -> bool:
    """True iff the axis-aligned box is entirely inside the ring.

    Conservative test for *convex* rings: all four corners inside.  Used by
    the interior-cell shortcut in the spatial joiner (a cell whose bbox is
    fully inside exactly one zone needs no per-point PIP).
    """
    cx = np.array([minx, maxx, maxx, minx])
    cy = np.array([miny, miny, maxy, maxy])
    return bool(points_in_ring(cx, cy, ring_x, ring_y).all())
