"""Hierarchical spatial cell index: S2-style integer quadtree math behind an
H3-shaped API.

The reference engine discretizes space with a GDAL FID raster
(``/root/reference/runner.py:530-540``); this engine discretizes with a
hierarchical cell id instead (north_rule: "H3 cells (with S2 fallback)").
Neither h3 nor s2 libraries exist in this environment, so the cell math is
implemented from scratch: an equirectangular quadtree over
lon ∈ [-180, 180), lat ∈ [-90, 90) with Z-order (Morton) curve ids —
exact integer parent/child arithmetic, no floating-point drift across
workers.  The API surface mirrors h3-py (``latlng_to_cell``,
``cell_to_parent``, ``cell_to_children``, ``get_resolution``, …) so a future
true-H3 backend can slot in unchanged.

Cell id layout (uint64):
    bits 58..62 : resolution r (0..29)
    bits 0..2r-1: Z-order interleave of (x, y), x in even bits, y in odd bits
All functions are vectorized over NumPy arrays and accept scalars.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29
_RES_SHIFT = np.uint64(58)
_RES_MASK = np.uint64(0x1F) << _RES_SHIFT
_Z_MASK = ~_RES_MASK

_U1 = np.uint64(1)
_U2 = np.uint64(2)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into the even bit positions."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread_bits` (keep even bits, pack to low 32)."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def _interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return _spread_bits(x) | (_spread_bits(y) << _U1)


def _deinterleave(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return _compact_bits(z), _compact_bits(z >> _U1)


def _check_res(res: int) -> int:
    res = int(res)
    if not (0 <= res <= MAX_RES):
        raise ValueError(f"resolution must be in [0, {MAX_RES}], got {res}")
    return res


def xy_to_cell(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Encode integer grid coords at ``res`` (0 <= x, y < 2**res) to cell ids."""
    res = _check_res(res)
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    return (np.uint64(res) << _RES_SHIFT) | _interleave(x, y)


def latlng_to_cell(lat, lng, res: int) -> np.ndarray:
    """Vectorized lat/lng (degrees) → cell id at ``res``.

    Points on the anti-meridian / poles clamp into the last row/column so
    every finite coordinate maps to exactly one cell.
    """
    res = _check_res(res)
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = float(1 << res)
    x = np.floor((lng + 180.0) / 360.0 * n)
    y = np.floor((lat + 90.0) / 180.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.uint64)
    y = np.clip(y, 0, n - 1).astype(np.uint64)
    return xy_to_cell(x, y, res)


def get_resolution(cell) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    return ((cell & _RES_MASK) >> _RES_SHIFT).astype(np.int8)


def cell_to_xy(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell → (x, y, res) integer grid coords at the cell's own resolution."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = get_resolution(cell)
    x, y = _deinterleave(cell & _Z_MASK)
    return x, y, res


def cell_to_parent(cell, parent_res: int) -> np.ndarray:
    """Ancestor of each cell at ``parent_res`` (must be <= the cell's res)."""
    parent_res = _check_res(parent_res)
    cell = np.asarray(cell, dtype=np.uint64)
    res = get_resolution(cell).astype(np.int64)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell resolution")
    shift = (np.uint64(2) * (res - parent_res).astype(np.uint64))
    z = (cell & _Z_MASK) >> shift
    return (np.uint64(parent_res) << _RES_SHIFT) | z


def cell_to_children(cell) -> np.ndarray:
    """The 4 direct children of each cell; output shape = cell.shape + (4,)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = get_resolution(cell).astype(np.int64)
    if np.any(res >= MAX_RES):
        raise ValueError("cell already at MAX_RES")
    z = (cell & _Z_MASK) << _U2
    base = ((res + 1).astype(np.uint64) << _RES_SHIFT) | z
    return base[..., None] | np.arange(4, dtype=np.uint64)


def cell_to_latlng(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell center as (lat, lng) degrees."""
    x, y, res = cell_to_xy(cell)
    n = (np.uint64(1) << res.astype(np.uint64)).astype(np.float64)
    lng = (x.astype(np.float64) + 0.5) / n * 360.0 - 180.0
    lat = (y.astype(np.float64) + 0.5) / n * 180.0 - 90.0
    return lat, lng


def cell_to_bbox(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Cell bounds as (lng_min, lat_min, lng_max, lat_max) degrees."""
    x, y, res = cell_to_xy(cell)
    n = (np.uint64(1) << res.astype(np.uint64)).astype(np.float64)
    xf = x.astype(np.float64)
    yf = y.astype(np.float64)
    return (
        xf / n * 360.0 - 180.0,
        yf / n * 180.0 - 90.0,
        (xf + 1.0) / n * 360.0 - 180.0,
        (yf + 1.0) / n * 180.0 - 90.0,
    )
