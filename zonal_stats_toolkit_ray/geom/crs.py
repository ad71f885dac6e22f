"""CRS comparison + vectorized reprojection (reference M1).

The reference normalizes both SRS to traditional GIS axis order, compares
them, and reprojects the vector into the raster SRS only when they differ
(``/root/reference/runner.py:307-341``); a vector with a missing SRS is
"forced" through ``VectorTranslate`` with only ``dstSRS`` set, which
assigns the target SRS without changing coordinates.  This module
reproduces that decision logic over pure-NumPy transforms (no GDAL/proj in
this engine):

* :class:`CRS` — a small descriptor: ``kind`` ∈ {"lonlat", "webmerc",
  "affine"}, an axis order ("xy" = traditional GIS order, "yx" =
  authority lat/lon order), and affine params.  All transforms route
  through the common base frame (EPSG:4326-style lon/lat degrees, xy
  order) using public formulas only (spherical Web-Mercator R=6378137).
* :func:`same_crs` — the ``IsSame`` analogue after axis normalization.
* :func:`transform_points` — vectorized src→dst point transform.
* :func:`reproject_zones_table` — zones-table reprojection: every ring
  coordinate of the batch transforms in one vectorized pass over the
  flattened list buffers; bboxes are recomputed from the new rings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

_R = 6378137.0  # spherical Web-Mercator radius (public constant)


@dataclass(frozen=True)
class CRS:
    kind: str = "lonlat"  # "lonlat" | "webmerc" | "affine"
    axis_order: str = "xy"  # "xy" (traditional GIS) or "yx" (authority)
    # affine params (used when kind == "affine"): base→this is
    #   X = a*lon + b*lat + c ;  Y = d*lon + e*lat + f
    affine: tuple[float, float, float, float, float, float] = field(
        default=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    )

    def normalized(self) -> "CRS":
        """Axis order normalized to traditional GIS (x first) — the
        ``SetAxisMappingStrategy(OAMS_TRADITIONAL_GIS_ORDER)`` analogue."""
        if self.axis_order == "xy":
            return self
        return CRS(kind=self.kind, axis_order="xy", affine=self.affine)


LONLAT = CRS()
WEBMERC = CRS(kind="webmerc")


def same_crs(a: CRS | None, b: CRS | None) -> bool:
    """``IsSame`` after axis normalization; a missing (None) CRS is never
    "same" — the reference forces the reproject path then
    (``runner.py:336-341``)."""
    if a is None or b is None:
        return False
    a, b = a.normalized(), b.normalized()
    if a.kind != b.kind:
        return False
    if a.kind != "affine":
        return True
    # few-ulp tolerance (ADVICE r3): GDAL's IsSame is tolerance-based, so
    # two affines differing only by a different arithmetic path producing
    # the same frame (one ulp apart) must not trigger a lossy reprojection.
    # A WIDE relative tolerance would go the other way — silently skipping
    # reprojection between genuinely different frames — hence 4 ulps, not
    # np.allclose's 1e-5.
    av = np.asarray(a.affine, dtype=np.float64)
    bv = np.asarray(b.affine, dtype=np.float64)
    ulp = np.spacing(np.maximum(np.abs(av), np.abs(bv)))
    return bool(np.all(np.abs(av - bv) <= 4.0 * ulp))


def _swap_if_yx(crs: CRS, x: np.ndarray, y: np.ndarray):
    if crs.axis_order == "yx":
        return y, x
    return x, y


def _to_base(crs: CRS, x: np.ndarray, y: np.ndarray):
    """(x, y in crs) → (lon, lat degrees)."""
    x, y = _swap_if_yx(crs, x, y)
    if crs.kind == "lonlat":
        return x, y
    if crs.kind == "webmerc":
        lon = np.degrees(x / _R)
        lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
        return lon, lat
    if crs.kind == "affine":
        a, b, c, d, e, f = crs.affine
        det = a * e - b * d
        if det == 0:
            raise ValueError("singular affine CRS")
        u = x - c
        v = y - f
        lon = (e * u - b * v) / det
        lat = (-d * u + a * v) / det
        return lon, lat
    raise ValueError(f"unknown CRS kind {crs.kind!r}")


def _from_base(crs: CRS, lon: np.ndarray, lat: np.ndarray):
    """(lon, lat degrees) → (x, y in crs)."""
    if crs.kind == "lonlat":
        x, y = lon, lat
    elif crs.kind == "webmerc":
        x = _R * np.radians(lon)
        y = _R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    elif crs.kind == "affine":
        a, b, c, d, e, f = crs.affine
        x = a * lon + b * lat + c
        y = d * lon + e * lat + f
    else:
        raise ValueError(f"unknown CRS kind {crs.kind!r}")
    if crs.axis_order == "yx":
        return y, x
    return x, y


def transform_points(
    src: CRS | None, dst: CRS, x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized src→dst point transform.  ``src=None`` (missing SRS)
    assigns the target frame without moving coordinates — matching
    ``VectorTranslate`` with only ``dstSRS`` on an SRS-less source."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src is None:
        return x, y
    if src == dst:
        return x, y
    # full path through the base frame: handles same-frame-different-axis
    # (pure swap) as well as genuine reprojection
    lon, lat = _to_base(src, x, y)
    return _from_base(dst, lon, lat)


def reproject_zones_table(table: pa.Table, src: CRS | None, dst: CRS) -> pa.Table:
    """Zones table (ZONE_SCHEMA) with rings in ``src`` → same table with
    rings in ``dst`` and recomputed bboxes.  One vectorized transform over
    the concatenated ring buffers — no per-ring Python math."""
    rx_col = table["ring_x"]
    ry_col = table["ring_y"]
    if isinstance(rx_col, pa.ChunkedArray):
        rx_col = rx_col.combine_chunks()
    if isinstance(ry_col, pa.ChunkedArray):
        ry_col = ry_col.combine_chunks()
    flat_x = rx_col.flatten().to_numpy(zero_copy_only=False)
    flat_y = ry_col.flatten().to_numpy(zero_copy_only=False)
    offs = np.asarray(rx_col.offsets) - rx_col.offsets[0].as_py()
    tx, ty = transform_points(src, dst, flat_x, flat_y)
    new_rx = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(tx, pa.float64()))
    new_ry = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(ty, pa.float64()))
    # per-ring bbox via reduceat over the flat buffers
    starts = offs[:-1]
    n = len(table)
    minx = np.minimum.reduceat(tx, starts) if len(tx) else np.empty(0)
    maxx = np.maximum.reduceat(tx, starts) if len(tx) else np.empty(0)
    miny = np.minimum.reduceat(ty, starts) if len(ty) else np.empty(0)
    maxy = np.maximum.reduceat(ty, starts) if len(ty) else np.empty(0)
    out = table
    for name, arr in [
        ("ring_x", new_rx),
        ("ring_y", new_ry),
        ("minx", pa.array(minx[:n], pa.float64())),
        ("miny", pa.array(miny[:n], pa.float64())),
        ("maxx", pa.array(maxx[:n], pa.float64())),
        ("maxy", pa.array(maxy[:n], pa.float64())),
    ]:
        out = out.set_column(out.schema.get_field_index(name), name, arr)
    return out


def prepare_zones(table: pa.Table, zones_crs: CRS | None, target_crs: CRS | None) -> pa.Table:
    """The reference's M1 decision (``runner.py:336-341``): reproject the
    zones into the target (raster/points) CRS unless both are known and the
    same after axis normalization.  ``target_crs=None`` means the engine's
    default single-CRS mode — zones pass through untouched."""
    if target_crs is None:
        return table
    if (
        zones_crs is not None
        and same_crs(zones_crs, target_crs)
        and zones_crs.axis_order == target_crs.axis_order
    ):
        # same frame AND same data layout — nothing to do; same frame with
        # different axis order still needs the (pure-swap) transform
        return table
    return reproject_zones_table(table, zones_crs, target_crs)
