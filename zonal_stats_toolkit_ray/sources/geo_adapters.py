"""External geospatial-format adapters (round 4, VERDICT r3 #1/#8).

The reference reads GPKG/OGR vector layers (``runner.py:312-341, 371-386``)
and GDAL rasters (``runner.py:295-305, 634-635``); this sandbox has no
gdal/fiona/rasterio, so the engine reads zones and tiles from Parquet.
This module is the documented, TESTED column-mapping contract that makes
the gap explicit and closable: the day real geo libraries are available, a
user plugs their outputs into these constructors and every engine pipeline
works unchanged.

Contract (GPKG/OGR → ZONE_SCHEMA):

* one input *feature* = fid + attributes + (Multi)Polygon geometry in the
  GeoJSON-ish mapping shape that both ``fiona`` records and
  ``ogr.Feature.ExportToJson`` produce:
  ``{"fid": int, "properties": {...}, "geometry": {"type": "Polygon" |
  "MultiPolygon", "coordinates": [...]}}``;
* ``agg_field`` names the attribute used as ``group_value`` (the
  reference's aggregate field; missing/None → null group, labeled ""
  and sorted last, quirk Q8);
* MultiPolygons explode to one row per part sharing the fid (reference
  M8, ``runner.py:710-717``); interior rings (holes) are NOT representable
  in ZONE_SCHEMA — ``holes="error"`` (default) raises, ``holes="ignore"``
  drops them (documented approximation);
* closing vertices (first == last, the OGR convention) are trimmed — the
  engine's PIP kernel expects open rings.

Contract (GeoTIFF → tiles):

* ``grid_from_geotransform`` maps a GDAL 6-tuple geotransform + raster
  size + nodata to the engine's :class:`GridSpec` (north-up only:
  rotation terms must be 0, like the reference's block reader);
* ``tiles_from_array`` chops a dense band array (what
  ``rasterio.DatasetReader.read(1)`` / ``gdal Band.ReadAsArray`` return)
  into the engine's TILES_SCHEMA rows — at real scale, feed windows
  instead via ``tiles_from_windows(reader)`` where ``reader(col0, row0,
  ncols, nrows)`` wraps ``Band.ReadAsArray`` so only one tile is resident
  per call.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import numpy as np
import pyarrow as pa

from ..geom.window import GridSpec
from .raster import TILES_SCHEMA, tile_window
from .zones import ZONE_SCHEMA, zones_table  # noqa: F401  (re-export context)


def _trim_closing(ring: np.ndarray) -> np.ndarray:
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        return ring[:-1]
    return ring


def zones_from_features(
    features: Iterable[dict],
    *,
    agg_field: str,
    fid_field: str | None = None,
    holes: str = "error",
) -> pa.Table:
    """OGR/fiona-shaped feature records → ZONE_SCHEMA table.

    ``fid_field=None`` takes the record's top-level ``"fid"`` (fiona's
    ``id`` is accepted as a fallback, cast to int); otherwise the named
    property is used.  See module docstring for the full contract."""
    if holes not in ("error", "ignore"):
        raise ValueError("holes must be 'error' or 'ignore'")
    fids: list[int] = []
    parts: list[int] = []
    groups: list[str | None] = []
    rings: list[tuple[np.ndarray, np.ndarray]] = []
    for feat in features:
        props = feat.get("properties", {}) or {}
        if fid_field is not None:
            fid = int(props[fid_field])
        elif "fid" in feat:
            fid = int(feat["fid"])
        else:
            fid = int(feat["id"])  # fiona record id (stringified int)
        gv = props.get(agg_field)
        gv = None if gv is None else str(gv)
        geom = feat["geometry"]
        gtype = geom["type"]
        if gtype == "Polygon":
            polys = [geom["coordinates"]]
        elif gtype == "MultiPolygon":
            polys = list(geom["coordinates"])
        else:
            raise ValueError(
                f"unsupported geometry type {gtype!r} for fid {fid} "
                "(the reference rasterizes polygon layers only)"
            )
        for part_idx, poly in enumerate(polys):
            if len(poly) > 1:
                if holes == "error":
                    raise ValueError(
                        f"fid {fid} part {part_idx} has interior rings; "
                        "ZONE_SCHEMA stores exterior rings only — pass "
                        "holes='ignore' to drop them (approximation)"
                    )
            ext = _trim_closing(np.asarray(poly[0], dtype=np.float64))
            if ext.ndim != 2 or ext.shape[1] < 2 or len(ext) < 3:
                raise ValueError(f"fid {fid} part {part_idx}: degenerate ring")
            fids.append(fid)
            parts.append(part_idx)
            groups.append(gv)
            rings.append((ext[:, 0].copy(), ext[:, 1].copy()))
    return zones_table(fids, parts, groups, rings)


def grid_from_geotransform(
    geotransform: tuple[float, float, float, float, float, float],
    width: int,
    height: int,
    *,
    nodata: float | None,
    tile_size: int = 256,
) -> GridSpec:
    """GDAL geotransform ``(x0, dx, rot1, y0, rot2, dy)`` → GridSpec.
    North-up rasters only (rotation terms 0) — same constraint the
    reference's window math assumes (``runner.py:620-640``)."""
    x0, dx, r1, y0, r2, dy = (float(v) for v in geotransform)
    if r1 != 0.0 or r2 != 0.0:
        raise ValueError("rotated rasters are not supported (north-up only)")
    return GridSpec(
        x0=x0, y0=y0, dx=dx, dy=dy, width=int(width), height=int(height),
        nodata=nodata, tile_size=tile_size,
    )


def tiles_from_windows(
    read_window: Callable[[int, int, int, int], np.ndarray],
    grid: GridSpec,
) -> pa.Table:
    """Window-reader → TILES_SCHEMA table.  ``read_window(col0, row0,
    ncols, nrows)`` returns the float band block (``Band.ReadAsArray``
    shape) — only one tile is resident per call, the GDAL-block-IO
    streaming shape the reference uses (``runner.py:542-545``)."""
    ts = grid.tile_size
    ntx = -(-grid.width // ts)
    nty = -(-grid.height // ts)
    txs, tys, vals = [], [], []
    for ty in range(nty):
        for tx in range(ntx):
            col0, row0, ncols, nrows = tile_window(grid, tx, ty)
            block = np.asarray(read_window(col0, row0, ncols, nrows))
            if block.shape != (nrows, ncols):
                raise ValueError(
                    f"reader returned {block.shape}, expected {(nrows, ncols)}"
                )
            txs.append(tx)
            tys.append(ty)
            vals.append(block.astype(np.float32, copy=False).ravel())
    flat = np.concatenate(vals) if vals else np.empty(0, np.float32)
    offsets = np.zeros(len(vals) + 1, dtype=np.int32)
    np.cumsum([v.size for v in vals], out=offsets[1:])
    values = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, pa.float32()))
    return pa.table(
        {
            "tile_x": pa.array(txs, pa.int32()),
            "tile_y": pa.array(tys, pa.int32()),
            "values": values,
        },
        schema=TILES_SCHEMA,
    )


def tiles_from_array(band: np.ndarray, grid: GridSpec) -> pa.Table:
    """Dense band array (height × width, e.g. ``rasterio .read(1)``) →
    TILES_SCHEMA table.  Convenience form of :func:`tiles_from_windows`
    for rasters that fit in memory; use the window form at scale."""
    band = np.asarray(band)
    if band.shape != (grid.height, grid.width):
        raise ValueError(
            f"band shape {band.shape} != grid {(grid.height, grid.width)}"
        )
    return tiles_from_windows(
        lambda c0, r0, nc, nr: band[r0 : r0 + nr, c0 : c0 + nc], grid
    )
