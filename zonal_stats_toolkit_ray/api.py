"""Drop-in API parity with the reference's public surface.

The reference exposes three entry points (``/root/reference/runner.py``):
``fast_zonal_statistics`` (runner.py:264), ``run_zonal_stats_job``
(runner.py:929) and ``main(argv)`` (runner.py:1054).  This module mirrors
their signatures on the engine's data model (zones Parquet instead of an
OGR vector; tiled-raster Parquet instead of GeoTIFF), so a reference user
can switch imports and run the same pipelines.

The caller owns the Ray session (driver contract); these functions only
use an already-initialised Ray.
"""

from __future__ import annotations

from pathlib import Path

from .geom.window import GridSpec  # noqa: F401  (re-export for callers)
from .pipelines.runner import run_config, run_job
from .pipelines.zonal import zonal_stats_raster
from .sources.raster import read_grid_spec
from .sources.zones import ZoneSet


def fast_zonal_statistics(
    base_raster_path_band: tuple[str, int],
    aggregate_vector_path: str,
    aggregate_vector_field: str = "group_value",
    aggregate_layer_name: str | None = None,
    ignore_nodata: bool = True,
    polygons_might_overlap: bool = True,
    working_dir: str | None = None,
    clean_working_dir: bool = True,
    percentile_list: list[float] | None = None,
    simplify_tolerance: float | None | str = "auto",
) -> dict:
    """Signature-compatible with ``runner.py:264-273``.

    * ``base_raster_path_band`` = (tiles-parquet path, band) — band must be
      1 (the tiles table is single-band; multi-band = one table per band).
    * ``aggregate_vector_path`` = zones Parquet (ZONE_SCHEMA).
    * ``aggregate_vector_field`` must be "group_value" (the engine's zones
      schema carries the agg field under that name; reshape upstream for
      arbitrary fields).
    * ``ignore_nodata=False`` keeps nodata values in sum/sumsq/min/max and
      the percentile value bags while count/nodata_count/valid_count keep
      their usual meaning — exactly the reference's ``runner.py:657-667,
      778-811`` behavior (the job runner itself always passes True,
      runner.py:954-963 — quirk Q7 — but the public API supports both).
    * ``aggregate_layer_name``: the engine's zones Parquet is single-layer
      by construction, but a multi-layer file may carry a ``layer`` string
      column — when it does and a name is given, only that layer's rows
      participate (the ``GetLayerByName`` analogue, ``runner.py:318-329``);
      an unknown name raises like the reference's "Could not open layer".
    * ``working_dir`` / ``clean_working_dir`` are accepted for parity; the
      engine needs no temp working dir.
    * ``simplify_tolerance``: quirk Q6 — the reference ALWAYS Douglas-Peucker
      simplifies the vector at ``0.5 × pixel_width`` before rasterizing
      (``runner.py:297-298, 349-365``); ``"auto"`` (the default) reproduces
      that.  Pass ``None`` to disable (an explicit engine extension the
      reference does not offer) or a float to override the tolerance.

    Returns {group_value: {min,max,count,nodata_count,valid_count,sum,
    stdev,p*}} exactly like the reference (quirks Q1-Q9 replicated).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    raster_path, band = base_raster_path_band
    if int(band) != 1:
        raise ValueError("tiles tables are single-band; use one table per band")
    grid = read_grid_spec(raster_path)
    ztable = pq.read_table(aggregate_vector_path)
    if aggregate_layer_name is not None:
        if "layer" not in ztable.column_names:
            # the reference's GetLayerByName raises for ANY unknown name
            # (runner.py:318-329); a zones file without a `layer` column has
            # no named layers, so a requested name can never match — raising
            # here instead of silently aggregating the whole file
            raise RuntimeError(
                "Could not open layer %s on %s (no `layer` column)"
                % (aggregate_layer_name, aggregate_vector_path)
            )
        import pyarrow.compute as pc

        ztable = ztable.filter(pc.equal(ztable["layer"], aggregate_layer_name))
        if len(ztable) == 0:
            raise RuntimeError(
                "Could not open layer %s on %s"
                % (aggregate_layer_name, aggregate_vector_path)
            )
        ztable = ztable.drop_columns(["layer"])
    zs = ZoneSet(ztable)
    tiles = rd.read_parquet(raster_path)
    if isinstance(simplify_tolerance, str) and simplify_tolerance != "auto":
        raise ValueError(
            'simplify_tolerance must be "auto", a float tolerance, or None; '
            f"got {simplify_tolerance!r}"
        )
    tol = (
        0.5 * abs(grid.dx) if simplify_tolerance == "auto" else simplify_tolerance
    )
    return zonal_stats_raster(
        tiles,
        grid,
        zs,
        percentiles=list(percentile_list or []),
        polygons_might_overlap=polygons_might_overlap,
        ignore_nodata=ignore_nodata,
        simplify_tolerance=tol,
    )


def run_zonal_stats_job(
    base_raster_path_list: list,
    agg_vector,
    agg_layer: str | None,
    agg_field: str,
    operations: list[str],
    output_csv,
    workdir,
    tag: str,
    row_col_order: str,
    *,
    timestamp: str | None = None,
) -> Path:
    """Signature-compatible with ``runner.py:929-939``: loop rasters →
    zonal stats → pivot per row_col_order → CSV."""
    from .functions.scalars import parse_operations

    norm_ops, plist = parse_operations([str(o) for o in operations])
    job = {
        "tag": tag,
        "agg_vector": str(agg_vector),
        "agg_field": agg_field,
        "base_raster_path_list": [str(p) for p in base_raster_path_list],
        "operations": norm_ops,
        "percentile_list": plist,
        "row_col_order": row_col_order,
        "workdir": str(workdir),
        "output_csv": str(output_csv),
    }
    return run_job(job, timestamp=timestamp)


def main(argv: list[str] | None = None) -> list[Path]:
    """CLI parity with ``runner.py:1054-1101``: ``main([config.ini])`` —
    parse/validate the INI config and run every job, timestamping output
    CSVs.  Owns a Ray session iff none exists."""
    import sys
    import time

    import ray

    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 1:
        raise SystemExit("usage: python -m zonal_stats_toolkit_ray <config.ini>")
    own_session = not ray.is_initialized()
    if own_session:
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        ts = time.strftime("%Y_%m_%d_%H_%M_%S")
        return run_config(argv[0], timestamp=ts)
    finally:
        if own_session:
            ray.shutdown()
