"""End-to-end zonal statistics pipelines (points path and raster path).

Points path (the graft's primary corpus flow, SURVEY §3.4):
    pages → geocode → cell-encode → spatial join (stateless tasks with a
    per-worker index cache by default; actor pool via ``use_actors``) →
    per-batch partials → group merge (the shuffle moves only tiny partials)
    → finalize (+ exact percentiles via a raw-value path when requested).

Raster path (the reference's native flow, ``runner.py:264-926``): tiles →
per-tile pixel-center assignment + per-FID partials → FID merge → quirk-Q4
bbox-window fallback for zero-pixel FIDs → FID→group rollup → finalize.
Replicates quirks Q1-Q9 (SURVEY §2.9) for row-identical output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.scalars import GROUP_KEY_NULL, group_label, percentile_keys
from ..geom.window import GridSpec, envelope_to_window
from ..sources.zones import ZoneSet
from ..stages import zonal as Z
from ..stages.geocode import geocode_batch
from ..stages.cells import cell_encode_batch
from ..stages.join import SpatialJoiner


def _all_group_keys(zs: ZoneSet) -> list[str]:
    from ..functions.scalars import _KEY_PREFIX

    return [
        GROUP_KEY_NULL if g is None else _KEY_PREFIX + str(g)
        for g in zs.unique_groups
    ]


def join_points(
    ds,
    zones,
    *,
    cell_res: int = 12,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    shortcut_res: int | None = 7,
    geocode: bool = True,
    use_actors: bool = False,
    zones_crs=None,
    points_crs=None,
):
    """pages/points Dataset → joined Dataset with zone_fid + group_value.

    ``zones`` may be a ZoneSet / Arrow table / ray.ObjectRef (broadcast once
    with ``ray.put`` for multi-stage reuse).

    ``zones_crs``/``points_crs`` (geom.crs.CRS, both optional) reproduce
    the reference's M1 decision (``runner.py:307-341``): when both are
    given and differ after axis normalization — or the zones CRS is
    missing (None) while ``points_crs`` is set — the zones table is
    reprojected into the points frame before the index builds.  Requires
    ``zones`` as a table/ZoneSet (not a pre-broadcast ObjectRef).

    ``use_actors=False`` (default) runs the join as stateless tasks on
    Ray's persistent shared workers with a per-process ZoneSet cache —
    same once-per-process index build as an actor pool, none of the
    process-spawn cost (significant in this sandbox: fresh Python
    processes page-fault their imports at ~75 MB/s).  Set True for huge
    zone indexes that need dedicated actor sizing.

    ``batch_size=None`` (default) keeps block-sized batches: an explicit
    batch size larger than the *input* rows-per-block would coalesce many
    blocks into one task, collapsing the stage to a single worker
    (observed: a 64-block input ran as ONE 11-second task with
    batch_size=32768)."""
    from ..stages.join import spatial_join_batch

    if points_crs is not None:
        from ..geom.crs import prepare_zones
        from ..sources.zones import ZoneSet as _ZS

        tbl = zones.table if isinstance(zones, _ZS) else zones
        if not isinstance(tbl, pa.Table):
            raise TypeError(
                "zones_crs/points_crs reprojection needs zones as a table or "
                "ZoneSet, not a pre-broadcast ObjectRef"
            )
        zones = prepare_zones(tbl, zones_crs, points_crs)
    if geocode:
        ds = ds.map_batches(geocode_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        cell_encode_batch, batch_format="pyarrow", fn_kwargs={"res": cell_res}
    )
    if use_actors:
        from ..state.resources import default_pool_size

        if concurrency is None:
            concurrency = default_pool_size()
        return ds.map_batches(
            SpatialJoiner,
            fn_constructor_kwargs={"zones": zones, "shortcut_res": shortcut_res},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        spatial_join_batch,
        fn_kwargs={"zones": zones, "shortcut_res": shortcut_res},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def zonal_stats_points(
    joined_ds,
    value_col: str,
    zs: ZoneSet,
    *,
    nodata: float | None = None,
    percentiles: list[float] = (),
    cache_rows: bool = True,
    rows_sink: str | None = None,
) -> pd.DataFrame:
    """Joined points Dataset → final grouped stats frame (small), with the
    reference's stat fields / empty-group defaults / Q8 row order.

    When percentiles are requested there are two consumers (partials +
    raw-value shuffle); a lazy Dataset would re-execute the whole upstream
    join for each.  ``cache_rows=True`` (default) first reduces the joined
    rows to a slim (group_key, value, nodata) projection and materializes
    THAT — a few bytes per row, never the wide page columns — so the join
    runs exactly once.

    ``rows_sink`` (round 4, VERDICT r3 #4): write the slim joined rows to
    this Parquet directory so an external oracle (DuckDB) can reproduce
    the REDUCE independently — splitting join verification (covered by the
    join-row fixtures) from aggregation verification.  Requires the
    percentiles+cache_rows path (the only one that materializes slim
    rows)."""
    if rows_sink is not None and not (percentiles and cache_rows):
        raise ValueError("rows_sink requires percentiles with cache_rows=True")
    if percentiles and cache_rows:
        slim = joined_ds.map_batches(
            Z.rows_batch,
            batch_format="pyarrow",
            fn_kwargs={"value_col": value_col, "nodata": nodata},
        ).materialize()
        if rows_sink is not None:
            slim.write_parquet(rows_sink)
        if slim.count() <= 2_000_000:
            # small assigned-row set: one driver pass computes partials AND
            # percentiles (each extra Dataset execution costs ~0.5 s of
            # executor startup — pure fixed overhead at this size)
            df = slim.to_pandas()
            merged, gp = Z.stats_from_rows_df(df, list(percentiles))
            return Z.finalize_group_stats(
                merged,
                all_group_keys=_all_group_keys(zs),
                percentiles=list(percentiles),
                group_percentiles=gp,
            )
        partials = slim.map_batches(
            Z.partials_from_rows, batch_format="pyarrow"
        )
        values = slim.map_batches(Z.values_from_rows, batch_format="pyarrow")
    else:
        partials = joined_ds.map_batches(
            Z.partial_stats_batch,
            batch_format="pyarrow",
            fn_kwargs={"value_col": value_col, "nodata": nodata},
        )
        values = (
            joined_ds.map_batches(
                Z.values_batch,
                batch_format="pyarrow",
                fn_kwargs={"value_col": value_col, "nodata": nodata},
            )
            if percentiles
            else None
        )
    merged = Z.reduce_partials(partials)
    gp = Z.group_percentiles_ds(values, list(percentiles)) if percentiles else None
    return Z.finalize_group_stats(
        merged,
        all_group_keys=_all_group_keys(zs),
        percentiles=list(percentiles),
        group_percentiles=gp,
    )


# ---------------------------------------------------------------------------
# raster path
# ---------------------------------------------------------------------------


def _list_col_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """list<float32> column → (flat float32 values, int offsets) zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    offs = np.asarray(col.offsets) - col.offsets[0].as_py()
    return flat, offs


# NOTE: FID shuffle keys stay int64 end-to-end (PARTIAL_SCHEMA_INT /
# ROWS_SCHEMA_INT): FIDs are never null, so they never need the string
# encoding that nullable group_values use — a per-pixel Python-object
# string key was pure overhead (round-2 fix, VERDICT item 5).


def tile_fid_partials_batch(
    batch: pa.Table, zones, grid: GridSpec, ignore_nodata: bool = True
) -> pa.Table:
    """Stateless-task stage: raster tiles → per-(tile, FID) partial
    aggregates.  Pixel centers are assigned to zones with the same PIP
    semantics as the reference's FID burn; partials are keyed by FID (not
    group) because the Q4 fallback and the rollup's min/max-merge condition
    operate per FID (``runner.py:848-889``).  The zones ObjectRef resolves
    through the per-worker-process cache (see stages/join.py)."""
    from ..sources.raster import tile_window
    from ..stages.join import _cached_zoneset

    zs = _cached_zoneset(zones)
    out = []
    txs = batch["tile_x"].to_numpy()
    tys = batch["tile_y"].to_numpy()
    flat, offs = _list_col_buffers(batch["values"])
    for i in range(len(batch)):
        col0, row0, ncols, nrows = tile_window(grid, int(txs[i]), int(tys[i]))
        v = flat[offs[i] : offs[i + 1]]
        gx, gy = grid.pixel_centers(col0, row0, ncols, nrows)
        fids = zs.assign_points(gx.ravel(), gy.ravel())
        m = fids != -1
        if not m.any():
            continue
        t = Z.grouped_partials(
            fids[m], v.astype(np.float64)[m], grid.nodata,
            ignore_nodata=ignore_nodata,
        )
        out.append(t)
    if not out:
        return Z.PARTIAL_SCHEMA_INT.empty_table()
    return pa.concat_tables(out)


class TileFidPixels:
    """Actor stage: raster tiles → slim (fid_key, value, nodata) pixel rows.

    Used when percentiles are requested: the expensive pixel-center PIP
    assignment runs ONCE, the slim rows are materialized (bytes per pixel,
    not tiles), and both the partial aggregate and the percentile shuffle
    derive from them."""

    def __init__(self, zones, grid: GridSpec):
        from ..stages.join import _resolve_zones
        from ..state.resources import prefault

        prefault()
        self.zs = _resolve_zones(zones)
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        return tile_fid_pixels_batch(batch, self.zs, self.grid)


def tile_fid_pixels_batch(batch: pa.Table, zones, grid: GridSpec) -> pa.Table:
    """Stateless-task stage: raster tiles → slim (fid_key, value, nodata)
    pixel rows (single PIP pass feeding both partials and percentiles)."""
    from ..sources.raster import tile_window
    from ..stages.join import _cached_zoneset

    zs = _cached_zoneset(zones)
    keys_out, vals_out, nd_out = [], [], []
    txs = batch["tile_x"].to_numpy()
    tys = batch["tile_y"].to_numpy()
    flat, offs = _list_col_buffers(batch["values"])
    for i in range(len(batch)):
        col0, row0, ncols, nrows = tile_window(grid, int(txs[i]), int(tys[i]))
        v = flat[offs[i] : offs[i + 1]]
        gx, gy = grid.pixel_centers(col0, row0, ncols, nrows)
        fids = zs.assign_points(gx.ravel(), gy.ravel())
        m = fids != -1
        if not m.any():
            continue
        keys_out.append(fids[m])
        vals_out.append(v[m].astype(np.float64))
        nd_out.append(Z.nodata_mask(v[m], grid.nodata))
    if not keys_out:
        return Z.ROWS_SCHEMA_INT.empty_table()
    return pa.table(
        {
            "group_key": pa.array(np.concatenate(keys_out), pa.int64()),
            "value": pa.array(np.concatenate(vals_out), pa.float64()),
            "nodata": pa.array(np.concatenate(nd_out)),
        },
        schema=Z.ROWS_SCHEMA_INT,
    )


def _fetch_windows(tiles_ds, grid: GridSpec, windows: list[tuple[int, int, int, int]]):
    """Read only the tiles touched by the given pixel windows (small side)
    and return a dict (tile_x, tile_y) → dense 2-D float32 tile array."""
    from ..sources.raster import tile_window

    ts = grid.tile_size
    needed = set()
    for xoff, yoff, wx, wy in windows:
        for ty in range(yoff // ts, (yoff + wy - 1) // ts + 1):
            for tx in range(xoff // ts, (xoff + wx - 1) // ts + 1):
                needed.add((tx, ty))
    if not needed:
        return {}
    tx_arr = pa.array([t[0] for t in needed], pa.int32())
    ty_arr = pa.array([t[1] for t in needed], pa.int32())

    def pick(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.is_in(b["tile_x"], tx_arr), pc.is_in(b["tile_y"], ty_arr))
        return b.filter(m)

    rows = tiles_ds.map_batches(pick, batch_format="pyarrow").take_all()
    out = {}
    for r in rows:
        tx, ty = int(r["tile_x"]), int(r["tile_y"])
        _, _, ncols, nrows = tile_window(grid, tx, ty)
        out[(tx, ty)] = np.asarray(r["values"], dtype=np.float32).reshape(nrows, ncols)
    return out


def _read_window(
    tile_map, grid: GridSpec, xoff: int, yoff: int, wx: int, wy: int
) -> np.ndarray:
    ts = grid.tile_size
    out = np.empty((wy, wx), dtype=np.float32)
    for ty in range(yoff // ts, (yoff + wy - 1) // ts + 1):
        for tx in range(xoff // ts, (xoff + wx - 1) // ts + 1):
            tile = tile_map[(tx, ty)]
            r0 = max(yoff, ty * ts)
            r1 = min(yoff + wy, ty * ts + tile.shape[0])
            c0 = max(xoff, tx * ts)
            c1 = min(xoff + wx, tx * ts + tile.shape[1])
            out[r0 - yoff : r1 - yoff, c0 - xoff : c1 - xoff] = tile[
                r0 - ty * ts : r1 - ty * ts, c0 - tx * ts : c1 - tx * ts
            ]
    return out



def _window_partials_batch(
    batch: pa.Table, specs_ref, grid: GridSpec, ignore_nodata: bool = True
) -> pa.Table:
    """Stateless-task stage for the DISTRIBUTED Q4 fallback: for every
    (fallback window × tile) intersection in the batch, emit one partial
    stats row keyed by window id.  The reference runs this pass serially on
    one process (runner.py:697-811); windows tile-partition cleanly, so the
    window aggregates merge associatively."""
    from ..sources.raster import tile_window

    specs = specs_ref
    try:
        import ray

        if isinstance(specs, ray.ObjectRef):
            specs = ray.get(specs)
    except ImportError:
        pass
    wid, xoff, yoff, wx, wy = (np.asarray(a) for a in specs)
    txs = batch["tile_x"].to_numpy()
    tys = batch["tile_y"].to_numpy()
    flat, offs = _list_col_buffers(batch["values"])
    out = {k: [] for k in ("win_id", "count", "nodata_count", "sum", "sumsq", "min", "max")}
    for i in range(len(batch)):
        col0, row0, ncols, nrows = tile_window(grid, int(txs[i]), int(tys[i]))
        hit = np.flatnonzero(
            (xoff < col0 + ncols)
            & (xoff + wx > col0)
            & (yoff < row0 + nrows)
            & (yoff + wy > row0)
        )
        if hit.size == 0:
            continue
        tile = flat[offs[i] : offs[i + 1]].reshape(nrows, ncols)
        for h in hit.tolist():
            c0 = max(int(xoff[h]), col0)
            c1 = min(int(xoff[h] + wx[h]), col0 + ncols)
            r0 = max(int(yoff[h]), row0)
            r1 = min(int(yoff[h] + wy[h]), row0 + nrows)
            block = tile[r0 - row0 : r1 - row0, c0 - col0 : c1 - col0]
            nd = Z.nodata_mask(block, grid.nodata)
            valid = block[~nd] if ignore_nodata else block.ravel()
            out["win_id"].append(int(wid[h]))
            out["count"].append(block.size)
            out["nodata_count"].append(int(np.count_nonzero(nd)))
            if valid.size:
                out["sum"].append(float(valid.sum(dtype=np.float64)))
                out["sumsq"].append(float(np.sum(valid.astype(np.float64) ** 2)))
                out["min"].append(float(valid.min()))
                out["max"].append(float(valid.max()))
            else:
                out["sum"].append(0.0)
                out["sumsq"].append(0.0)
                out["min"].append(np.nan)
                out["max"].append(np.nan)
    return pa.table(
        {
            "win_id": pa.array(out["win_id"], pa.int64()),
            "count": pa.array(out["count"], pa.int64()),
            "nodata_count": pa.array(out["nodata_count"], pa.int64()),
            "sum": pa.array(out["sum"], pa.float64()),
            "sumsq": pa.array(out["sumsq"], pa.float64()),
            "min": pa.array(out["min"], pa.float64()),
            "max": pa.array(out["max"], pa.float64()),
        }
    )



def _window_values_batch(
    batch: pa.Table, specs_ref, grid: GridSpec, ignore_nodata: bool = True
) -> pa.Table:
    """Distributed fallback VALUES pass: (win_id, value) rows of valid
    pixels per fallback window × tile intersection — feeds the percentile
    value bags when the fallback set is large (reference appends each
    part-window's valid pixels to the bag, runner.py:805-811; percentile
    over the multiset is order-independent, so distributed collection is
    exact)."""
    from ..sources.raster import tile_window

    specs = specs_ref
    try:
        import ray

        if isinstance(specs, ray.ObjectRef):
            specs = ray.get(specs)
    except ImportError:
        pass
    wid, xoff, yoff, wx, wy = (np.asarray(a) for a in specs)
    txs = batch["tile_x"].to_numpy()
    tys = batch["tile_y"].to_numpy()
    flat, offs = _list_col_buffers(batch["values"])
    out_w, out_v = [], []
    for i in range(len(batch)):
        col0, row0, ncols, nrows = tile_window(grid, int(txs[i]), int(tys[i]))
        hit = np.flatnonzero(
            (xoff < col0 + ncols)
            & (xoff + wx > col0)
            & (yoff < row0 + nrows)
            & (yoff + wy > row0)
        )
        if hit.size == 0:
            continue
        tile = flat[offs[i] : offs[i + 1]].reshape(nrows, ncols)
        for h in hit.tolist():
            c0 = max(int(xoff[h]), col0)
            c1 = min(int(xoff[h] + wx[h]), col0 + ncols)
            r0 = max(int(yoff[h]), row0)
            r1 = min(int(yoff[h] + wy[h]), row0 + nrows)
            block = tile[r0 - row0 : r1 - row0, c0 - col0 : c1 - col0]
            valid = (
                block[~Z.nodata_mask(block, grid.nodata)]
                if ignore_nodata
                else block.ravel()
            )
            if valid.size:
                out_w.append(np.full(valid.size, wid[h], dtype=np.int64))
                out_v.append(valid.astype(np.float32, copy=False).ravel())
    if not out_w:
        return pa.table(
            {"win_id": pa.array([], pa.int64()), "value": pa.array([], pa.float32())}
        )
    return pa.table(
        {
            "win_id": pa.array(np.concatenate(out_w)),
            "value": pa.array(np.concatenate(out_v), pa.float32()),
        }
    )


def _window_stats_distributed(
    tiles_ds,
    grid: GridSpec,
    win_specs,
    *,
    ignore_nodata: bool = True,
    tree_threshold: int = 200_000,
) -> dict[int, dict]:
    """Distributed full-window stats for the Q4 fallback windows: one pass
    over the tiles → per-(window, tile) partial rows → associative merge.
    Returns {win_id: {count, nodata_count, sum, sumsq, min, max}} with the
    reference's empty-valid zeros.

    The merge reuses the ``reduce_partials`` reduction tree (round-3,
    VERDICT #4): the partial rows are keyed by ``group_key`` (= win_id, an
    int — same schema as the zonal partials) and above ``tree_threshold``
    rows a distributed pre-combine level shrinks the frame before the
    driver groupby, so 10^5 fallback windows × 10^5 tiles no longer
    funnel one row each through the driver."""
    import ray

    wid = np.array([w[0] for w in win_specs], dtype=np.int64)
    xoff = np.array([w[1] for w in win_specs], dtype=np.int64)
    yoff = np.array([w[2] for w in win_specs], dtype=np.int64)
    wx = np.array([w[3] for w in win_specs], dtype=np.int64)
    wy = np.array([w[4] for w in win_specs], dtype=np.int64)
    specs_ref = (
        ray.put((wid, xoff, yoff, wx, wy))
        if ray.is_initialized()
        else (wid, xoff, yoff, wx, wy)
    )
    parts = tiles_ds.map_batches(
        _window_partials_batch,
        fn_kwargs={
            "specs_ref": specs_ref,
            "grid": grid,
            "ignore_nodata": ignore_nodata,
        },
        batch_format="pyarrow",
    ).map_batches(
        # win_id → the partials schema key, renamed BY NAME (a positional
        # rename would silently relabel a stats column if the partial
        # table's column order ever changed)
        lambda t: t.rename_columns(
            ["group_key" if c == "win_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    merged = Z.reduce_partials(parts, tree_threshold=tree_threshold)
    out: dict[int, dict] = {}
    for _, r in merged.iterrows():
        count = int(r["count"])
        ndc = int(r["nodata_count"])
        # zeros apply when the VALUE BAG is empty: with ignore_nodata=False
        # every pixel is in the bag (reference runner.py:778-793)
        valid = count - ndc if ignore_nodata else count
        st = {"count": count, "nodata_count": ndc}
        if valid <= 0:
            st.update({"min": 0.0, "max": 0.0, "sum": 0.0, "sumsq": 0.0})
        else:
            st.update(
                {
                    "min": float(r["min"]),
                    "max": float(r["max"]),
                    "sum": float(r["sum"]),
                    "sumsq": float(r["sumsq"]),
                }
            )
        out[int(r["group_key"])] = st
    return out


def zonal_stats_raster(
    tiles_ds,
    grid: GridSpec,
    zs: ZoneSet,
    *,
    percentiles: list[float] = (),
    zones_ref=None,
    concurrency: int | tuple[int, int] | None = None,
    simplify_tolerance: float | None = None,
    polygons_might_overlap: bool = False,
    ignore_nodata: bool = True,
    percentile_driver_threshold: int = 2_000_000,
    rows_sink: str | None = None,
) -> dict:
    """Full reference-semantics zonal statistics over a tiled raster.

    Returns {group_value: {min,max,count,nodata_count,valid_count,sum,
    stdev,p*}} exactly like ``fast_zonal_statistics`` (``runner.py:926``).

    ``rows_sink`` (round 4, VERDICT r3 #4): export the per-pixel
    (group_key=fid, value, nodata) rows — including the Q4 bbox-window
    fallback pixels for zero-pixel FIDs — to a Parquet directory so an
    external oracle reproduces the reduce independently.  Only supported
    in percentile mode (pixels materialize there) with single-part
    fallback zones on the ≤16-window driver path, where the Q4 overwrite
    semantics degenerate to plain aggregation; raises otherwise.

    ``simplify_tolerance``: reference quirk Q6 — DP-simplify rings before
    joining (the reference always uses 0.5 × pixel width; default off here
    because fixtures are simplification-stable).  ``polygons_might_overlap``
    is accepted for API parity with ``fast_zonal_statistics``; the engine's
    join resolves overlap per point with the same highest-FID-wins rule in
    both modes, so no disjoint-set partitioning is ever needed (SURVEY O3).
    """
    from ..state.resources import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size()
    if simplify_tolerance is not None and simplify_tolerance > 0:
        import ray

        from ..geom.simplify import simplify_zones_table

        zs = ZoneSet(simplify_zones_table(zs.table, simplify_tolerance))
        # the incoming broadcast handle refers to the UNsimplified zones;
        # re-broadcast the simplified table so tasks still read from plasma
        zones_ref = ray.put(zs.table) if ray.is_initialized() else None
    plist = sorted(set(float(p) for p in percentiles))
    pkeys = percentile_keys(plist)

    # --- empty-intersection fast path (runner.py:409-450) ---
    v_minx = float(np.min(zs.minx))
    v_maxx = float(np.max(zs.maxx))
    v_miny = float(np.min(zs.miny))
    v_maxy = float(np.max(zs.maxy))
    r_minx, r_miny, r_maxx, r_maxy = grid.bbox
    if v_maxx < r_minx or v_minx > r_maxx or v_maxy < r_miny or v_miny > r_maxy:
        empty = {
            "min": None,
            "max": None,
            "count": 0,
            "nodata_count": 0,
            "valid_count": 0,
            "sum": 0.0,
            "stdev": None,
            **{k: None for k in pkeys},
        }
        return {g: dict(empty) for g in zs.unique_groups}

    zones_arg = zones_ref if zones_ref is not None else zs.table

    # --- per-tile FID partials → distributed merge.  With percentiles the
    # PIP assignment runs once into slim materialized pixel rows and both
    # consumers derive from them; without, partials aggregate inside the
    # actor (single pass, nothing materialized). ---
    pixels = None
    if rows_sink is not None and not plist:
        raise ValueError("rows_sink requires percentile mode (pixels rows)")
    if plist:
        pixels = tiles_ds.map_batches(
            tile_fid_pixels_batch,
            fn_kwargs={"zones": zones_arg, "grid": grid},
            batch_format="pyarrow",
        ).materialize()
        if rows_sink is not None:
            pixels.write_parquet(rows_sink)
        partials = pixels.map_batches(
            Z.partials_from_rows,
            batch_format="pyarrow",
            fn_kwargs={"ignore_nodata": ignore_nodata},
        )
    else:
        partials = tiles_ds.map_batches(
            tile_fid_partials_batch,
            fn_kwargs={
                "zones": zones_arg,
                "grid": grid,
                "ignore_nodata": ignore_nodata,
            },
            batch_format="pyarrow",
        )
    merged = Z.reduce_partials(partials)

    fid_stats: dict[int, dict] = {}
    for _, r in merged.iterrows():
        fid_stats[int(r["group_key"])] = {
            "min": None if pd.isna(r["min"]) else float(r["min"]),
            "max": None if pd.isna(r["max"]) else float(r["max"]),
            "count": int(r["count"]),
            "nodata_count": int(r["nodata_count"]),
            "sum": float(r["sum"]),
            "sumsq": float(r["sumsq"]),
        }

    # --- percentile value bags (assigned valid pixels, from the cached
    # slim rows — no second PIP pass) ---
    fid_value_chunks: dict[int, list[np.ndarray]] | None = None
    if plist:
        values_ds = pixels.map_batches(
            Z.values_from_rows,
            batch_format="pyarrow",
            fn_kwargs={"ignore_nodata": ignore_nodata},
        )
        if pixels.count() < percentile_driver_threshold:
            # small: stream to the driver (a distributed shuffle's fixed
            # cost dwarfs the data here)
            vdf = values_ds.to_pandas()
            # an all-fallback run has zero assigned pixels: the empty frame
            # comes back without columns, so skip the groupby
            fid_value_chunks = (
                {
                    int(k): [g["value"].to_numpy(dtype=np.float32)]
                    for k, g in vdf.groupby("group_key", sort=False)
                }
                if len(vdf)
                else {}
            )
        else:
            # DISTRIBUTED percentiles (round-2): keep the (fid, value) rows
            # as Datasets — fallback window values union in below — and the
            # group percentile runs through the salted two-level shuffle.
            # No pixel value ever reaches the driver.
            fid_value_chunks = None
            dist_value_parts = [values_ds]

    # --- quirk-Q4 bbox-window fallback for zero-pixel FIDs
    #     (runner.py:697-811: whole envelope window, unmasked by geometry,
    #     per-part OVERWRITE so the last part wins) ---
    unset = [f for f in zs.all_fids if f not in fid_stats]
    if unset:
        unset_set = set(unset)
        part_rows: dict[int, list[int]] = {f: [] for f in unset}
        for j in range(zs.n_parts):
            f = int(zs.fid[j])
            if f in unset_set:
                part_rows[f].append(j)
        # (win_id, fid, part-order) + pixel window per fallback part
        win_specs: list[tuple[int, int, int, int, int]] = []
        win_owner: list[tuple[int, int]] = []
        for f in unset:
            for order_idx, j in enumerate(part_rows[f]):
                env = (
                    float(zs.minx[j]),
                    float(zs.maxx[j]),
                    float(zs.miny[j]),
                    float(zs.maxy[j]),
                )
                w = envelope_to_window(env, grid)
                if w is not None:
                    win_specs.append((len(win_specs), *w))
                    win_owner.append((f, order_idx))

        if rows_sink is not None and win_specs:
            # oracle export is only sound where Q4's overwrite semantics
            # degenerate to plain aggregation: one window per fallback FID,
            # driver path (pixels available to export)
            fids_in_specs = [f for f, _ in win_owner]
            if len(win_specs) > 16 or len(set(fids_in_specs)) != len(fids_in_specs):
                raise ValueError(
                    "rows_sink oracle export requires ≤16 single-part "
                    "fallback windows (Q4 overwrite is not aggregation-"
                    "equivalent otherwise)"
                )
        if win_specs and len(win_specs) > 16:
            # DISTRIBUTED fallback (engine improvement over the reference's
            # serial pass, runner.py:697-811): one tile sweep computes every
            # window's stats
            win_stats = _window_stats_distributed(
                tiles_ds, grid, win_specs, ignore_nodata=ignore_nodata
            )
            # apply per fid in part order: later parts OVERWRITE (quirk Q4)
            for (f, _order), (win_id, *_rest) in zip(win_owner, win_specs):
                st = win_stats.get(win_id)
                if st is not None:
                    fid_stats[f] = dict(st)
            if plist:
                # percentile value bags for the fallback windows, collected
                # in a second distributed sweep (exact: percentile over the
                # multiset is append-order-independent)
                import ray as _ray

                wid = np.array([w[0] for w in win_specs], dtype=np.int64)
                arrs = (
                    wid,
                    np.array([w[1] for w in win_specs], dtype=np.int64),
                    np.array([w[2] for w in win_specs], dtype=np.int64),
                    np.array([w[3] for w in win_specs], dtype=np.int64),
                    np.array([w[4] for w in win_specs], dtype=np.int64),
                )
                sref = _ray.put(arrs) if _ray.is_initialized() else arrs
                win_vals_ds = tiles_ds.map_batches(
                    _window_values_batch,
                    fn_kwargs={
                        "specs_ref": sref,
                        "grid": grid,
                        "ignore_nodata": ignore_nodata,
                    },
                    batch_format="pyarrow",
                )
                # win_id → owning fid (small LUT; windows whose stats were
                # discarded never made win_specs)
                win_fid = np.full(len(win_specs), -1, dtype=np.int64)
                for (f, _order), (win_id, *_rest) in zip(win_owner, win_specs):
                    win_fid[win_id] = f
                if fid_value_chunks is not None:
                    vals = win_vals_ds.to_pandas()
                    by_win = {
                        int(w): g["value"].to_numpy(dtype=np.float32)
                        for w, g in vals.groupby("win_id", sort=False)
                    }
                    for (f, _order), (win_id, *_rest) in zip(win_owner, win_specs):
                        v = by_win.get(win_id)
                        if v is not None and v.size:
                            fid_value_chunks.setdefault(f, []).append(v)
                else:
                    wf_ref = (
                        _ray.put(win_fid) if _ray.is_initialized() else win_fid
                    )

                    def win_to_fid_rows(b: pa.Table) -> pa.Table:
                        import ray as _r

                        wf = _r.get(wf_ref) if not isinstance(wf_ref, np.ndarray) else wf_ref
                        w = b["win_id"].to_numpy(zero_copy_only=False)
                        return pa.table(
                            {
                                "group_key": pa.array(wf[w], pa.int64()),
                                "value": b["value"],
                            }
                        )

                    dist_value_parts.append(
                        win_vals_ds.map_batches(
                            win_to_fid_rows, batch_format="pyarrow"
                        )
                    )
        elif win_specs:
            # driver path (small window sets / percentile mode, which also
            # needs the raw valid values appended per part)
            fb_rows: list[pa.Table] = []
            tile_map = _fetch_windows(
                tiles_ds, grid, [w[1:] for w in win_specs]
            )
            for (f, _order), (_wid, xoff, yoff, wx, wy) in zip(win_owner, win_specs):
                block = _read_window(tile_map, grid, xoff, yoff, wx, wy)
                nd = Z.nodata_mask(block, grid.nodata)
                if rows_sink is not None:
                    fb_rows.append(
                        pa.table(
                            {
                                "group_key": pa.array(
                                    np.full(block.size, f, dtype=np.int64)
                                ),
                                "value": pa.array(
                                    block.ravel().astype(np.float64), pa.float64()
                                ),
                                "nodata": pa.array(nd.ravel()),
                            },
                            schema=Z.ROWS_SCHEMA_INT,
                        )
                    )
                valid = block[~nd] if ignore_nodata else block.ravel()
                st = {
                    "count": block.size,
                    "nodata_count": int(np.count_nonzero(nd)),
                }
                if valid.size == 0:
                    st.update({"min": 0.0, "max": 0.0, "sum": 0.0, "sumsq": 0.0})
                else:
                    st.update(
                        {
                            "min": float(valid.min()),
                            "max": float(valid.max()),
                            "sum": float(valid.sum(dtype=np.float64)),
                            "sumsq": float(
                                np.sum(
                                    valid.astype(np.float64) ** 2, dtype=np.float64
                                )
                            ),
                        }
                    )
                fid_stats[f] = st  # overwrite (=), not accumulate — quirk Q4
                if fid_value_chunks is not None and valid.size:
                    # stats overwrite per part, but value chunks APPEND per
                    # part (runner.py:805-811)
                    fid_value_chunks.setdefault(f, []).append(
                        valid.astype(np.float32, copy=False)
                    )
                elif plist and fid_value_chunks is None and valid.size:
                    import ray.data as _rd

                    dist_value_parts.append(
                        _rd.from_arrow(
                            pa.table(
                                {
                                    "group_key": pa.array(
                                        np.full(valid.size, f, dtype=np.int64)
                                    ),
                                    "value": pa.array(
                                        valid.astype(np.float32, copy=False),
                                        pa.float32(),
                                    ),
                                }
                            )
                        )
                    )

        if rows_sink is not None and win_specs and fb_rows:
            import os as _os

            import pyarrow.parquet as _pq

            _pq.write_table(
                pa.concat_tables(fb_rows),
                _os.path.join(rows_sink, "fallback_windows.parquet"),
            )

    # FIDs still unset get the zeroed default (runner.py:813-815, 491-500)
    default_fid = {
        "min": None,
        "max": None,
        "count": 0,
        "nodata_count": 0,
        "sum": 0.0,
        "sumsq": 0.0,
    }
    for f in zs.all_fids:
        fid_stats.setdefault(f, dict(default_fid))

    # --- FID → group rollup (runner.py:848-889) ---
    grouped: dict = {}
    group_chunks: dict = {}
    for f in zs.all_fids:
        gv = zs.fid_to_group[f]
        s = fid_stats[f]
        g = grouped.setdefault(
            gv,
            {
                "min": None,
                "max": None,
                "count": 0,
                "nodata_count": 0,
                "valid_count": 0,
                "sum": 0.0,
                "sumsq": 0.0,
                "stdev": None,
                **{k: None for k in pkeys},
            },
        )
        g["count"] += s["count"]
        g["nodata_count"] += s["nodata_count"]
        g["sum"] += s["sum"]
        g["sumsq"] += s.get("sumsq", 0.0)
        fid_valid = s["count"] - s["nodata_count"]
        if fid_valid > 0:
            if g["min"] is None:
                g["min"], g["max"] = s["min"], s["max"]
            else:
                g["min"] = min(g["min"], s["min"])
                g["max"] = max(g["max"], s["max"])
        if fid_value_chunks is not None:
            ch = fid_value_chunks.get(f)
            if ch:
                group_chunks.setdefault(gv, []).extend(ch)

    if plist and fid_value_chunks is not None:
        for gv, chunks in group_chunks.items():
            vals = np.concatenate(chunks)
            for k, v in zip(pkeys, np.percentile(vals, plist).tolist()):
                grouped[gv][k] = v
    elif plist:
        # distributed: re-key (fid, value) → encoded group key with a
        # broadcast LUT, then the salted two-level percentile shuffle —
        # identical multiset per group, so results equal the driver path
        import ray as _ray

        from ..functions.scalars import encode_group_key as _enc

        # one vectorized encode over the ZoneSet's precomputed fid-sorted
        # group LUT (not a per-fid single-element loop — O(#zones) Python
        # overhead on exactly the large runs this path exists for)
        lut_fids = zs._lut_fids
        lut_keys = _enc(zs._lut_groups)
        lut_ref = (
            _ray.put((lut_fids, lut_keys))
            if _ray.is_initialized()
            else (lut_fids, lut_keys)
        )

        def rekey(b: pa.Table) -> pa.Table:
            import ray as _r

            lut = lut_ref if isinstance(lut_ref, tuple) else _r.get(lut_ref)
            kf, kk = lut
            fids = b["group_key"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kf, fids)
            keys = kk[np.clip(pos, 0, len(kf) - 1)]
            return pa.table(
                {
                    "group_key": pa.array(keys.tolist(), pa.string()),
                    "value": b["value"],
                }
            )

        # materialize each slim part once and drop empty ones — an empty
        # map_batches output has no schema (Ray never runs the UDF), which
        # would poison the union's groupby
        parts_mat = [p.materialize() for p in dist_value_parts]
        parts_mat = [p for p in parts_mat if p.count() > 0]
        if not parts_mat:
            gp = {}
        else:
            all_vals = parts_mat[0]
            for part in parts_mat[1:]:
                all_vals = all_vals.union(part)
            gp = Z.salted_group_percentiles(
                all_vals.map_batches(rekey, batch_format="pyarrow"), plist
            )
        from ..functions.scalars import decode_group_key as _dec

        for key, pv in gp.items():
            gv = _dec(key)
            if gv in grouped:
                for k, v in zip(pkeys, pv):
                    grouped[gv][k] = v

    # --- finalize (runner.py:906-917) ---
    for gv, g in grouped.items():
        valid_count = g["count"] - g["nodata_count"]
        g["valid_count"] = valid_count
        if valid_count > 0:
            mean = g["sum"] / valid_count
            var = g["sumsq"] / valid_count - mean * mean
            if var < 0:
                var = 0.0
            g["stdev"] = float(np.sqrt(var))
        else:
            g["stdev"] = None
        del g["sumsq"]
    return grouped


# ---------------------------------------------------------------------------
# pivot + CSV sink (runner.py:966-1025, quirks Q8/Q9)
# ---------------------------------------------------------------------------


def pivot_stats(
    raster_stats_by_stem: dict[str, dict],
    raster_stems: list[str],
    row_col_order: str,
    agg_field: str,
) -> tuple[list[str], list[dict]]:
    """Wide pivot with the reference's exact column/row ordering."""
    all_groups: set = set()
    stat_fields = None
    for stem in raster_stems:
        stats = raster_stats_by_stem[stem]
        all_groups.update(stats.keys())
        if stat_fields is None and stats:
            stat_fields = list(next(iter(stats.values())).keys())
    if stat_fields is None:
        stat_fields = ["min", "max", "count", "nodata_count", "sum"]

    parts = [p.strip() for p in row_col_order.split(",") if p.strip()]
    ordered_groups = sorted(all_groups, key=lambda v: (v is None, str(v)))
    rows: list[dict] = []
    if parts == ["agg_field", "base_raster"]:
        first_col = agg_field
        columns = [f"{f}_{stem}" for stem in raster_stems for f in stat_fields]
        for gv in ordered_groups:
            row = {first_col: group_label(gv)}
            for stem in raster_stems:
                s = raster_stats_by_stem[stem][gv]
                for f in stat_fields:
                    row[f"{f}_{stem}"] = s[f]
            rows.append(row)
    elif parts == ["base_raster", "agg_field"]:
        first_col = "base_raster"
        columns = [
            f"{f}_{group_label(gv)}" for gv in ordered_groups for f in stat_fields
        ]
        for stem in raster_stems:
            row = {first_col: stem}
            stats = raster_stats_by_stem[stem]
            for gv in ordered_groups:
                lbl = group_label(gv)
                for f in stat_fields:
                    row[f"{f}_{lbl}"] = stats[gv][f]
            rows.append(row)
    else:
        raise ValueError(
            "row_col_order must be 'agg_field,base_raster' or 'base_raster,agg_field'"
        )
    return [first_col] + columns, rows


def write_pivot_csv(path, header: list[str], rows: list[dict]) -> None:
    import csv
    from pathlib import Path

    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with p.open("w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=header)
        w.writeheader()
        w.writerows(rows)
