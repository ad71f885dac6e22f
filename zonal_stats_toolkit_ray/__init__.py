"""zonal_stats_toolkit_ray — a Ray-Data-native zonal-stats & spatial-join engine.

From-scratch reimplementation of the *capabilities* of
``springinnovate/zonal_stats_toolkit`` (reference snapshot at
``/root/reference/runner.py``) as streaming ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches.  Not a port: the reference is a single-process
GDAL/OGR engine; this package expresses every stage as a vectorized
``map_batches`` transform, stateful stages as actor pools, and wide steps as
salted groupby-aggregate shuffles.

Layout:
    geom/       pure-NumPy spatial kernels (cell index, PIP, STR R-tree, windows)
    sources/    table synthesis + readers (pages, zones, raster tiles, config)
    stages/     per-batch transforms (geocode, cells, join, zonal, text, dedup,
                knn, window, multimodal)
    functions/  scalar helpers (percentile keys, labels, pivot naming)
    pipelines/  end-to-end pipelines (zonal stats, job runner)
    state/      checkpoint manifest / resume, metrics
"""

__version__ = "0.1.0"
