"""Cell-encode stage: (lon, lat) → hierarchical cell id columns.

The discretized spatial key of the engine (SURVEY §1.4 ``cells`` table),
standing in for the reference's FID raster grid
(``/root/reference/runner.py:530-540``).  Pure integer NumPy math over
zero-copy Arrow batches — safe to run at any parallelism.
"""

from __future__ import annotations

import pyarrow as pa

from ..geom import cellid

DEFAULT_RES = 12


def cell_encode_batch(
    batch: pa.Table,
    res: int = DEFAULT_RES,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> pa.Table:
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    cells = cellid.latlng_to_cell(lat, lon, res)
    batch = batch.append_column("cell_id", pa.array(cells, pa.uint64()))
    return batch.append_column(
        "cell_res", pa.array(cellid.get_resolution(cells), pa.int8())
    )
