"""Envelope → pixel-window math, replicating the reference's semantics.

The reference computes a read window from a geometry envelope with a
float32 geotransform, ``int()`` truncation for offsets, ``ceil`` for the
far edge, sign-flip handling for negative ``dx``/``dy``, and edge
clamping (``/root/reference/runner.py:719-763``).  The bbox-window
fallback for zero-pixel polygons (quirk Q4, SURVEY.md §2.9) depends on
this exact arithmetic, so it is reproduced here bit-for-bit (including
the float32 geotransform downcast at ``runner.py:700``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GridSpec:
    """Raster grid metadata (the reference's ``get_raster_info`` subset:
    ``runner.py:295-305``): affine geotransform + size + nodata."""

    x0: float
    y0: float
    dx: float
    dy: float  # negative for north-up rasters
    width: int
    height: int
    nodata: float | None
    tile_size: int = 256

    @property
    def geotransform(self) -> tuple[float, float, float, float, float, float]:
        return (self.x0, self.dx, 0.0, self.y0, 0.0, self.dy)

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        xs = (self.x0, self.x0 + self.dx * self.width)
        ys = (self.y0, self.y0 + self.dy * self.height)
        return (min(xs), min(ys), max(xs), max(ys))

    def pixel_centers(self, col0: int, row0: int, ncols: int, nrows: int):
        """(x, y) centers for a window, each shaped (nrows, ncols)."""
        cols = col0 + np.arange(ncols, dtype=np.float64)
        rows = row0 + np.arange(nrows, dtype=np.float64)
        x = self.x0 + (cols + 0.5) * self.dx
        y = self.y0 + (rows + 0.5) * self.dy
        return np.broadcast_to(x, (nrows, ncols)), np.broadcast_to(
            y[:, None], (nrows, ncols)
        )


def envelope_to_window(
    envelope: tuple[float, float, float, float],
    grid: GridSpec,
) -> tuple[int, int, int, int] | None:
    """(minx, maxx, miny, maxy) envelope → (xoff, yoff, win_xsize, win_ysize).

    Returns None when the clamped window is empty.  Matches
    ``runner.py:719-763`` exactly: float32 geotransform, ``int()``
    truncation, ``ceil`` far edge, axis swap for negative dx/dy, clamping.
    """
    gt = np.array(
        [grid.x0, grid.dx, 0.0, grid.y0, 0.0, grid.dy], dtype=np.float32
    )
    env = list(envelope)
    if gt[1] < 0:
        env[0], env[1] = env[1], env[0]
    if gt[5] < 0:
        env[2], env[3] = env[3], env[2]

    xoff = int((env[0] - gt[0]) / gt[1])
    yoff = int((env[2] - gt[3]) / gt[5])
    win_xsize = int(np.ceil((env[1] - gt[0]) / gt[1])) - xoff
    win_ysize = int(np.ceil((env[3] - gt[3]) / gt[5])) - yoff

    if xoff < 0:
        win_xsize += xoff
        xoff = 0
    if yoff < 0:
        win_ysize += yoff
        yoff = 0
    if xoff + win_xsize > grid.width:
        win_xsize = grid.width - xoff
    if yoff + win_ysize > grid.height:
        win_ysize = grid.height - yoff
    if win_xsize <= 0 or win_ysize <= 0:
        return None
    return xoff, yoff, win_xsize, win_ysize
