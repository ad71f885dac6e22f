"""Unit tests for raster map algebra (normalized difference)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def tiles_from(vals: dict[tuple, np.ndarray]):
    txs, tys, flat, offsets = [], [], [], [0]
    for (tx, ty), v in sorted(vals.items()):
        txs.append(tx)
        tys.append(ty)
        flat.append(v.ravel().astype(np.float32))
        offsets.append(offsets[-1] + v.size)
    from zonal_stats_toolkit_ray.sources.raster import TILES_SCHEMA

    values = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(np.concatenate(flat), pa.float32()),
    )
    return pa.table(
        {
            "tile_x": pa.array(txs, pa.int32()),
            "tile_y": pa.array(tys, pa.int32()),
            "values": values,
        },
        schema=TILES_SCHEMA,
    )


class TestRasterAlgebra:
    def test_matches_numpy_with_nodata(self, rd):
        from zonal_stats_toolkit_ray.sources.raster import raster_algebra

        rng = np.random.default_rng(5)
        nd = -9999.0
        a_vals, b_vals = {}, {}
        for tx in range(3):
            for ty in range(2):
                a = rng.uniform(1, 10, (4, 4)).astype(np.float32)
                b = rng.uniform(1, 10, (4, 4)).astype(np.float32)
                a[0, 0] = nd  # nodata in a
                b[1, 1] = nd  # nodata in b
                a[2, 2], b[2, 2] = 5.0, -5.0  # a + b == 0
                a_vals[(tx, ty)] = a
                b_vals[(tx, ty)] = b
        da = rd.from_arrow(tiles_from(a_vals)).repartition(3)
        db = rd.from_arrow(tiles_from(b_vals)).repartition(2)
        out = (
            raster_algebra(da, db, nodata_a=nd, nodata_b=nd, nodata_out=nd)
            .to_pandas()
            .set_index(["tile_x", "tile_y"])
        )
        assert len(out) == 6
        for (tx, ty), a in a_vals.items():
            b = b_vals[(tx, ty)]
            got = np.array(out.loc[(tx, ty), "values"], dtype=np.float32).reshape(4, 4)
            af, bf = a.astype(np.float64), b.astype(np.float64)
            bad = np.isclose(af, nd) | np.isclose(bf, nd) | (af + bf == 0)
            with np.errstate(invalid="ignore", divide="ignore"):
                want = ((af - bf) / (af + bf)).astype(np.float32)
            want = np.where(bad, np.float32(nd), want)
            assert np.array_equal(got, want), (tx, ty)
        # planted cases actually exercised
        g = np.array(out.iloc[0]["values"], dtype=np.float32).reshape(4, 4)
        assert g[0, 0] == np.float32(nd) and g[1, 1] == np.float32(nd)
        assert g[2, 2] == np.float32(nd)
