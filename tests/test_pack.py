"""Distributed prefix scan + sequence packing (stages/pack.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _mk(ids, sizes, nparts=1):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "n_chars": pa.array(np.asarray(sizes, dtype=np.int64)),
            }
        )
    )
    return ds.repartition(nparts) if nparts > 1 else ds


class TestPrefixScan:
    def test_running_total_matches_numpy(self, ray_session):
        from zonal_stats_toolkit_ray.stages.pack import attach_running_total

        rng = np.random.default_rng(0)
        n = 5_000
        ids = rng.permutation(n).astype(np.int64)  # unsorted input
        sizes = rng.integers(1, 500, n).astype(np.int64)
        out = (
            attach_running_total(_mk(ids, sizes, nparts=9), size_col="n_chars", order_col="doc_id")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        by_id = sizes[np.argsort(ids)]
        want = np.concatenate([[0], np.cumsum(by_id)[:-1]])
        assert np.array_equal(out["cum_before"].to_numpy(), want)

    def test_duplicate_keys_rejected(self, ray_session):
        from zonal_stats_toolkit_ray.stages.pack import attach_running_total

        ids = np.concatenate([np.zeros(200, dtype=np.int64), np.arange(200)])
        with pytest.raises(ValueError, match="unique"):
            attach_running_total(
                _mk(ids, np.ones_like(ids), nparts=8),
                size_col="n_chars",
                order_col="doc_id",
            ).materialize()


class TestPackSequences:
    def test_matches_window_sql(self, ray_session):
        import duckdb

        from zonal_stats_toolkit_ray.stages.pack import pack_sequences

        rng = np.random.default_rng(1)
        n = 3_000
        ids = rng.permutation(n).astype(np.int64)
        sizes = rng.integers(1, 700, n).astype(np.int64)
        out = (
            pack_sequences(_mk(ids, sizes, nparts=6), budget=1024)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        import pandas as pd

        raw = pd.DataFrame({"doc_id": ids, "n_chars": sizes})
        want = duckdb.sql(
            """
            SELECT doc_id, n_chars,
                   CAST(COALESCE(SUM(n_chars) OVER w, 0) // 1024 AS BIGINT) pack_id,
                   CAST(COALESCE(SUM(n_chars) OVER w, 0) % 1024 AS BIGINT) pack_offset
            FROM raw
            WINDOW w AS (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ORDER BY doc_id
            """
        ).df()
        for c in out.columns:
            assert np.array_equal(
                out[c].to_numpy().astype(np.int64), want[c].to_numpy().astype(np.int64)
            )

    def test_pack_invariants(self, ray_session):
        from zonal_stats_toolkit_ray.stages.pack import pack_sequences

        rng = np.random.default_rng(2)
        sizes = rng.integers(1, 300, 2_000).astype(np.int64)
        out = (
            pack_sequences(_mk(np.arange(2_000), sizes, nparts=5), budget=512)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # offsets stay in [0, budget); pack ids are non-decreasing; the
        # reconstruction cum = pack_id*budget + offset is the exclusive
        # prefix sum
        assert ((out["pack_offset"] >= 0) & (out["pack_offset"] < 512)).all()
        assert (np.diff(out["pack_id"].to_numpy()) >= 0).all()
        cum = out["pack_id"].to_numpy() * 512 + out["pack_offset"].to_numpy()
        assert np.array_equal(cum, np.concatenate([[0], np.cumsum(sizes)[:-1]]))
