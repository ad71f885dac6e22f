"""pagerank: distributed power iteration over an edge Dataset."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from zonal_stats_toolkit_ray.stages.graph import pagerank, pagerank_reference


def _rand_edges(n_nodes, n_edges, seed, with_dangling=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    if with_dangling:
        # nodes in the top decile never appear as src → dangling
        keep = src < int(n_nodes * 0.9)
        src, dst = src[keep], dst[keep]
    return pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})


class TestPagerank:
    def test_matches_dense_reference(self, ray_session):
        df = _rand_edges(200, 2000, seed=3)
        got = pagerank(rd.from_pandas(df).repartition(8), iters=4)
        ref = pagerank_reference(df, iters=4)
        assert np.allclose(got["rank"], ref["rank"], atol=1e-12)
        assert list(got["node"]) == list(ref["node"])

    def test_dangling_mass_conserved(self, ray_session):
        df = _rand_edges(100, 600, seed=9, with_dangling=True)
        got = pagerank(rd.from_pandas(df).repartition(4), iters=5)
        ref = pagerank_reference(df, iters=5)
        assert np.allclose(got["rank"], ref["rank"], atol=1e-12)
        # total rank mass stays 1 when dangling mass is redistributed
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_star_graph_center_wins(self, ray_session):
        # all leaves point at node 0
        df = pd.DataFrame(
            {"src": np.arange(1, 21, dtype=np.int64),
             "dst": np.zeros(20, dtype=np.int64)}
        )
        got = pagerank(rd.from_pandas(df), iters=10).set_index("node")["rank"]
        assert got.idxmax() == 0
        assert got[0] > 10 * got[1]

    def test_empty_edges(self, ray_session):
        df = pd.DataFrame({"src": pd.Series(dtype="int64"),
                           "dst": pd.Series(dtype="int64")})
        out = pagerank(rd.from_pandas(df))
        assert len(out) == 0

    def test_node_threshold_raises(self, ray_session):
        df = _rand_edges(100, 200, seed=1)
        with pytest.raises(ValueError, match="node universe"):
            pagerank(rd.from_pandas(df), node_driver_threshold=10)
