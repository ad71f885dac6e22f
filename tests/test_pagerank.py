"""Distributed PageRank (stages/pagerank.py) — round-5 operator.

Pins the fixed-iteration power-method update (damping, dangling-mass
redistribution) against a dense NumPy reference, partition invariance,
parallel-edge semantics, and the all-dangling edge case.
"""

import numpy as np
import pandas as pd

import ray.data as rd

from zonal_stats_toolkit_ray.stages.pagerank import pagerank


def _numpy_pr(edges: pd.DataFrame, its=3, d=0.85):
    nodes = np.unique(np.concatenate([edges["src"], edges["dst"]]))
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    deg = edges.groupby("src").size().to_dict()
    r = np.full(N, 1.0 / N)
    for _ in range(its):
        dangling = sum(r[idx[n]] for n in nodes if n not in deg)
        s = np.zeros(N)
        for _, row in edges.iterrows():
            s[idx[row["dst"]]] += r[idx[row["src"]]] / deg[row["src"]]
        r = (1 - d) / N + d * (s + dangling / N)
    return pd.DataFrame({"node": nodes, "rank_scaled": r * N})


class TestPageRank:
    def test_matches_numpy_reference_random_graph(self, ray_session):
        rng = np.random.default_rng(17)
        edges = pd.DataFrame(
            {
                "src": rng.integers(0, 60, 400),
                "dst": rng.integers(0, 80, 400),
            }
        )
        for parts in (1, 6):
            got = (
                pagerank(rd.from_pandas(edges).repartition(parts), iterations=3)
                .to_pandas()
                .sort_values("node")
                .reset_index(drop=True)
            )
            want = _numpy_pr(edges).sort_values("node").reset_index(drop=True)
            assert got["node"].tolist() == want["node"].astype("int64").tolist()
            assert np.allclose(
                got["rank_scaled"], want["rank_scaled"], rtol=1e-9, atol=1e-12
            )

    def test_parallel_edges_weight_contributions(self, ray_session):
        # duplicate edge 1->2 doubles deg(1) and doubles the 1->2 flow
        e = pd.DataFrame({"src": [1, 1, 1], "dst": [2, 2, 3]})
        got = (
            pagerank(rd.from_pandas(e), iterations=1)
            .to_pandas()
            .set_index("node")["rank_scaled"]
        )
        want = _numpy_pr_parallel()
        for n, v in want.items():
            assert abs(got[n] - v) < 1e-9

    def test_all_dangling_uniform(self, ray_session):
        # single edge, everything else dangling: ranks stay finite and
        # sum to N after scaling
        e = pd.DataFrame({"src": [1], "dst": [2]})
        got = pagerank(rd.from_pandas(e), iterations=4).to_pandas()
        assert np.isfinite(got["rank_scaled"]).all()
        assert abs(got["rank_scaled"].sum() - len(got)) < 1e-9


class TestHits:
    def test_matches_numpy_reference(self, ray_session):
        from zonal_stats_toolkit_ray.stages.pagerank import hits

        rng = np.random.default_rng(23)
        edges = pd.DataFrame(
            {"src": rng.integers(0, 40, 200), "dst": rng.integers(0, 50, 200)}
        )
        got = (
            hits(rd.from_pandas(edges).repartition(5), iterations=2)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        nodes = np.unique(np.concatenate([edges["src"], edges["dst"]]))
        idx = {n: i for i, n in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for _, r in edges.iterrows():
            A[idx[r["src"]], idx[r["dst"]]] += 1
        h = np.full(len(nodes), 1 / np.sqrt(len(nodes)))
        for _ in range(2):
            a = A.T @ h
            a /= np.linalg.norm(a) or 1.0
            h = A @ a
            h /= np.linalg.norm(h) or 1.0
        assert got["node"].tolist() == [int(n) for n in nodes]
        assert np.allclose(got["hub"], h, rtol=1e-9, atol=1e-12)
        assert np.allclose(got["authority"], a, rtol=1e-9, atol=1e-12)


def _numpy_pr_parallel(d=0.85):
    # nodes 1,2,3; deg(1)=3 (parallel edges count); r0 = 1/3 each
    N, r0 = 3, 1 / 3
    dang = 2 * r0  # nodes 2 and 3 have no out-edges
    s = {1: 0.0, 2: 2 * r0 / 3, 3: r0 / 3}
    return {
        n: ((1 - d) / N + d * (s[n] + dang / N)) * N for n in (1, 2, 3)
    }
