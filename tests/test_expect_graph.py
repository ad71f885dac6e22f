"""Unit tests for the expectations suite and degree assortativity."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


class TestExpect:
    def test_all_rule_kinds(self, rd):
        from zonal_stats_toolkit_ray.stages.expect import expect

        df = pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 4],
                "v": [1.0, None, 50.0, 200.0, -3.0],
                "cat": ["a", "b", None, "z", "a"],
                "s": ["x1", "x2", "y3", "x4", None],
            }
        )
        rules = [
            ("not_null", "v"),
            ("in_range", "v", 0.0, 100.0),
            ("accepted_values", "cat", ("a", "b")),
            ("matches_regex", "s", r"^x"),
            ("unique", "id"),
        ]
        got = expect(rd.from_pandas(df).repartition(3), rules).set_index("rule")
        assert got.loc["not_null(v)", "violations"] == 1
        assert got.loc["in_range(v,0.0,100.0)", "violations"] == 2  # 200, -3
        assert got.loc["accepted_values(cat)", "violations"] == 1  # 'z'
        assert got.loc["matches_regex(s)", "violations"] == 1  # 'y3'
        assert got.loc["unique(id)", "violations"] == 1  # dup 4
        assert not got["passed"].any()

    def test_clean_table_passes(self, rd):
        from zonal_stats_toolkit_ray.stages.expect import expect

        df = pd.DataFrame({"id": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
        got = expect(
            rd.from_pandas(df),
            [("not_null", "v"), ("in_range", "v", 0.0, 5.0), ("unique", "id")],
        )
        assert got["passed"].all()


class TestAssortativity:
    def test_matches_numpy_reference(self, rd):
        from zonal_stats_toolkit_ray.stages.graph import degree_assortativity

        rng = np.random.default_rng(3)
        src = rng.integers(0, 50, 800)
        dst = rng.integers(0, 50, 800)
        got = degree_assortativity(
            rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(5)
        )
        indeg = np.bincount(dst, minlength=50)
        x = indeg[src].astype(float)
        y = indeg[dst].astype(float)
        want = np.corrcoef(x, y)[0, 1]
        assert got["n_edges"].tolist() == [800]
        assert abs(got["assort"][0] - want) < 1e-9

    def test_star_graph_negative(self, rd):
        """Hub-and-spoke: every edge pairs a low-indeg node with the hub →
        strongly negative assortativity."""
        from zonal_stats_toolkit_ray.stages.graph import degree_assortativity

        n = 40
        src = np.arange(1, n)
        dst = np.zeros(n - 1, dtype=np.int64)
        edges = pd.DataFrame(
            {
                "src": np.concatenate([src, dst]),
                "dst": np.concatenate([dst, src]),
            }
        )
        got = degree_assortativity(rd.from_pandas(edges))
        assert got["assort"][0] < -0.9
