"""Unit tests for incremental_rollup state maintenance and
embedding_profile."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


class TestIncrementalRollup:
    def test_two_increments_equal_full(self, rd, tmp_path):
        from zonal_stats_toolkit_ray.stages.incremental import incremental_rollup

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], 2000),
                "v": rng.uniform(0, 100, 2000),
            }
        )
        a, b = df.iloc[:800], df.iloc[800:]
        sd = str(tmp_path / "state")
        incremental_rollup(
            rd.from_pandas(a).repartition(3), sd, key_cols=["k"], value_col="v"
        )
        got = incremental_rollup(
            rd.from_pandas(b).repartition(4), sd, key_cols=["k"], value_col="v"
        )
        full = incremental_rollup(
            rd.from_pandas(df), str(tmp_path / "full"), key_cols=["k"], value_col="v"
        )
        pd.testing.assert_frame_equal(got, full)

    def test_state_survives_and_new_keys_append(self, rd, tmp_path):
        from zonal_stats_toolkit_ray.stages.incremental import incremental_rollup

        sd = str(tmp_path / "s2")
        incremental_rollup(
            rd.from_pandas(pd.DataFrame({"k": ["x"], "v": [5.0]})),
            sd,
            key_cols=["k"],
            value_col="v",
        )
        got = incremental_rollup(
            rd.from_pandas(pd.DataFrame({"k": ["x", "y"], "v": [2.0, 7.0]})),
            sd,
            key_cols=["k"],
            value_col="v",
        )
        assert got.set_index("k")["total"].to_dict() == {"x": 7, "y": 7}
        assert got.set_index("k")["n"].to_dict() == {"x": 2, "y": 1}


class TestEmbeddingProfile:
    def test_matches_numpy(self, rd):
        from zonal_stats_toolkit_ray.stages.profile import embedding_profile

        rng = np.random.default_rng(5)
        x = rng.normal(3, 2, (400, 16)).astype(np.float32)
        df = pd.DataFrame({"embedding": [list(map(float, r)) for r in x]})
        got = embedding_profile(rd.from_pandas(df).repartition(5))
        xd = x.astype(np.float64)
        assert got["dim"].tolist() == list(range(1, 17))
        assert (got["n"] == 400).all()
        assert np.abs(got["mean"].to_numpy() - xd.mean(axis=0)).max() < 1e-9
        assert np.abs(got["std"].to_numpy() - xd.std(axis=0)).max() < 1e-9
        assert (got["min"].to_numpy() == xd.min(axis=0)).all()
        assert (got["max"].to_numpy() == xd.max(axis=0)).all()
