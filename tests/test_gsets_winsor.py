"""Unit tests for grouping_sets_sum_count and winsorized_mean_by_group."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


class TestGroupingSets:
    def test_matches_pandas(self, rd):
        from zonal_stats_toolkit_ray.stages.rollup import grouping_sets_sum_count

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "a": rng.choice(["x", "y"], 500),
                "b": rng.choice(["p", "q", "r"], 500),
                "v": rng.uniform(0, 10, 500),
            }
        )
        got = grouping_sets_sum_count(
            rd.from_pandas(df).repartition(4),
            keys=["a", "b"],
            value_col="v",
            sets=[["b"], []],
        )
        # set ["b"]: a == __ALL__
        for bv, g in df.groupby("b"):
            row = got[(got["b"] == bv) & (got["a"] == "__ALL__")]
            assert len(row) == 1
            assert row["n"].iloc[0] == len(g)
            assert abs(row["sum_v"].iloc[0] - g["v"].sum()) < 1e-9
        tot = got[(got["a"] == "__ALL__") & (got["b"] == "__ALL__")]
        assert tot["n"].iloc[0] == 500
        assert len(got) == 4  # 3 b-values + grand total

    def test_rejects_bad_set(self, rd):
        from zonal_stats_toolkit_ray.stages.rollup import grouping_sets_sum_count

        with pytest.raises(ValueError):
            grouping_sets_sum_count(
                rd.from_pandas(pd.DataFrame({"a": [1], "v": [1.0]})),
                keys=["a"],
                value_col="v",
                sets=[["zzz"]],
            )


class TestWinsorizedMean:
    def test_matches_numpy(self, rd):
        from zonal_stats_toolkit_ray.stages.rank import winsorized_mean_by_group

        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], 3000),
                "v": rng.integers(0, 500, 3000).astype(float),
            }
        )
        got = winsorized_mean_by_group(
            rd.from_pandas(df).repartition(5), key_col="k", value_col="v"
        ).set_index("k")
        for k, g in df.groupby("k"):
            v = g["v"].to_numpy()
            lo = np.quantile(v, 0.05)  # numpy default = linear = quantile_cont
            hi = np.quantile(v, 0.95)
            want = np.clip(v, lo, hi).mean()
            assert abs(got.loc[k, "lo"] - lo) < 1e-9
            assert abs(got.loc[k, "hi"] - hi) < 1e-9
            assert abs(got.loc[k, "wmean"] - want) < 1e-9
            assert got.loc[k, "n"] == len(g)

    def test_outliers_clipped(self, rd):
        from zonal_stats_toolkit_ray.stages.rank import winsorized_mean_by_group

        v = np.concatenate([np.full(98, 10.0), [1e6, -1e6]])
        df = pd.DataFrame({"k": ["g"] * 100, "v": v})
        got = winsorized_mean_by_group(
            rd.from_pandas(df), key_col="k", value_col="v"
        )
        assert abs(got["wmean"][0] - 10.0) < 1.0  # outliers neutralized


class TestOls2:
    def test_matches_numpy_lstsq(self, rd):
        from zonal_stats_toolkit_ray.stages.bivar import ols2_by_group

        rng = np.random.default_rng(29)
        n = 4000
        g = rng.choice(["a", "b"], n)
        x1 = rng.integers(1, 50, n).astype(float)
        x2 = rng.integers(0, 10, n).astype(float)
        y = np.where(g == "a", 5 + 2 * x1 - 3 * x2, -1 + 0.5 * x1 + x2)
        y = np.floor(y + rng.normal(0, 4, n))
        df = pd.DataFrame({"k": g, "x1": x1, "x2": x2, "y": y})
        got = ols2_by_group(
            rd.from_pandas(df).repartition(6),
            key_col="k",
            x1_col="x1",
            x2_col="x2",
            y_col="y",
        ).set_index("k")
        for key, gg in df.groupby("k"):
            A = np.column_stack(
                [np.ones(len(gg)), gg["x1"].to_numpy(), gg["x2"].to_numpy()]
            )
            coef, *_ = np.linalg.lstsq(A, gg["y"].to_numpy(), rcond=None)
            assert abs(got.loc[key, "b0"] - coef[0]) < 1e-6
            assert abs(got.loc[key, "b1"] - coef[1]) < 1e-8
            assert abs(got.loc[key, "b2"] - coef[2]) < 1e-8

    def test_collinear_null(self, rd):
        from zonal_stats_toolkit_ray.stages.bivar import ols2_by_group

        df = pd.DataFrame(
            {
                "k": ["c"] * 10,
                "x1": np.arange(10.0),
                "x2": np.arange(10.0) * 2,  # collinear
                "y": np.arange(10.0) * 3,
            }
        )
        got = ols2_by_group(
            rd.from_pandas(df), key_col="k", x1_col="x1", x2_col="x2", y_col="y"
        )
        assert np.isnan(got["b1"][0]) and np.isnan(got["b2"][0])


class TestTopkDense:
    def test_ties_included(self, rd):
        from zonal_stats_toolkit_ray.stages.rank import topk_dense_per_group

        df = pd.DataFrame(
            {
                "k": ["a"] * 6 + ["b"] * 2,
                "v": [9.0, 9.0, 8.0, 7.0, 7.0, 1.0, 5.0, 5.0],
                "id": range(8),
            }
        )
        got = (
            topk_dense_per_group(
                rd.from_pandas(df).repartition(3), key_col="k", value_col="v", k=3
            )
            .to_pandas()
            .sort_values("id")
        )
        # group a: top-3 distinct = {9, 8, 7} → 5 rows incl. both ties;
        # group b has < 3 distinct → all rows
        assert got["id"].tolist() == [0, 1, 2, 3, 4, 6, 7]
