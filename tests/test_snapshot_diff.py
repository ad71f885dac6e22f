"""Unit tests for snapshot_diff."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


class TestSnapshotDiff:
    def test_all_statuses(self, rd):
        from zonal_stats_toolkit_ray.stages.joins import snapshot_diff

        old = pd.DataFrame(
            {"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, None]}
        )
        new = pd.DataFrame(
            {"k": [2, 3, 4, 5], "v": [20.0, 99.0, None, 50.0]}
        )
        got = snapshot_diff(
            rd.from_pandas(old),
            rd.from_pandas(new),
            key_col="k",
            compare_cols=["v"],
        )
        want = {
            1: "removed",
            3: "changed",  # 30 → 99
            5: "added",
        }
        # k=2 unchanged (omitted); k=4 NULL == NULL (omitted)
        assert dict(zip(got["key"], got["status"])) == want

    def test_null_transitions_are_changes(self, rd):
        from zonal_stats_toolkit_ray.stages.joins import snapshot_diff

        old = pd.DataFrame({"k": [1, 2], "v": [None, 5.0]})
        new = pd.DataFrame({"k": [1, 2], "v": [7.0, None]})
        got = snapshot_diff(
            rd.from_pandas(old),
            rd.from_pandas(new),
            key_col="k",
            compare_cols=["v"],
        )
        assert got["status"].tolist() == ["changed", "changed"]

    def test_large_random_matches_pandas(self, rd):
        from zonal_stats_toolkit_ray.stages.joins import snapshot_diff

        rng = np.random.default_rng(23)
        old = pd.DataFrame(
            {"k": np.arange(3000), "v": rng.integers(0, 50, 3000).astype(float)}
        )
        new = old.copy()
        new = new[new["k"] % 9 != 0]  # removed
        mut = new["k"] % 5 == 0
        new.loc[mut, "v"] += 1  # changed
        added = pd.DataFrame(
            {"k": np.arange(3000, 3100), "v": np.ones(100)}
        )
        new = pd.concat([new, added], ignore_index=True)
        got = snapshot_diff(
            rd.from_pandas(old).repartition(5),
            rd.from_pandas(new).repartition(7),
            key_col="k",
            compare_cols=["v"],
        )
        m = old.merge(
            new, on="k", how="outer", indicator="ind", suffixes=("_o", "_n")
        )
        want = {}
        for _, r in m.iterrows():
            if r["ind"] == "left_only":
                want[r["k"]] = "removed"
            elif r["ind"] == "right_only":
                want[r["k"]] = "added"
            elif r["v_o"] != r["v_n"]:
                want[r["k"]] = "changed"
        assert dict(zip(got["key"], got["status"])) == want
