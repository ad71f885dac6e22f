"""Unit tests for keyword-in-context extraction."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


class TestKwic:
    def test_positions_and_windows(self, rd):
        from zonal_stats_toolkit_ray.stages.text import kwic

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b KEY c d e",  # interior match (case folds)
                    "key x",  # match at doc start, short right side
                    "no match here",
                ],
            }
        )
        got = (
            kwic(rd.from_pandas(df).repartition(2), "key", window=2)
            .to_pandas()
            .sort_values(["doc_id", "pos"])
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [1, 2]
        assert got["pos"].tolist() == [3, 1]
        assert got["snippet"].tolist() == ["a b key c d", "key x"]

    def test_multiple_occurrences(self, rd):
        from zonal_stats_toolkit_ray.stages.text import kwic

        df = pd.DataFrame({"doc_id": [7], "text": "k a k b   k"})
        got = kwic(rd.from_pandas(df), "k", window=1).to_pandas()
        assert got["pos"].tolist() == [1, 3, 5]
        assert got["snippet"].tolist() == ["k a", "a k b", "b k"]
