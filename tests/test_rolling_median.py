"""Unit tests for rolling_rows_median (ROWS-frame rolling median)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def reference(df: pd.DataFrame, k: int) -> pd.Series:
    """Per-key pandas rolling median in (ts, id) order, indexed by id."""
    out = {}
    for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        med = g["value"].rolling(k, min_periods=1).median()
        for i, m in zip(g["event_id"], med):
            out[i] = m
    return out


class TestRollingRowsMedian:
    def test_matches_reference(self, rd):
        from zonal_stats_toolkit_ray.stages.rolling import rolling_rows_median

        rng = np.random.default_rng(4)
        n = 3000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "user_id": rng.integers(0, 25, n),
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
                "value": rng.normal(0, 5, n).round(3),
            }
        )
        got = (
            rolling_rows_median(rd.from_pandas(df).repartition(9), k=10)
            .to_pandas()
            .set_index("event_id")["roll_med"]
        )
        want = reference(df, 10)
        assert len(got) == n
        for i in range(n):
            assert abs(got[i] - want[i]) < 1e-12, i

    def test_one_hot_key_spans_blocks(self, rd):
        """One user with 20k events over 16 blocks: every block boundary
        needs k−1 rows of context from preceding blocks."""
        from zonal_stats_toolkit_ray.stages.rolling import rolling_rows_median

        rng = np.random.default_rng(8)
        n = 20_000
        df = pd.DataFrame(
            {
                "event_id": rng.permutation(n),
                "user_id": np.zeros(n, dtype=np.int64),
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(np.arange(n), unit="s"),
                "value": rng.normal(0, 5, n).round(3),
            }
        )
        got = (
            rolling_rows_median(rd.from_pandas(df).repartition(16), k=25)
            .to_pandas()
            .set_index("event_id")["roll_med"]
        )
        want = reference(df, 25)
        bad = [i for i in want if abs(got[i] - want[i]) > 1e-12]
        assert not bad, bad[:5]

    def test_tiny_blocks_chain_context(self, rd):
        """Blocks smaller than k−1: the context walk must chain across
        several preceding blocks."""
        from zonal_stats_toolkit_ray.stages.rolling import rolling_rows_median

        n = 60
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "user_id": np.zeros(n, dtype=np.int64),
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(np.arange(n), unit="s"),
                "value": np.arange(n, dtype=np.float64),
            }
        )
        got = (
            rolling_rows_median(rd.from_pandas(df).repartition(30), k=15)
            .to_pandas()
            .set_index("event_id")["roll_med"]
        )
        want = reference(df, 15)
        for i in range(n):
            assert got[i] == want[i], i

    def test_k_one(self, rd):
        from zonal_stats_toolkit_ray.stages.rolling import rolling_rows_median

        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "user_id": [1, 1, 2],
                "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
                "value": [5.0, 7.0, 9.0],
            }
        )
        got = (
            rolling_rows_median(rd.from_pandas(df), k=1)
            .to_pandas()
            .sort_values("event_id")
        )
        assert got["roll_med"].tolist() == [5.0, 7.0, 9.0]
