"""Funnel distributed fold: brute-force equivalence, hot-key splitting,
duplicate timestamps, and partitioning independence."""

import numpy as np
import pandas as pd
import pytest

from zonal_stats_toolkit_ray.stages.funnel import funnel_stages


def _brute(df: pd.DataFrame, steps: list[str]) -> pd.DataFrame:
    out = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        stage = 0
        for t in g["event_type"]:
            if stage < len(steps) and t == steps[stage]:
                stage += 1
        out.append((uid, stage))
    return (
        pd.DataFrame(out, columns=["user_id", "stage"])
        .astype({"user_id": "int64", "stage": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def _events(n, n_users, seed, types=("view", "click", "purchase", "noise")):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, n) * 1_000_000, unit="us"
            ),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(types, n),
        }
    )


STEPS = ["view", "click", "purchase"]


class TestFunnel:
    @pytest.mark.parametrize("parts", [1, 7])
    def test_matches_bruteforce(self, ray_session, parts):
        import ray.data as rd

        df = _events(4000, 60, seed=5)
        got = funnel_stages(rd.from_pandas(df).repartition(parts), steps=STEPS)
        pd.testing.assert_frame_equal(got, _brute(df, STEPS))

    def test_one_hot_user_splits_across_blocks(self, ray_session):
        import ray.data as rd

        # one user owns 95% of events: the range sort must split it across
        # blocks and the per-block transition vectors must still compose
        rng = np.random.default_rng(9)
        n = 50_000
        df = pd.DataFrame(
            {
                "user_id": np.where(rng.random(n) < 0.95, 7, rng.integers(0, 5, n)).astype(np.int64),
                "ts": pd.to_datetime(np.arange(n, dtype=np.int64) * 1_000, unit="us"),
                "event_id": np.arange(n, dtype=np.int64),
                "event_type": rng.choice(["view", "click", "purchase", "noise"], n),
            }
        )
        got = funnel_stages(rd.from_pandas(df).repartition(16), steps=STEPS)
        pd.testing.assert_frame_equal(got, _brute(df, STEPS))

    def test_duplicate_timestamps_deterministic(self, ray_session):
        import ray.data as rd

        # all events share one ts: order falls back to event_id entirely
        df = pd.DataFrame(
            {
                "user_id": np.int64([1, 1, 1, 2, 2, 2]),
                "ts": pd.to_datetime([0] * 6, unit="us"),
                "event_id": np.int64([3, 2, 1, 1, 2, 3]),
                # user 1 by event_id order: purchase,click,view -> stage 1
                # user 2 by event_id order: view,click,purchase -> stage 3
                "event_type": ["view", "click", "purchase",
                               "view", "click", "purchase"],
            }
        )
        got = funnel_stages(rd.from_pandas(df).repartition(3), steps=STEPS)
        assert got.set_index("user_id")["stage"].to_dict() == {1: 1, 2: 3}

    def test_missing_step_type_everywhere(self, ray_session):
        import ray.data as rd

        df = _events(500, 10, seed=2, types=("view", "click", "noise"))
        got = funnel_stages(rd.from_pandas(df).repartition(4), steps=STEPS)
        assert got["stage"].max() <= 2
        pd.testing.assert_frame_equal(got, _brute(df, STEPS))
