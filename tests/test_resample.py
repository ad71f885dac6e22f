"""Unit tests for resample_daily_locf."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


class TestResampleLocf:
    def test_gaps_filled_forward(self, rd):
        from zonal_stats_toolkit_ray.stages.resample import resample_daily_locf

        day = 86400
        rows = [
            # user 1: days 0, 3 (gap 1-2 carries day-0 close), two events
            # on day 0 (later ts wins)
            (1, 1, 0, 10.0),
            (2, 1, 3600, 11.0),
            (3, 1, 3 * day, 30.0),
            # user 2: single day
            (4, 2, 5 * day, 50.0),
        ]
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "sec", "value"])
        df["ts"] = pd.Timestamp("1970-01-01") + pd.to_timedelta(df["sec"], unit="s")
        got = resample_daily_locf(rd.from_pandas(df.drop(columns="sec")))
        u1 = got[got["user_id"] == 1]
        assert u1["day"].tolist() == [0, 1, 2, 3]
        assert u1["close"].tolist() == [11.0, 11.0, 11.0, 30.0]
        u2 = got[got["user_id"] == 2]
        assert u2["day"].tolist() == [5] and u2["close"].tolist() == [50.0]

    def test_duplicate_ts_id_tiebreak(self, rd):
        from zonal_stats_toolkit_ray.stages.resample import resample_daily_locf

        ts = pd.Timestamp("2024-01-01")
        df = pd.DataFrame(
            {
                "event_id": [9, 2],
                "user_id": [1, 1],
                "ts": [ts, ts],
                "value": [100.0, 200.0],
            }
        )
        got = resample_daily_locf(rd.from_pandas(df))
        assert got["close"].tolist() == [100.0]  # id 9 is last
