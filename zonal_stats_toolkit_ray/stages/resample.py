"""Calendar resampling with last-observation-carried-forward (LOCF) —
the timeseries gap-fill pass: one row per (key, calendar day) from each
key's first to last active day, carrying the day's LAST value forward
over inactive days.

Shape: the per-(key, day) closing value comes from the OHLC argmin/
argmax partial kernel (stages/ohlc.py — associative, no sort, events
never shuffle); the calendar grid and forward fill then run on the
keys × days UNIVERSE frame, which is the op's own output size — the
driver holds nothing larger than what it must return.  For outputs too
big for one machine, partition the keys upstream and run per partition
(the pages_job checkpoint shape); the expensive part — events → daily —
is distributed either way.

Reference parity: none in runner.py — timeseries surface (SURVEY §2
graft extensions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .ohlc import ohlc


def resample_daily_locf(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    bucket_s: int = 86_400,
) -> pd.DataFrame:
    """→ DataFrame(key, day, close) — ``day`` is ``epoch_us //
    (bucket_s·10⁶)``; ``close`` is the last value of the latest active
    day ≤ that day (ties broken by ``id_col``, SQL ROW_NUMBER parity)."""
    daily = ohlc(
        ds,
        key_col=key_col,
        ts_col=ts_col,
        id_col=id_col,
        value_col=value_col,
        bucket_s=bucket_s,
    )[[key_col, "bucket", "close"]]
    frames = []
    for k, g in daily.groupby(key_col, sort=True):
        days = np.arange(g["bucket"].min(), g["bucket"].max() + 1, dtype=np.int64)
        # index of the latest active day ≤ each grid day
        idx = np.searchsorted(g["bucket"].to_numpy(), days, side="right") - 1
        frames.append(
            pd.DataFrame(
                {
                    key_col: k,
                    "day": days,
                    "close": g["close"].to_numpy()[idx],
                }
            )
        )
    if not frames:
        return pd.DataFrame({key_col: [], "day": [], "close": []})
    return pd.concat(frames, ignore_index=True)
