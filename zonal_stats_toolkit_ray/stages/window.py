"""Windowed aggregates over the timestamped ``events`` stream table.

Ray Data has no event-time windowing; the engine implements the standard
batch shapes (ray_guide streaming section): tumbling / hopping windows as a
vectorized timestamp-truncate ``map_batches`` + partial-aggregate →
groupby-merge (same two-level reduce as the zonal path), and session
windows as per-key ``map_groups`` over ts-sorted groups.  Oracle SQL:
``date_trunc`` / window functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_batch(
    batch: pa.Table,
    *,
    ts_col: str = "ts",
    every: str = "hour",
) -> pa.Table:
    """Adds ``window_start`` = ts truncated to the window (calendar unit)."""
    w = pc.floor_temporal(batch[ts_col], unit=every)
    return batch.append_column("window_start", w)


def windowed_aggregate(
    ds,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    every: str = "hour",
) -> pd.DataFrame:
    """Tumbling-window grouped aggregate: (key, window) → n_events,
    sum_value, min_value, max_value.  Partial per batch, tiny merge shuffle."""

    def partials(b: pa.Table) -> pa.Table:
        b = tumbling_window_batch(b, ts_col=ts_col, every=every)
        df = pd.DataFrame(
            {
                "key": b[key_col].to_pandas(),
                "w": b["window_start"].to_pandas(),
                "v": b[value_col].to_pandas(),
            }
        )
        g = df.groupby(["key", "w"], sort=False).agg(
            n_events=("v", "size"),
            sum_value=("v", "sum"),
            min_value=("v", "min"),
            max_value=("v", "max"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    p = ds.map_batches(partials, batch_format="pyarrow")
    # final merge of the tiny partials frame on the driver (one row per
    # (key, window, block) — a distributed shuffle's fixed cost dwarfs it)
    pdf = p.to_pandas()
    out = (
        pdf.groupby(["key", "w"], sort=False)
        .agg(
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        )
        .reset_index()
        .rename(columns={"key": key_col, "w": "window_start"})
    )
    return out.sort_values([key_col, "window_start"]).reset_index(drop=True)


def hopping_aggregate(
    ds,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    length_s: int = 3600,
    hop_s: int = 1800,
) -> pd.DataFrame:
    """HOPPING (sliding) window grouped aggregate: windows of ``length_s``
    starting every ``hop_s`` (overlapping when hop < length), keyed by
    epoch-second window_start.  Each event belongs to exactly
    ``length_s // hop_s`` windows, so the batch stage replicates rows that
    many times with vectorized arithmetic (np.repeat + per-copy offsets),
    partial-aggregates in-batch, and the tiny (key, window, block) partial
    rows merge on the driver — same two-level shape as the tumbling path.
    Oracle SQL: cross join against ``unnest(range(length/hop))``.
    """
    if length_s % hop_s != 0:
        raise ValueError("length_s must be a multiple of hop_s")
    k = length_s // hop_s

    def partials(b: pa.Table) -> pa.Table:
        # normalize the timestamp unit explicitly (same rule as
        # session_windows): an Arrow version surfacing timestamp[ns] would
        # otherwise shift every window start by 1000×
        es = (
            pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
            // 1_000_000
        )  # → epoch seconds
        base = (es // hop_s) * hop_s
        ws = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_s, es.size
        )
        # dictionary-encode the (low-cardinality) key so the hot groupby
        # runs on machine ints, not per-batch Python-object arrays
        kcol = b[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = kcol.dictionary_encode()
        codes = np.repeat(
            np.asarray(enc.indices, dtype=np.int64), k
        )
        vals = np.repeat(
            b[value_col].to_numpy(zero_copy_only=False).astype(np.float64), k
        )
        df = pd.DataFrame({"kc": codes, "ws": ws, "v": vals})
        g = (
            df.groupby(["kc", "ws"], sort=False)
            .agg(n_events=("v", "size"), sum_value=("v", "sum"))
            .reset_index()
        )
        kdict = enc.dictionary.to_pylist()  # tiny: one entry per distinct key
        g["key"] = [kdict[i] for i in g.pop("kc")]
        return pa.Table.from_pandas(
            g[["key", "ws", "n_events", "sum_value"]], preserve_index=False
        )

    p = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    out = (
        p.groupby(["key", "ws"], sort=False)
        .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        .reset_index()
        .rename(columns={"key": key_col, "ws": "window_start"})
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values([key_col, "window_start"]).reset_index(drop=True)


def session_windows(
    ds,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: float = 1800.0,
):
    """Session windowing per key: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``.  Ordering assumption: events of
    one key fit in one group and are sorted by ts inside ``map_groups``.

    Returns the per-session **Dataset** (round-2: per-session output is
    corpus-sized — one row per session — so it must stream; callers
    ``to_pandas()`` only at verification scale)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        # normalize the unit explicitly: the arrow→pandas dtype may be
        # datetime64[us] or [ns] depending on versions, and a raw int64 view
        # would be off by 1000× in one of them
        ts = (
            g[ts_col].to_numpy().astype("datetime64[us]").astype("int64") / 1e6
        )  # seconds
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap_seconds
        sid = np.cumsum(new)
        out = (
            pd.DataFrame({"sid": sid, "ts": ts})
            .groupby("sid")
            .agg(n_events=("ts", "size"), start=("ts", "min"), end=("ts", "max"))
            .reset_index(drop=True)
        )
        out[key_col] = g[key_col].iloc[0]
        out["duration_s"] = out["end"] - out["start"]
        return out[[key_col, "n_events", "start", "end", "duration_s"]]

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
