"""Cohort retention analysis over the events stream — the classic
product-analytics matrix (users grouped by first-activity week; how many
are still active k weeks later), and a stand-in for any
"first-seen bucket × activity bucket" rollup (crawl freshness, user
churn, domain re-visit patterns).

Ray-Data-first, integer week arithmetic (epoch seconds // 604800 — no
calendar semantics, so the SQL twin is exact by construction):

1. per-user cohort = MIN(week) via in-batch min partials → one slim
   hash aggregate (user-universe-sized, never event-sized rows);
2. events join their user's cohort with the dual-regime
   ``joins.hash_join`` (auto-broadcast under the threshold);
3. distinct (cohort, offset, user) via ``joins.distinct_rows`` (in-batch
   combiner before the shuffle), then the tiny (cohort, offset) count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .window import _ts_seconds

_WEEK_S = 604800


def _user_week_batch(batch: pa.Table, *, user_col: str, ts_col: str) -> pa.Table:
    ts = _ts_seconds(batch[ts_col])
    wk = (ts // _WEEK_S).astype(np.int64)
    return pa.table({user_col: batch[user_col], "wk": pa.array(wk)})


def cohort_retention(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """→ DataFrame(cohort_week, week_offset, n_users), cohort_week =
    epoch-week of the user's first event, n_users = distinct users of
    that cohort active at that offset (offset 0 row = cohort size)."""
    from ray.data.aggregate import Min
    from .joins import distinct_rows, hash_join

    weeks = ds.map_batches(
        _user_week_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(user_col=user_col, ts_col=ts_col),
    ).materialize()

    def min_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                user_col: t[user_col].to_pandas(),
                "wk": t["wk"].to_pandas(),
            }
        )
        g = df.groupby(user_col, sort=False)["wk"].min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cohorts = (
        weeks.map_batches(min_partial, batch_format="pyarrow")
        .repartition(4)
        .groupby(user_col)
        .aggregate(Min("wk", alias_name="cohort_week"))
    )
    joined = hash_join(weeks, cohorts, on=user_col, how="inner")

    def with_offset(t: pa.Table) -> pa.Table:
        wk = t["wk"].to_numpy(zero_copy_only=False).astype(np.int64)
        co = t["cohort_week"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cohort_week": pa.array(co),
                "week_offset": pa.array(wk - co),
                user_col: t[user_col],
            }
        )

    active = distinct_rows(
        joined.map_batches(with_offset, batch_format="pyarrow"),
        ["cohort_week", "week_offset", user_col],
    )

    def count_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "cohort_week": t["cohort_week"].to_pandas(),
                "week_offset": t["week_offset"].to_pandas(),
            }
        )
        g = (
            df.groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = active.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby(["cohort_week", "week_offset"], sort=True)["n_users"]
        .sum()
        .reset_index()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.reset_index(drop=True)


def weekly_growth(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_partitions: int = 4,
) -> pd.DataFrame:
    """Week-over-week deltas per key → DataFrame(key, week, total,
    prev_total, diff) — SQL ``LAG(total) OVER (PARTITION BY key ORDER BY
    week)`` over the weekly rollup, with ``diff = total − prev_total``
    (NULL on each key's first observed week).

    Shape: in-batch (key, epoch-week) integer-sum partials (values floor
    to int64, so every sum is exact) → one hash aggregate over the
    keys × weeks universe → the LAG runs on the universe-sized frame
    (bounded: weeks are calendar-bounded, keys are the reporting
    dimension).  Events themselves never shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        week = us // (7 * 86_400_000_000)
        x = np.floor(
            pc.cast(b[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                key_col: b[key_col],
                "week": pa.array(week, pa.int64()),
                "x": pa.array(x, pa.int64()),
            }
        )
        g = t.group_by([key_col, "week"]).aggregate([("x", "sum")])
        return g.rename_columns([key_col, "week", "x"])

    uni = (
        ds.map_batches(partials, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby([key_col, "week"])
        .aggregate(Sum("x", alias_name="total"))
        .to_pandas()  # keys × weeks universe
        .sort_values([key_col, "week"], kind="stable")
        .reset_index(drop=True)
    )
    prev = uni.groupby(key_col, sort=False)["total"].shift(1)
    out = pd.DataFrame(
        {
            key_col: uni[key_col],
            "week": uni["week"].astype(np.int64),
            "total": uni["total"].astype(np.int64),
            "prev_total": prev.astype(np.float64),
            "diff": (uni["total"] - prev).astype(np.float64),
        }
    )
    return out.reset_index(drop=True)
