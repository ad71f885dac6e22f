"""Relational join operators beyond the spatial join: broadcast semi/anti
joins and the per-key as-of join.

Shapes (ray_guide "Joins and lookups"):
* semi/anti — broadcast the (small) key set once via ``ray.put``; filter
  inside ``map_batches`` with a vectorized membership test.  No shuffle.
* as-of — sort both sides by (key, ts) within key groups and apply
  ``pd.merge_asof`` per group in ``map_groups``; ordering assumption: one
  key's rows fit in one group.  Oracle: DuckDB ``ASOF JOIN``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _resolve_ref(obj):
    try:
        import ray

        if isinstance(obj, ray.ObjectRef):
            return ray.get(obj)
    except ImportError:
        pass
    return obj


def semi_join_batch(
    batch: pa.Table, keys_ref, key_col: str, *, anti: bool = False
) -> pa.Table:
    """Keep rows whose ``key_col`` is (semi) / is not (anti) in the
    broadcast key set — vectorized ``pc.is_in`` per batch."""
    keys = _resolve_ref(keys_ref)
    arr = keys if isinstance(keys, pa.Array) else pa.array(np.asarray(keys))
    m = pc.is_in(batch[key_col], arr)
    if anti:
        m = pc.invert(m)
    return batch.filter(m)


def semi_join(ds, keys, key_col: str, *, anti: bool = False, broadcast: bool = True):
    """Dataset semi/anti join against a small key collection."""
    ref = keys
    if broadcast:
        try:
            import ray

            ref = ray.put(keys)
        except ImportError:
            pass
    return ds.map_batches(
        semi_join_batch,
        fn_kwargs={"keys_ref": ref, "key_col": key_col, "anti": anti},
        batch_format="pyarrow",
    )


def hash_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = 32,
):
    """Large-side × large-side HASH-PARTITIONED join (round-2: the missing
    path — everything else here is broadcast-small-side).  Both datasets
    hash-shuffle on the key into ``num_partitions`` buckets and matching
    buckets join pairwise — Ray Data's native ``Dataset.join`` operator, so
    the streaming executor pipelines and spills the exchange.

    Scale note: ``num_partitions`` bounds per-bucket memory (rows/partition
    ≈ N/num_partitions must fit a worker); size it to the cluster.  For
    skewed keys prefer pre-aggregating the hot side or salting before this
    join — a hash join cannot split one hot key across buckets."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=((right_on or on),),
    )


def asof_join_self(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_filter_col: str = "event_type",
    right_filter_value: str = "click",
    value_col: str = "value",
    out_col: str = "last_click_value",
):
    """Per-key as-of SELF join: for every row, attach ``value_col`` of the
    most recent row (same key, ts ≤ this row's ts) matching the filter.

    Implemented as ``groupby(key).map_groups`` with ``pd.merge_asof`` over
    the ts-sorted group (backward search, allow_exact_matches=True) — the
    canonical Ray Data shape for as-of/range joins.  Oracle SQL: DuckDB
    ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts``.

    Returns the joined **Dataset** (round-2 fix: the join output is
    corpus-sized, so it must stream — callers aggregate distributedly or
    write it out, never ``to_pandas`` the whole thing)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        right = g[g[right_filter_col] == right_filter_value][[ts_col, value_col]]
        right = right.rename(columns={value_col: out_col})
        out = pd.merge_asof(
            g,
            right,
            on=ts_col,
            direction="backward",
            allow_exact_matches=True,
        )
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
