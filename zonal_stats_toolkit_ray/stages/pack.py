"""Sequence packing for training-data preparation, built on a distributed
prefix scan — the operator that turns a curated corpus into fixed-budget
training sequences (the "pack documents into 2k/4k/8k-token rows" step
every LM data pipeline runs last).

Packing rule (deterministic, streaming-friendly): documents are taken in
``order_col`` order; with ``cum_before`` = total size of all earlier docs,

    pack_id     = cum_before // budget
    pack_offset = cum_before %  budget

i.e. contiguous concatenation chunked at budget boundaries (a doc may
straddle two packs).  This is the scan-expressible form — greedy first-fit
("never split a doc") is a running RESET, which no window function and no
two-pass scan can express; the straddle-chunked form is what block-sparse
packing pipelines actually use, and it is exactly reproducible in SQL
(`SUM() OVER (ORDER BY ...)`), which gives the operator a full value
oracle.

The underlying :func:`attach_running_total` is the classic two-pass
distributed scan:

1. range-sort by ``order_col`` (the only shuffle; Ray's sort is the skew
   weapon — but order keys must be UNIQUE, asserted, because equal keys
   may split across block boundaries and would make block bases ambiguous);
2. one ``batch_size=None`` pass emits ``(min_key, total)`` per block —
   block-count-sized partials to the driver;
3. exclusive prefix over the block totals → per-block base offsets,
   broadcast once; a second ``batch_size=None`` pass adds
   ``base + in-block exclusive cumsum``.

``batch_size=None`` makes map_batches process whole blocks, so pass-2
batches are exactly pass-1 blocks and the base lookup (searchsorted on the
block min keys) is exact.  Driver traffic = O(blocks), never the corpus.

Reference parity: the reference toolkit has no ordering-sensitive
operators beyond output sort (``runner.py:981-997``); this is
training-data extension surface (SURVEY §2.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def attach_running_total(ds, *, size_col: str, order_col: str):
    """Adds ``cum_before`` (int64): the sum of ``size_col`` over all rows
    strictly before this row in ``order_col`` order.  Returns the dataset
    sorted by ``order_col``.  Requires unique order keys (asserted via the
    block summaries: overlapping block ranges → ValueError)."""
    import ray

    sorted_ds = ds.sort(order_col).materialize()

    def summary(b: pa.Table) -> pa.Table:
        keys = b[order_col].to_numpy(zero_copy_only=False)
        sizes = b[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(b) == 0:
            return pa.table(
                {
                    "min_key": pa.array([], pa.int64()),
                    "max_key": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                    "has_dup": pa.array([], pa.bool_()),
                }
            )
        return pa.table(
            {
                "min_key": pa.array([np.int64(keys.min())]),
                "max_key": pa.array([np.int64(keys.max())]),
                "total": pa.array([np.int64(sizes.sum())]),
                # keys arrive sorted → in-block duplicates are adjacent;
                # the cross-block case is the range-overlap check below
                "has_dup": pa.array([bool(np.any(keys[1:] == keys[:-1]))]),
            }
        )

    blocks = (
        sorted_ds.map_batches(summary, batch_size=None, batch_format="pyarrow")
        .to_pandas()
        .sort_values("min_key")
        .reset_index(drop=True)
    )
    mins = blocks["min_key"].to_numpy(np.int64)
    maxs = blocks["max_key"].to_numpy(np.int64)
    if np.any(mins[1:] <= maxs[:-1]) or blocks["has_dup"].any():
        raise ValueError(
            f"attach_running_total requires unique {order_col!r} keys: "
            "duplicates within or across sorted blocks"
        )
    bases = np.concatenate([[0], np.cumsum(blocks["total"].to_numpy(np.int64))[:-1]])
    ref = ray.put((mins, bases))

    def attach(b: pa.Table, _r=ref) -> pa.Table:
        if len(b) == 0:
            return b.append_column("cum_before", pa.array([], pa.int64()))
        m, ba = ray.get(_r)
        keys = b[order_col].to_numpy(zero_copy_only=False)
        sizes = b[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ba[np.searchsorted(m, np.int64(keys.min()), side="right") - 1]
        cum = base + np.concatenate([[0], np.cumsum(sizes)[:-1]])
        return b.append_column("cum_before", pa.array(cum.astype(np.int64)))

    return sorted_ds.map_batches(attach, batch_size=None, batch_format="pyarrow")


def pack_sequences(
    ds,
    *,
    budget: int,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Pack documents into fixed-``budget`` sequences in ``id_col`` order →
    Dataset ``(id, size, pack_id, pack_offset)`` (straddle-chunked rule,
    see module docstring).  One range-sort shuffle + two block-local
    passes; driver traffic is block-count-sized."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    with_cum = attach_running_total(ds, size_col=size_col, order_col=id_col)

    def finish(b: pa.Table) -> pa.Table:
        cum = b["cum_before"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                size_col: b[size_col],
                "pack_id": pa.array(cum // np.int64(budget)),
                "pack_offset": pa.array(cum % np.int64(budget)),
            }
        )

    return with_cum.map_batches(finish, batch_format="pyarrow")
