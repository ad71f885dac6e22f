"""Per-group top-k (heavy-hitter extraction) — round-3 operator.

The classic training-data shape: "highest-quality N documents per
language", "top N events per type".  Ray Data has ``Dataset.sort`` +
``limit`` (global) but no grouped top-k; a full groupby-sort would
shuffle the corpus.  Instead each batch keeps only its LOCAL top-k per
group (vectorized lexsort, no Python row loop), so the driver merges at
most #blocks × #groups × k slim rows — the same local-top-k → tiny-merge
shape as knn_brute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def topk_per_group_batch(
    batch: pa.Table,
    *,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int,
) -> pa.Table:
    """Local top-k rows per key within one batch: sort by (key, -value,
    id) with one lexsort, then keep the first k of each key run."""
    kcol = batch[key_col]
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    enc = kcol.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(batch) == 0:
        return batch
    order = np.lexsort((ids, -vals, codes))
    sc = codes[order]
    # rank within each key run (runs are contiguous after the sort)
    starts = np.flatnonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))
    run_of = np.searchsorted(starts, np.arange(sc.size), side="right") - 1
    rank = np.arange(sc.size) - starts[run_of]
    keep = order[rank < k]
    return batch.take(pa.array(np.sort(keep)))


def topk_per_group(
    ds,
    *,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 10,
) -> pd.DataFrame:
    """Exact grouped top-k → (key, rank, id, value), rank 1-based, ties
    broken by ascending id (deterministic).  Local top-k per batch →
    driver merge of ≤ blocks × groups × k rows."""
    local = ds.map_batches(
        topk_per_group_batch,
        fn_kwargs=dict(key_col=key_col, value_col=value_col, id_col=id_col, k=k),
        batch_format="pyarrow",
    ).to_pandas()
    out = []
    for key, g in local.groupby(key_col, sort=True):
        g = g.sort_values([value_col, id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g[[key_col, "rank", id_col, value_col]])
    if not out:
        return pd.DataFrame(columns=[key_col, "rank", id_col, value_col])
    return pd.concat(out, ignore_index=True)
