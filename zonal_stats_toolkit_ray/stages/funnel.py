"""Funnel analysis: per-user ordered-subsequence matching (view → click →
purchase) as a DISTRIBUTED FOLD.

The classic sequential-state operator Ray Data has no primitive for: the
per-user stage depends on event ORDER, so neither groupby-aggregate
(orderless) nor windows (fixed frames) express it, and per-user
``map_groups`` puts a hot user on one worker.  Instead this uses the
composable-transition trick (the sessionize/pack shape, sandbox lesson
#24): range-sort by (user, ts, event_id) — Ray's range sort SPLITS a hot
user across blocks — then each block computes, per user-run, the full
transition VECTOR ``exit[s] = stage reached when entering at stage s``
(greedy earliest-match is optimal for subsequence matching, so transitions
compose exactly: ``exit_ab = exit_b ∘ exit_a``).  Only user×block×(K+1)
summary ints leave the blocks; the driver folds them in order.

Tie semantics: progress requires a STRICTLY greater (ts, event_id) — a
total order, so results are deterministic even with duplicate timestamps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _block_transitions(
    batch: pa.Table,
    *,
    steps: list[str],
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str = "event_type",
) -> pa.Table:
    """One sorted block → per user-run: (user, first ts, first id,
    exit_0..exit_K) where exit_s = stage after scanning this run entering
    at stage s.  Fully vectorized across users (per funnel step: one
    searchsorted over the type's position array)."""
    k = len(steps)
    n = len(batch)
    cols = [f"exit_{s}" for s in range(k + 1)]
    if n == 0:
        empty = {user_col: pa.array([], pa.int64()),
                 "_ts": pa.array([], pa.int64()),
                 "_id": pa.array([], pa.int64())}
        for c in cols:
            empty[c] = pa.array([], pa.int8())
        return pa.table(empty)
    users = batch[user_col].to_numpy(zero_copy_only=False)
    etype = batch.column(type_col).to_pandas().to_numpy()
    starts = np.flatnonzero(np.concatenate([[True], users[1:] != users[:-1]]))
    ends = np.concatenate([starts[1:], [n]])
    nu = starts.size
    # global sorted position arrays per funnel step type
    pos = [np.flatnonzero(etype == t) for t in steps]
    exits = np.empty((k + 1, nu), dtype=np.int8)
    exits[k] = k
    for s in range(k - 1, -1, -1):
        stage = np.full(nu, s, dtype=np.int8)
        cur = starts - 1  # last matched position; next match must be > cur
        alive = np.ones(nu, dtype=bool)
        for j in range(s, k):
            pj = pos[j]
            if pj.size == 0:
                alive[:] = False
                break
            idx = np.searchsorted(pj, cur + 1)
            ok = alive & (idx < pj.size)
            cand = np.where(ok, pj[np.minimum(idx, pj.size - 1)], n)
            ok &= cand < ends
            stage[ok] = j + 1
            cur = np.where(ok, cand, cur)
            alive = ok
        exits[s] = stage
    ts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    out = {
        user_col: pa.array(users[starts].astype(np.int64)),
        "_ts": pa.array(ts[starts]),
        "_id": pa.array(ids[starts]),
    }
    for s in range(k + 1):
        out[cols[s]] = pa.array(exits[s])
    return pa.table(out)


def funnel_stages(
    ds,
    *,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Per-user funnel stage → DataFrame(user, stage) — stage = length of
    the longest PREFIX of ``steps`` appearing as an ordered subsequence of
    the user's events (order = strictly increasing (ts, id)).

    Range sort → per-block transition vectors → driver fold of the
    user×block summary frame (transitions compose associatively, so a tree
    combine is available above any driver threshold; at user×block scale
    the summary is already tiny)."""
    k = len(steps)
    summaries = (
        ds.sort([user_col, ts_col, id_col])
        .map_batches(
            _block_transitions,
            fn_kwargs=dict(
                steps=steps, user_col=user_col, ts_col=ts_col,
                id_col=id_col, type_col=type_col,
            ),
            batch_size=None,  # batch == sorted block: runs are block-contiguous
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    summaries = summaries.sort_values([user_col, "_ts", "_id"], kind="stable")
    exit_mat = summaries[[f"exit_{s}" for s in range(k + 1)]].to_numpy(dtype=np.int64)
    users = summaries[user_col].to_numpy()
    out_users, out_stage = [], []
    state = 0
    for i in range(len(summaries)):  # O(users × blocks) driver fold
        if i == 0 or users[i] != users[i - 1]:
            if i > 0:
                out_users.append(users[i - 1])
                out_stage.append(state)
            state = 0
        state = exit_mat[i, state]
    if len(summaries):
        out_users.append(users[-1])
        out_stage.append(state)
    return (
        pd.DataFrame({user_col: np.asarray(out_users, dtype=np.int64),
                      "stage": np.asarray(out_stage, dtype=np.int64)})
        .sort_values(user_col)
        .reset_index(drop=True)
    )
