"""Distributed SQL window functions: per-key ROW_NUMBER / RANK /
PERCENT_RANK / running SUM.

Ray Data has no window-function operator; the engine supplies the sorted
per-partition ranks the same way sessionize/asof/pack do — the range
sort is the one all-to-all, everything after is block-local:

1. ``sort([key, value, id])`` — a hot key SPLITS across blocks (range
   partitioner, sandbox lesson #24), so no per-key materialization ever
   happens;
2. one ``batch_size=None`` summary pass emits per-(block, key-run) stitch
   facts: row count, value sum, head/tail values, the tail's tied-row
   count, and the block's first id (the block's identity — ids are the
   unique sort tiebreak);
3. the driver walks each key's runs in global order (O(runs), runs ≤
   blocks × keys-per-block-boundary) accumulating prefix row counts,
   prefix value sums, partition totals, and the count of earlier rows
   TIED with a run's head value — the only cross-block fact RANK needs;
   ties chain across any number of single-valued runs;
4. a second ``batch_size=None`` pass re-derives the same runs locally,
   computes all four outputs fully vectorized (run/value group boundaries
   by diff+cumsum, no Python loop over rows or runs), and adds the
   broadcast per-run bases.

Exact SQL semantics: ROW_NUMBER orders by (value, id); RANK /
PERCENT_RANK order by value alone (ties share the min rank,
pct = (rank−1)/(n−1), 0 for single-row partitions); the running sum is
the ROWS UNBOUNDED PRECEDING..CURRENT ROW frame over (value, id) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _np(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _ntile(row_num: np.ndarray, n: np.ndarray, t: int) -> np.ndarray:
    """SQL NTILE(t) from 1-based row_num and partition size n: the first
    n % t buckets hold n//t + 1 rows, the rest n//t."""
    q, r = np.divmod(n, t)
    big = (q + 1) * r  # rows covered by the oversized buckets
    in_big = row_num <= big
    return np.where(
        in_big,
        (row_num - 1) // np.maximum(q + 1, 1),
        r + (row_num - 1 - big) // np.maximum(q, 1),
    ).astype(np.int64) + 1


_SUMMARY_FIELDS = [
    ("first_id", pa.int64()),
    ("run_first_id", pa.int64()),
    ("run_idx", pa.int64()),
    ("count", pa.int64()),
    ("sum_v", pa.float64()),
    ("head_v", pa.float64()),
    ("tail_v", pa.float64()),
    ("tail_eq", pa.int64()),
]


def window_ranks(
    ds,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    ntile: int = 4,
):
    """→ Dataset(id, key, row_num, rnk, pct_rank, run_sum, ntile) per the
    module docstring.  ``value_col`` must be non-null and finite;
    ``id_col`` must be unique (it is the deterministic sort tiebreak).

    NTILE(``ntile``) is SQL-exact over the (value, id) row order: the
    first n%t buckets get n//t+1 rows — a pure elementwise function of
    (row_num, partition size), so it adds zero shuffle or stitch state."""
    import ray

    slim = ds.select_columns([key_col, value_col, id_col])
    srt = slim.sort([key_col, value_col, id_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        schema = pa.schema([("key", b[key_col].type)] + _SUMMARY_FIELDS)
        if len(b) == 0:
            return schema.empty_table()
        kcol = b[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        codes = np.asarray(kcol.dictionary_encode().indices, dtype=np.int64)
        vals = _np(b[value_col]).astype(np.float64)
        ids = _np(b[id_col]).astype(np.int64)
        new_run = np.concatenate([[True], codes[1:] != codes[:-1]])
        starts = np.flatnonzero(new_run)
        ends = np.concatenate([starts[1:], [len(b)]])
        cs = np.concatenate([[0.0], np.cumsum(vals)])
        sums = cs[ends] - cs[starts]
        # tail tie count per run: rows at the run end tied with the last
        # value — distance from the run end back to the first row of the
        # trailing (run, value) group
        new_vg = np.concatenate(
            [[True], (codes[1:] != codes[:-1]) | (vals[1:] != vals[:-1])]
        )
        vg_first = np.flatnonzero(new_vg)[np.cumsum(new_vg) - 1]
        tail_eq = (ends - 1) - vg_first[ends - 1] + 1
        return pa.table(
            {
                "key": kcol.take(pa.array(starts)),
                "first_id": pa.array(np.full(starts.size, ids[0]), pa.int64()),
                "run_first_id": pa.array(ids[starts], pa.int64()),
                "run_idx": pa.array(np.arange(starts.size), pa.int64()),
                "count": pa.array(ends - starts, pa.int64()),
                "sum_v": pa.array(sums, pa.float64()),
                "head_v": pa.array(vals[starts], pa.float64()),
                "tail_v": pa.array(vals[ends - 1], pa.float64()),
                "tail_eq": pa.array(tail_eq, pa.int64()),
            },
            schema=schema,
        )

    summ = (
        srt.map_batches(summary, batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )
    if len(summ) == 0:
        empty = {
            id_col: pd.Series(dtype="int64"),
            key_col: pd.Series(dtype="object"),
            "row_num": pd.Series(dtype="int64"),
            "rnk": pd.Series(dtype="int64"),
            "pct_rank": pd.Series(dtype="float64"),
            "run_sum": pd.Series(dtype="float64"),
            "ntile": pd.Series(dtype="int64"),
        }
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(empty))

    # global run order within a key: (head value, head row id) — for a tie
    # spanning a block edge the two runs' head rows share the value, and
    # the sort tiebreak (the row id) orders them exactly as the global
    # sort did.  The BLOCK first_id cannot do this (it belongs to a
    # different key's row whenever the block opens mid-key).
    summ = summ.sort_values(
        ["key", "head_v", "run_first_id"], kind="stable"
    ).reset_index(drop=True)

    n = len(summ)
    prefix_cnt = np.zeros(n, dtype=np.int64)
    prefix_sum = np.zeros(n, dtype=np.float64)
    prefix_eq = np.zeros(n, dtype=np.int64)
    key_total = np.zeros(n, dtype=np.int64)
    keys_arr = summ["key"].to_numpy()
    head_v = summ["head_v"].to_numpy()
    tail_v = summ["tail_v"].to_numpy()
    cnt = summ["count"].to_numpy()
    sum_v = summ["sum_v"].to_numpy()
    tail_eq = summ["tail_eq"].to_numpy()

    i = 0
    while i < n:
        j = i
        cum_c, cum_s = 0, 0.0
        chain_val, chain_eq = None, 0
        while j < n and keys_arr[j] == keys_arr[i]:
            prefix_cnt[j] = cum_c
            prefix_sum[j] = cum_s
            prefix_eq[j] = chain_eq if chain_val == head_v[j] else 0
            if chain_val == tail_v[j] and tail_eq[j] == cnt[j]:
                chain_eq += int(cnt[j])
            else:
                chain_val, chain_eq = tail_v[j], int(tail_eq[j])
            cum_c += int(cnt[j])
            cum_s += float(sum_v[j])
            j += 1
        key_total[i:j] = cum_c
        i = j

    # per-block lookup: run bases in LOCAL run order
    by_block: dict[int, np.ndarray] = {}
    order = np.lexsort((summ["run_idx"].to_numpy(), summ["first_id"].to_numpy()))
    fid = summ["first_id"].to_numpy()[order]
    packed = np.stack(
        [
            prefix_cnt[order].astype(np.float64),
            prefix_eq[order].astype(np.float64),
            prefix_sum[order],
            key_total[order].astype(np.float64),
        ],
        axis=1,
    )
    starts = np.flatnonzero(np.concatenate([[True], fid[1:] != fid[:-1]]))
    ends = np.concatenate([starts[1:], [fid.size]])
    for s, e in zip(starts, ends):
        by_block[int(fid[s])] = packed[s:e]
    ref = ray.put(by_block)

    def ranks(b: pa.Table, *, _r=ref) -> pa.Table:
        out_schema = pa.schema(
            [
                (id_col, pa.int64()),
                (key_col, b[key_col].type),
                ("row_num", pa.int64()),
                ("rnk", pa.int64()),
                ("pct_rank", pa.float64()),
                ("run_sum", pa.float64()),
                ("ntile", pa.int64()),
            ]
        )
        if len(b) == 0:
            return out_schema.empty_table()
        lut = ray.get(_r)
        kcol = b[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        codes = np.asarray(kcol.dictionary_encode().indices, dtype=np.int64)
        vals = _np(b[value_col]).astype(np.float64)
        ids = _np(b[id_col]).astype(np.int64)
        bases = lut[int(ids[0])]
        new_run = np.concatenate([[True], codes[1:] != codes[:-1]])
        run_of = np.cumsum(new_run) - 1
        run_start = np.flatnonzero(new_run)
        idx = np.arange(len(b))
        local_rn = idx - run_start[run_of]
        new_vg = np.concatenate(
            [[True], (codes[1:] != codes[:-1]) | (vals[1:] != vals[:-1])]
        )
        vg_first = np.flatnonzero(new_vg)[np.cumsum(new_vg) - 1]
        local_lt = vg_first - run_start[run_of]
        cs = np.cumsum(vals)
        run_cs_base = cs[run_start] - vals[run_start]
        p_cnt = bases[run_of, 0].astype(np.int64)
        p_eq = bases[run_of, 1].astype(np.int64)
        p_sum = bases[run_of, 2]
        n_k = bases[run_of, 3]
        at_head = vals == vals[run_start][run_of]
        rnk = p_cnt - np.where(at_head, p_eq, 0) + local_lt + 1
        row_num = p_cnt + local_rn + 1
        pct = np.where(n_k > 1, (rnk - 1) / np.maximum(n_k - 1, 1), 0.0)
        run_sum = p_sum + (cs - run_cs_base[run_of])
        nt = _ntile(row_num, n_k.astype(np.int64), ntile)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                key_col: kcol,
                "row_num": pa.array(row_num, pa.int64()),
                "rnk": pa.array(rnk, pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
                "run_sum": pa.array(run_sum, pa.float64()),
                "ntile": pa.array(nt, pa.int64()),
            },
            schema=out_schema,
        )

    return srt.map_batches(ranks, batch_size=None, batch_format="pyarrow")


def window_ranks_ref(
    ds,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    ntile: int = 4,
) -> pd.DataFrame:
    """Per-key map_groups reference (O(key) materialization) for tests."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col, id_col], kind="stable")
        v = g[value_col].to_numpy(dtype=np.float64)
        nk = len(g)
        new_v = np.concatenate([[True], v[1:] != v[:-1]])
        first = np.flatnonzero(new_v)[np.cumsum(new_v) - 1]
        rnk = first + 1
        row_num = np.arange(1, nk + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "row_num": row_num,
                "rnk": rnk.astype(np.int64),
                "pct_rank": (rnk - 1) / max(nk - 1, 1) if nk > 1
                else np.zeros(nk),
                "run_sum": np.cumsum(v),
                "ntile": _ntile(row_num, np.full(nk, nk, dtype=np.int64), ntile),
            }
        )

    return (
        ds.select_columns([key_col, value_col, id_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
        .to_pandas()
    )
