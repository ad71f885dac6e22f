"""Per-key rolling (sliding) time-range aggregates over an event stream.

The feature-engineering shape ("events per user in the trailing hour")
the reference's grouped aggregations can't express: for every event row,
aggregate over ALL rows of the same key whose timestamp lies in
``[t − window, t]`` — value-interval semantics, identical to SQL's
``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW`` frame (both bounds
inclusive; tied timestamps are peers and always co-frame, so the result
is independent of tie order).

Distributed form (the scale path — no per-key materialization):

1. slim projection → ``sort([key, ts, id])`` — Ray's RANGE sort splits a
   hot key across blocks (sandbox lesson #24), so a 10^8-event bot user
   never lands on one worker;
2. one ``batch_size=None`` pass extracts each block's **boundary rows** —
   the only rows another block can need: the last key-run's trailing
   ``window`` of rows (backward context for later blocks) and the first
   run's leading tied-timestamp peers (forward peers for earlier blocks).
   Boundary volume is O(blocks × rows-per-window), never O(rows);
3. the boundary table broadcasts once via ``ray.put``; a second
   ``batch_size=None`` pass merges each block with the boundary rows of
   its edge keys (own rows excluded by id), then computes every window
   with two ``np.searchsorted`` calls over a run-packed int64 composite
   of microsecond timestamps — exact integer comparisons, so the window
   bounds match SQL's interval arithmetic bit-for-bit.

All arithmetic on timestamps is int64 microseconds; the composite packs
each key run into its own offset band (gap ≥ window + 2) so one global
searchsorted per block answers every row without Python-level run loops
and without the run_id × global-span product that would overflow int64.

Reference parity: the reference has no streaming/window operator at all
(runner.py aggregates whole zones); this is part of the training-data
pipeline surface (SURVEY §2 extensions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# telemetry for tests/audits: rows the driver collected in the last
# ewma_by_key carry chain (must stay O(blocks), never O(keys) or O(rows))
LAST_EWMA_STATS = {"summary_rows": 0, "blocks": 0}


def _ts_us(col) -> np.ndarray:
    """timestamp column → int64 epoch microseconds (explicit unit
    normalization — arrow may surface [us] or [ns] depending on version)."""
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )


def _combined(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _boundary_schema(key_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            ("__key", key_type),
            ("__ts_us", pa.int64()),
            ("__v", pa.float64()),
            ("__id", pa.int64()),
        ]
    )


def _window_sums(
    ts_us: np.ndarray,
    vals: np.ndarray,
    run_starts: np.ndarray,
    query_idx: np.ndarray,
    window_us: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Given rows sorted by (key-run, ts), per-run-packed composite window
    sums/counts for the rows at ``query_idx``.

    ``run_starts`` marks the first index of each key run.  Each run is
    packed into its own offset band with a gap > window so a single
    searchsorted over the whole block answers all queries and a query's
    ``t − window`` probe can never bleed into the previous run.
    """
    n = ts_us.size
    run_ends = np.concatenate([run_starts[1:], [n]])
    run_min = ts_us[run_starts]
    run_max = ts_us[run_ends - 1]
    span = (run_max - run_min).astype(np.int64)
    # offset band per run: previous bands + window + 2 of clearance
    bands = np.concatenate(
        [[0], np.cumsum(span + np.int64(window_us) + 2)[:-1]]
    )
    run_of = np.zeros(n, dtype=np.int64)
    run_of[run_starts[1:]] = 1
    run_of = np.cumsum(run_of)
    comp = ts_us - run_min[run_of] + bands[run_of]
    q_comp = comp[query_idx]
    hi = np.searchsorted(comp, q_comp, side="right")
    lo = np.searchsorted(comp, q_comp - np.int64(window_us), side="left")
    cs = np.concatenate([[0.0], np.cumsum(vals)])
    return (hi - lo).astype(np.int64), cs[hi] - cs[lo]


def rolling_window_stats(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_s: float = 3600.0,
    boundary_driver_threshold: int = 2_000_000,
):
    """→ Dataset(id, key, roll_n, roll_sum): per-row trailing-window count
    and sum over same-key rows with ts ∈ [t − window, t] (inclusive,
    tied-timestamp peers always included — SQL RANGE frame semantics).

    ``value_col`` must be finite (same contract as grouped top-k: NaN
    ordering under SQL frames is not replicated).

    Scale notes: the sort is the one all-to-all; both window passes are
    block-local.  The boundary table is O(blocks × window-density) and
    broadcasts once — ``boundary_driver_threshold`` guards the driver
    collect (raise it or widen blocks if a corpus has > 2M boundary rows;
    the bound is per-block, never per-key).
    """
    import ray
    import ray.data as rd

    window_us = int(round(float(window_s) * 1e6))

    slim = ds.select_columns([key_col, ts_col, value_col, id_col])
    srt = slim.sort([key_col, ts_col, id_col]).materialize()

    def boundary(b: pa.Table) -> pa.Table:
        kcol = _combined(b[key_col])
        if len(b) == 0:
            return _boundary_schema(kcol.type).empty_table()
        ts = _ts_us(b[ts_col])
        codes = np.asarray(kcol.dictionary_encode().indices, dtype=np.int64)
        ids = _combined(b[id_col]).to_numpy(zero_copy_only=False)
        vals = (
            _combined(b[value_col]).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        # trailing context: last key's rows within window of that key's max
        # ts — INCLUSIVE lower bound: a later block can hold a row tied with
        # ts[-1], whose RANGE frame [t − window, t] includes a row at exactly
        # ts[-1] − window (ADVICE r4: strict `>` dropped frame-edge rows when
        # a tied run straddles the block boundary)
        last_mask = codes == codes[-1]
        tail = last_mask & (ts >= ts[-1] - np.int64(window_us))
        # forward peers: first key's rows tied with the block's first ts
        head = (codes == codes[0]) & (ts == ts[0])
        keep = np.flatnonzero(tail | head)
        return pa.table(
            {
                "__key": kcol.take(pa.array(keep)),
                "__ts_us": pa.array(ts[keep], pa.int64()),
                "__v": pa.array(vals[keep], pa.float64()),
                "__id": pa.array(ids[keep].astype(np.int64), pa.int64()),
            },
            schema=_boundary_schema(kcol.type),
        )

    bnd = srt.map_batches(
        boundary, batch_size=None, batch_format="pyarrow"
    ).materialize()
    n_bnd = bnd.count()
    if n_bnd > boundary_driver_threshold:
        raise ValueError(
            f"boundary rows ({n_bnd}) exceed boundary_driver_threshold "
            f"({boundary_driver_threshold}); widen blocks or raise the "
            "threshold — the bound grows with blocks × window density, "
            "not with corpus size"
        )
    bdf = bnd.to_pandas()
    b_ref = ray.put(
        (
            bdf["__key"].to_numpy(),
            bdf["__ts_us"].to_numpy().astype(np.int64),
            bdf["__v"].to_numpy().astype(np.float64),
            bdf["__id"].to_numpy().astype(np.int64),
        )
    )

    def _out_schema(key_type: pa.DataType) -> pa.Schema:
        return pa.schema(
            [
                (id_col, pa.int64()),
                (key_col, key_type),
                ("roll_n", pa.int64()),
                ("roll_sum", pa.float64()),
            ]
        )

    def windows(b: pa.Table, *, _ref=b_ref) -> pa.Table:
        out_schema = _out_schema(b[key_col].type)
        if len(b) == 0:
            return out_schema.empty_table()
        bk, bts, bv, bid = ray.get(_ref)
        kcol = _combined(b[key_col])
        keys = kcol.to_numpy(zero_copy_only=False)
        ts = _ts_us(b[ts_col])
        ids = _combined(b[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = (
            _combined(b[value_col]).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        # context: boundary rows of this block's edge keys, minus own rows
        if bk.size:
            edge = np.flatnonzero((bk == keys[0]) | (bk == keys[-1]))
            ctx = edge[~np.isin(bid[edge], ids)]
        else:
            ctx = np.array([], dtype=np.int64)
        m_keys = np.concatenate([keys, bk[ctx]])
        m_ts = np.concatenate([ts, bts[ctx]])
        m_v = np.concatenate([vals, bv[ctx]])
        own = np.zeros(m_ts.size, dtype=bool)
        own[: ts.size] = True
        # total order (key, ts): tie order within equal ts is irrelevant to
        # the value-interval frame
        codes = np.asarray(
            pa.array(m_keys).dictionary_encode().indices, dtype=np.int64
        )
        order = np.lexsort((m_ts, codes))
        s_codes = codes[order]
        s_ts = m_ts[order]
        s_v = m_v[order]
        s_own = own[order]
        run_starts = np.flatnonzero(
            np.concatenate([[True], s_codes[1:] != s_codes[:-1]])
        )
        q_idx = np.flatnonzero(s_own)
        roll_n, roll_sum = _window_sums(s_ts, s_v, run_starts, q_idx, window_us)
        # map back to the block's original row order
        orig_pos = order[q_idx]  # position in the pre-sort merged arrays
        inv = np.empty(ts.size, dtype=np.int64)
        inv[orig_pos] = np.arange(q_idx.size)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                key_col: kcol,
                "roll_n": pa.array(roll_n[inv], pa.int64()),
                "roll_sum": pa.array(roll_sum[inv], pa.float64()),
            },
            schema=out_schema,
        )

    return srt.map_batches(windows, batch_size=None, batch_format="pyarrow")


def rolling_window_stats_ref(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_s: float = 3600.0,
) -> pd.DataFrame:
    """Reference form: per-key ``map_groups`` with the same int64-µs window
    kernel — O(key) materialization, used to pin the chunked form's
    equality in tests (and fine when no key is hot)."""
    window_us = int(round(float(window_s) * 1e6))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = np.asarray(g[ts_col]).astype("datetime64[us]").astype(np.int64)
        vals = g[value_col].to_numpy(dtype=np.float64)
        n, s = _window_sums(
            ts, vals, np.array([0], dtype=np.int64),
            np.arange(ts.size), window_us,
        )
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "roll_n": n,
                "roll_sum": s,
            }
        )

    return (
        ds.select_columns([key_col, ts_col, value_col, id_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
        .to_pandas()
    )


def ewma_by_key(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
):
    """Per-key exponentially weighted moving average (pandas
    ``ewm(adjust=False)`` / the streaming-feature recurrence
    ``y_i = α·x_i + (1−α)·y_{i−1}``, ``y_0 = x_0``) over (ts, id) order →
    Dataset(id, key, ewma) — round-5 operator.

    Distributed EXACT affine scan (the linear recurrence composes:
    ``y_end = S + P·c`` with ``P = (1−α)^n`` and S the zero-carry local
    scan), with the rolling.py head/tail boundary shape: a range sort
    splits hot keys across blocks; each block's INTERIOR key runs are
    self-contained (carry = own first x, since ``y_0 = x_0`` ⇔ carrying
    the first value itself), so only the FIRST and LAST run of each block
    export an (n, S, x_first) summary — O(blocks) rows, never O(keys).
    The driver chains carries across consecutive blocks of the same key
    (O(blocks) work), broadcasts {block → carry}, and one second pass
    computes every row as ``l_i + (1−α)^{i+1}·c`` with a vectorized
    zero-carry scan per run (float64 cumprod/cumsum — exact formulation,
    no Python row loops).

    Reference parity: no streaming operator exists in the reference
    (runner.py aggregates whole zones); SURVEY §2 extension family."""
    import ray

    a = float(alpha)
    q = 1.0 - a

    slim = ds.select_columns([key_col, ts_col, value_col, id_col])
    srt = slim.sort([key_col, ts_col, id_col]).materialize()

    def _run_bounds(b: pa.Table):
        kcol = _combined(b[key_col])
        codes = np.asarray(kcol.dictionary_encode().indices, dtype=np.int64)
        starts = np.flatnonzero(
            np.concatenate([[True], codes[1:] != codes[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(b)]])
        return kcol, starts, ends

    def _zero_scan(x: np.ndarray) -> np.ndarray:
        """l_i = α·x_i + q·l_{i−1}, l_{−1} = 0, vectorized:
        l_i = q^i · Σ_{j≤i} α·x_j / q^j  (rescaled cumsum — stable for
        block-sized n; q^i underflow ⇒ the carry term is 0 anyway)."""
        n = x.size
        if q <= 0.0:  # alpha == 1: y_i = x_i
            return a * x
        i = np.arange(n, dtype=np.float64)
        with np.errstate(over="ignore", under="ignore"):
            qi = q ** i
            s = np.cumsum(a * x / np.where(qi > 0, qi, 1.0))
            out = qi * s
        # q^i underflow (≈ i > 2000 at q=0.7) poisons the rescaling —
        # rerun as chunks sized so q^chunk stays comfortably normal (each
        # chunk restarts the scale at q^0 and carries the previous l)
        if qi[-1] == 0.0 or not np.all(np.isfinite(out)):
            step = max(1, min(512, int(-500.0 / np.log(q))))
            out = np.empty(n, dtype=np.float64)
            c = 0.0
            for s0 in range(0, n, step):
                e0 = min(n, s0 + step)
                seg = x[s0:e0]
                ii = np.arange(seg.size, dtype=np.float64)
                qi = q ** ii
                out[s0:e0] = qi * np.cumsum(a * seg / qi) + qi * q * c
                c = out[e0 - 1]
        return out

    def _summ_schema(key_type: pa.DataType) -> pa.Schema:
        return pa.schema(
            [
                ("blk_key", key_type),
                ("blk_ts", pa.int64()),
                ("blk_id", pa.int64()),
                ("pos", pa.string()),  # 'first' | 'last'
                ("ri", pa.int64()),  # run index within block (first==last ⇔ 1 run)
                ("key", key_type),
                ("n", pa.int64()),
                ("s_end", pa.float64()),
                ("x_first", pa.float64()),
            ]
        )

    def summaries(b: pa.Table) -> pa.Table:
        kcol = _combined(b[key_col])
        if len(b) == 0:
            return _summ_schema(kcol.type).empty_table()
        _, starts, ends = _run_bounds(b)
        ts = _ts_us(b[ts_col])
        ids = _combined(b[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        x = (
            _combined(b[value_col]).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        rows = {k: [] for k in ("pos_i", "pos", "ri", "n", "s_end", "x_first")}
        take = [(0, "first"), (len(starts) - 1, "last")]
        for ri, pos in take:
            s, e = starts[ri], ends[ri]
            l = _zero_scan(x[s:e])
            rows["pos_i"].append(s)
            rows["pos"].append(pos)
            rows["ri"].append(ri)
            rows["n"].append(e - s)
            rows["s_end"].append(float(l[-1]))
            rows["x_first"].append(float(x[s]))
        idx = pa.array(np.asarray(rows["pos_i"], np.int64))
        m = len(rows["pos"])
        return pa.table(
            {
                "blk_key": kcol.take(pa.array(np.zeros(m, np.int64))),
                "blk_ts": pa.array(np.full(m, ts[0]), pa.int64()),
                "blk_id": pa.array(np.full(m, ids[0]), pa.int64()),
                "pos": pa.array(rows["pos"], pa.string()),
                "ri": pa.array(rows["ri"], pa.int64()),
                "key": kcol.take(idx),
                "n": pa.array(rows["n"], pa.int64()),
                "s_end": pa.array(rows["s_end"], pa.float64()),
                "x_first": pa.array(rows["x_first"], pa.float64()),
            },
            schema=_summ_schema(kcol.type),
        )

    sm = srt.map_batches(
        summaries, batch_size=None, batch_format="pyarrow"
    ).to_pandas()  # O(blocks) rows: ≤ 2 per block
    LAST_EWMA_STATS["summary_rows"] = len(sm)
    LAST_EWMA_STATS["blocks"] = srt.num_blocks()
    # global block order = sort order of the block-identity tuple
    carries: dict = {}
    if len(sm):
        sm = sm.sort_values(
            ["blk_key", "blk_ts", "blk_id"], kind="stable"
        ).reset_index(drop=True)
        blocks = list(
            sm.groupby(["blk_key", "blk_ts", "blk_id"], sort=False)
        )
        prev_key = None
        prev_y_end = None
        for ident, g in blocks:
            first = g[g["pos"] == "first"].iloc[0]
            last = g[g["pos"] == "last"].iloc[0]
            # carry INTO this block's first run
            if prev_key is not None and first["key"] == prev_key:
                c_in = float(prev_y_end)
                carries[ident] = c_in
            else:
                c_in = float(first["x_first"])  # global run start: y_0 = x_0
            # y at the end of this block's LAST run: same run as the first
            # (single-run block) ⇒ chain the incoming carry through it,
            # else the last run starts inside this block (fresh y_0 = x_0)
            c_last = c_in if int(last["ri"]) == int(first["ri"]) else float(
                last["x_first"]
            )
            # y_end = l_{n−1} + q^n · c  (y_i = l_i + q^{i+1} c at i = n−1)
            prev_y_end = float(last["s_end"]) + (q ** int(last["n"])) * c_last
            prev_key = last["key"]
    import ray as _ray

    carry_ref = _ray.put(carries) if _ray.is_initialized() else carries

    def _out_schema(key_type: pa.DataType) -> pa.Schema:
        return pa.schema(
            [(id_col, pa.int64()), (key_col, key_type), ("ewma", pa.float64())]
        )

    def block_ewma(b: pa.Table, *, _ref=carry_ref) -> pa.Table:
        kcol = _combined(b[key_col])
        if len(b) == 0:
            return _out_schema(kcol.type).empty_table()
        cmap = _ref if isinstance(_ref, dict) else __import__("ray").get(_ref)
        _, starts, ends = _run_bounds(b)
        ts = _ts_us(b[ts_col])
        ids = _combined(b[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        x = (
            _combined(b[value_col]).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        keys_py = kcol.to_pylist()
        ident = (keys_py[0], int(ts[0]), int(ids[0]))
        out = np.empty(len(b), dtype=np.float64)
        for ri, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
            seg = x[s:e]
            l = _zero_scan(seg)
            if ri == 0 and ident in cmap:
                c = cmap[ident]
            else:
                c = seg[0]  # global run start: y_{-1} := x_0 gives y_0 = x_0
            i = np.arange(seg.size, dtype=np.float64)
            with np.errstate(under="ignore"):
                out[s:e] = l + (q ** (i + 1.0)) * c
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                key_col: kcol,
                "ewma": pa.array(out, pa.float64()),
            },
            schema=_out_schema(kcol.type),
        )

    return srt.map_batches(block_ewma, batch_size=None, batch_format="pyarrow")


def rolling_rows_median(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 10,
):
    """Per-key rolling MEDIAN over a ROWS frame — SQL's
    ``median(v) OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN k−1 PRECEDING AND CURRENT ROW)`` — → Dataset(id, key,
    roll_med).  ``value_col`` must be non-null; ``id_col`` unique (the
    deterministic tiebreak).

    Unlike the RANGE-frame sums above, a ROWS frame needs exactly the
    k−1 predecessor ROWS of each row's key, so the boundary context is
    even cheaper: every block exports its last min(k−1, len) rows; the
    driver chains, per block, the trailing same-key rows of PRECEDING
    blocks (walking back across blocks smaller than k−1) — O(blocks × k)
    rows total, whatever the key skew, because the range sort splits a
    hot key across blocks (sandbox lesson #24).  The second block-local
    pass prepends the context to the block's first key run and computes
    the rolling median per run with pandas' C kernel (mean-of-two-middles
    on even windows, the quantile_cont 0.5 convention DuckDB uses)."""
    import ray

    slim = ds.select_columns([key_col, ts_col, id_col, value_col])
    srt = slim.sort([key_col, ts_col, id_col]).materialize()

    def tail_schema(key_type: pa.DataType) -> pa.Schema:
        return pa.schema(
            [
                ("blk_key", key_type),
                ("blk_ts", pa.int64()),
                ("blk_id", pa.int64()),
                ("key", key_type),
                ("ts_us", pa.int64()),
                ("id", pa.int64()),
                ("v", pa.float64()),
                ("blk_len", pa.int64()),
            ]
        )

    def tails(b: pa.Table) -> pa.Table:
        kcol = _combined(b[key_col])
        if len(b) == 0:
            return tail_schema(kcol.type).empty_table()
        ts = _ts_us(b[ts_col])
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = (
            pc.cast(b[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        )
        m = min(k - 1, len(b)) if k > 1 else 0
        sl = slice(len(b) - m, len(b))
        n_rows = max(m, 1) if m else 0
        # always emit at least ONE row per block (m may be 0 when k == 1)
        # so the block-order census sees every block
        if m == 0:
            idx = [0]
            return pa.table(
                {
                    "blk_key": kcol.take(pa.array([0])),
                    "blk_ts": pa.array([ts[0]], pa.int64()),
                    "blk_id": pa.array([ids[0]], pa.int64()),
                    "key": kcol.take(pa.array([0])),
                    "ts_us": pa.array([ts[0]], pa.int64()),
                    "id": pa.array([ids[0]], pa.int64()),
                    "v": pa.array([np.nan], pa.float64()),
                    "blk_len": pa.array([0], pa.int64()),
                },
                schema=tail_schema(kcol.type),
            )
        return pa.table(
            {
                "blk_key": kcol.take(pa.array(np.zeros(m, dtype=np.int64))),
                "blk_ts": pa.array(np.full(m, ts[0]), pa.int64()),
                "blk_id": pa.array(np.full(m, ids[0]), pa.int64()),
                "key": kcol.take(pa.array(np.arange(len(b) - m, len(b)))),
                "ts_us": pa.array(ts[sl], pa.int64()),
                "id": pa.array(ids[sl], pa.int64()),
                "v": pa.array(vals[sl], pa.float64()),
                "blk_len": pa.array(np.full(m, m), pa.int64()),
            },
            schema=tail_schema(kcol.type),
        )

    tl = (
        srt.map_batches(tails, batch_size=None, batch_format="pyarrow")
        .to_pandas()  # O(blocks × k)
    )
    # global block order = sort order of the block-identity tuple
    blocks = (
        tl[["blk_key", "blk_ts", "blk_id"]]
        .drop_duplicates()
        .sort_values(["blk_key", "blk_ts", "blk_id"], kind="stable")
        .reset_index(drop=True)
    )
    tl = tl[tl["blk_len"] > 0]
    by_blk = {
        t: g.sort_values(["key", "ts_us", "id"], kind="stable")
        for t, g in tl.groupby(["blk_key", "blk_ts", "blk_id"], sort=False)
    }
    order = [tuple(r) for r in blocks.itertuples(index=False)]
    ctx_map: dict = {}
    for i, ident in enumerate(order):
        first_key = ident[0]
        need = k - 1
        chunks = []
        j = i - 1
        while j >= 0 and need > 0:
            tail = by_blk.get(order[j])
            if tail is None:
                break
            # same-key rows form a SUFFIX of the tail (sorted order); the
            # tail always covers the block END, so "no same-key row in the
            # tail" ⇒ no same-key row anywhere earlier
            same = tail[tail["key"] == first_key]
            if len(same) == 0:
                break
            take = same.tail(need)
            chunks.insert(0, take)
            need -= len(take)
            if len(same) < len(tail):
                break  # the key run starts inside block j — nothing earlier
            if len(tail) < k - 1:
                j -= 1  # tail == a short whole block, all same-key → keep walking
                continue
            break  # full k−1 all-same-key tail → need is 0 here
        ctx_map[ident] = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=["key", "ts_us", "id", "v"])
        )
    ref = ray.put(ctx_map)

    def out_schema(key_type: pa.DataType) -> pa.Schema:
        return pa.schema(
            [(id_col, pa.int64()), (key_col, key_type), ("roll_med", pa.float64())]
        )

    def block_median(b: pa.Table, *, _ref=ref) -> pa.Table:
        kcol = _combined(b[key_col])
        if len(b) == 0:
            return out_schema(kcol.type).empty_table()
        ts = _ts_us(b[ts_col])
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pc.cast(b[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        keys = kcol.to_pandas().to_numpy()
        ident = (keys[0], int(ts[0]), int(ids[0]))
        ctx = ray.get(_ref).get(ident)
        n_ctx = 0
        if ctx is not None and len(ctx):
            # context belongs to the block's FIRST key run only
            cvals = ctx["v"].to_numpy(dtype=np.float64)
            ckeys = ctx["key"].to_numpy()
            keep = ckeys == keys[0]
            cvals = cvals[keep]
            n_ctx = cvals.size
            vals = np.concatenate([cvals, vals])
            keys = np.concatenate([ckeys[keep], keys])
        codes = pd.factorize(keys)[0]
        s = (
            pd.DataFrame({"r": codes, "v": vals})
            .groupby("r", sort=False)["v"]
            .rolling(k, min_periods=1)
            .median()
            .to_numpy()
        )
        med = s[n_ctx:]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                key_col: kcol,
                "roll_med": pa.array(med, pa.float64()),
            },
            schema=out_schema(kcol.type),
        )

    return srt.map_batches(block_median, batch_size=None, batch_format="pyarrow")
