"""Per-group feature normalization (round 4): z-score and min-max scaling
of a numeric column within groups — the standard feature-prep stage before
model training (normalize engagement value per event type, score per
language, ...).

Scale shape (the partial-aggregate-then-broadcast pattern shared with the
zonal reduce): one in-batch combiner emits (group, n, sum, sumsq, min,
max) — the all-to-all moves one row per (group, block) — a group-sized
``groupby().aggregate`` reduces them, the tiny per-group moment table
broadcasts via ``ray.put``, and the full rows stream through a vectorized
lookup+transform.  Two passes over the input by design (moments, then
transform); nothing corpus-sized ever reaches the driver.

Variance uses the sum-of-squares identity var = E[x²] − E[x]² (clamped at
0 like the reference's stdev quirk Q3, runner.py:233) so the SQL oracle
can reproduce the arithmetic exactly — same sums, same algebra, same
clamp."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _dict_encode(g):
    """(codes int64, dictionary Array) of a possibly-chunked group column."""
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    return np.asarray(enc.indices, dtype=np.int64), enc.dictionary


def _moments_partial(batch: pa.Table, *, group_col: str, value_col: str) -> pa.Table:
    codes, uniq = _dict_encode(batch[group_col])
    v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ok = ~np.isnan(v)
    k = len(uniq)
    n = np.bincount(codes[ok], minlength=k).astype(np.int64)
    s = np.bincount(codes[ok], weights=v[ok], minlength=k)
    ss = np.bincount(codes[ok], weights=v[ok] * v[ok], minlength=k)
    mn = np.full(k, np.inf)
    mx = np.full(k, -np.inf)
    np.minimum.at(mn, codes[ok], v[ok])
    np.maximum.at(mx, codes[ok], v[ok])
    return pa.table(
        {
            group_col: uniq,
            "n": pa.array(n),
            "s": pa.array(s),
            "ss": pa.array(ss),
            "mn": pa.array(mn),
            "mx": pa.array(mx),
        }
    )


def group_moments(ds, *, group_col: str, value_col: str) -> pd.DataFrame:
    """(group, n, sum, sumsq, min, max) — group-sized, driver-held."""
    from ray.data.aggregate import Max, Min, Sum

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            _moments_partial,
            batch_format="pyarrow",
            fn_kwargs=dict(group_col=group_col, value_col=value_col),
        )
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
        )
        .to_pandas()
    )
    return out


def normalize_by_group(
    ds,
    *,
    group_col: str,
    value_col: str,
    ndigits: int | None = 6,
):
    """→ the input Dataset with ``zscore`` and ``minmax`` columns appended.

    * ``zscore`` = (v − mean_g) / std_g, std from the clamped
      sum-of-squares identity; 0 where the group is constant (std = 0).
    * ``minmax`` = (v − min_g) / (max_g − min_g); 0 where max = min.
    * NaN values pass through as NaN and never contribute to moments.

    ``ndigits`` rounds the outputs (oracle comparability); ``None`` keeps
    full precision."""
    import ray

    mom = group_moments(ds, group_col=group_col, value_col=value_col)
    keys = mom[group_col].astype(str).to_numpy()
    order = np.argsort(keys)
    keys = keys[order]
    n = mom["n"].to_numpy(np.float64)[order]
    mean = mom["s"].to_numpy(np.float64)[order] / np.maximum(n, 1)
    var = np.maximum(mom["ss"].to_numpy(np.float64)[order] / np.maximum(n, 1) - mean * mean, 0.0)
    std = np.sqrt(var)
    mn = mom["mn"].to_numpy(np.float64)[order]
    rng = mom["mx"].to_numpy(np.float64)[order] - mn
    ref = ray.put((keys, mean, std, mn, rng))

    def transform(batch: pa.Table, _r=ref) -> pa.Table:
        ks, mean_, std_, mn_, rng_ = ray.get(_r)
        codes, uniq = _dict_encode(batch[group_col])
        # map the (small) per-batch dictionary to moment-table slots, then
        # gather per row — O(groups) searchsorted, O(rows) gather
        gi = np.searchsorted(ks, np.asarray(uniq.to_pylist(), dtype=str))[codes]
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(std_[gi] > 0, (v - mean_[gi]) / std_[gi], 0.0)
            mmx = np.where(rng_[gi] > 0, (v - mn_[gi]) / rng_[gi], 0.0)
        nan = np.isnan(v)
        z[nan] = np.nan
        mmx[nan] = np.nan
        if ndigits is not None:
            z = np.round(z, ndigits)
            mmx = np.round(mmx, ndigits)
        return batch.append_column("zscore", pa.array(z, pa.float64())).append_column(
            "minmax", pa.array(mmx, pa.float64())
        )

    return ds.map_batches(transform, batch_format="pyarrow")


def quantile_transform(
    ds,
    *,
    id_col: str = "event_id",
    value_col: str = "value",
    num_partitions: int = 4,
    max_universe: int | None = None,
):
    """ECDF (rank) transform → Dataset(id, ecdf): each value maps to
    ``count(v' ≤ v) / n`` — SQL ``CUME_DIST()`` — the uniformizing
    feature transform (quantile normalization's per-column half).

    Shape: one (value, count) universe aggregate (exact for bounded
    distinct universes — fixed-decimal data), driver cumsum, broadcast
    (values, cum) arrays, then a vectorized searchsorted per batch.  The
    corpus streams; only the value universe ever leaves the workers —
    and the universe itself is guarded (round 5, ``max_universe``)."""
    import ray
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .guard import DEFAULT_MAX_UNIVERSE, collect_universe

    if max_universe is None:
        max_universe = DEFAULT_MAX_UNIVERSE

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"v": pc.cast(b[value_col], pa.float64())})
        g = t.group_by("v").aggregate([([], "count_all")])
        return pa.table(
            {"v": g["v"], "c": pc.cast(g["count_all"], pa.int64())}
        )

    uni = collect_universe(
        ds.select_columns([value_col])
        .map_batches(partials, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("v")
        .aggregate(Sum("c", alias_name="c")),
        max_universe=max_universe,
        what="quantile_transform",
    ).sort_values("v", kind="stable")
    vals = uni["v"].to_numpy(dtype=np.float64)
    cum = np.cumsum(uni["c"].to_numpy(dtype=np.int64))
    n = float(cum[-1]) if cum.size else 1.0
    ref = ray.put((vals, cum.astype(np.float64)))

    def transform(b: pa.Table, *, _ref=ref) -> pa.Table:
        v = pc.cast(b[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        vv, cc = ray.get(_ref)
        idx = np.searchsorted(vv, v, side="right") - 1
        ecdf = cc[idx] / n
        return pa.table(
            {
                id_col: b[id_col],
                "ecdf": pa.array(ecdf, pa.float64()),
            }
        )

    return ds.map_batches(transform, batch_format="pyarrow")


def impute_group_median(
    ds,
    *,
    id_col: str,
    key_col: str,
    value_col: str,
    num_partitions: int = 4,
):
    """Missing-value imputation by group median → Dataset(id, key,
    v_filled): NULLs in ``value_col`` fill with their group's exact
    median of the NON-null values (``quantile_cont`` 0.5 interpolation)
    — the standard tabular-ML imputation pass.

    Shape: one (key, value) count-universe aggregate over non-null rows
    (the winsorized-mean shape), driver interpolation, broadcast medians,
    one vectorized fill pass.  Groups that are entirely NULL stay NULL."""
    import ray
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        v = pc.cast(b[value_col], pa.float64())
        t = pa.table({key_col: b[key_col], "v": v}).filter(pc.is_valid(v))
        g = t.group_by([key_col, "v"]).aggregate([([], "count_all")])
        return pa.table(
            {
                key_col: g[key_col],
                "v": g["v"],
                "c": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from .guard import DEFAULT_MAX_UNIVERSE, collect_universe

    uni = collect_universe(
        ds.select_columns([key_col, value_col])
        .map_batches(partials, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby([key_col, "v"])
        .aggregate(Sum("c", alias_name="c")),
        max_universe=DEFAULT_MAX_UNIVERSE,
        what="impute_group_median",
    ).sort_values([key_col, "v"], kind="stable")
    meds: dict = {}
    for k, g in uni.groupby(key_col, sort=True):
        v = g["v"].to_numpy(dtype=np.float64)
        cum = np.cumsum(g["c"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        r = 0.5 * (n - 1)
        kk = int(np.floor(r))
        frac = r - kk
        i = int(np.searchsorted(cum, kk, side="right"))
        med = v[i]
        if frac != 0.0:
            j = int(np.searchsorted(cum, kk + 1, side="right"))
            med = med + frac * (v[j] - med)
        meds[k] = float(med)
    keys = pa.array([str(k) for k in meds], pa.string())
    vals = np.array(list(meds.values()), dtype=np.float64)
    ref = ray.put((keys, vals))

    def fill(b: pa.Table, *, _ref=ref) -> pa.Table:
        ks, ms = ray.get(_ref)
        v = pc.cast(b[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        valid = pc.is_valid(b[value_col]).to_numpy(zero_copy_only=False)
        idx = pc.index_in(
            pc.cast(b[key_col], pa.string()), value_set=ks
        ).to_numpy(zero_copy_only=False)
        known = idx >= 0 if idx.dtype.kind == "i" else ~np.isnan(idx)
        filled = np.where(
            valid, v, np.where(known, ms[np.where(known, idx, 0)], np.nan)
        )
        return pa.table(
            {
                id_col: b[id_col],
                key_col: b[key_col],
                "v_filled": pa.array(filled, pa.float64()),
            }
        )

    return ds.map_batches(fill, batch_format="pyarrow")
