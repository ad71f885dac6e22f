"""Grouped bivariate statistics: Pearson correlation + OLS slope/intercept.

The reference's zonal reduce carries (sum, sumsq) moments per group
(runner.py:653-685); this is the bivariate extension of the same
partial+final shape — each batch contributes per-group sums of
(n, x, y, x², y², xy), one group-count-sized hash aggregate merges them,
and the driver finalizes corr/slope/intercept from the moments.  The input
is read ONCE and nothing row-sized ever shuffles: the only exchange is the
six-moment partial rows (#groups per block).

Numerics: moments accumulate in float64 (pyarrow sums are pairwise), the
finalize uses the mean-centered forms, and degenerate groups (zero variance
in x or y, or n < 2) yield NULL like SQL ``corr`` / ``regr_slope``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MOMENTS = ["n", "sx", "sy", "sxx", "syy", "sxy"]


def bivar_partials_batch(
    b: pa.Table, *, keys: list[str], x_col: str, y_col: str
) -> pa.Table:
    """Per-group bivariate moment partials for one batch → one row per
    distinct key tuple present in the batch.  Rows where either value is
    NULL are excluded (SQL aggregate semantics)."""
    x = pc.cast(b[x_col], pa.float64())
    y = pc.cast(b[y_col], pa.float64())
    valid = pc.and_(pc.is_valid(x), pc.is_valid(y))
    if not pc.all(pc.fill_null(valid, False)).as_py():
        b = b.filter(valid)
        x = pc.cast(b[x_col], pa.float64())
        y = pc.cast(b[y_col], pa.float64())
    t = pa.table(
        {
            **{k: b[k] for k in keys},
            "x": x,
            "y": y,
            "xx": pc.multiply(x, x),
            "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        }
    )
    g = t.group_by(keys).aggregate(
        [
            ("x", "count"),
            ("x", "sum"),
            ("y", "sum"),
            ("xx", "sum"),
            ("yy", "sum"),
            ("xy", "sum"),
        ]
    )
    return pa.table(
        {
            **{k: g[k] for k in keys},
            "n": pc.cast(g["x_count"], pa.int64()),
            "sx": g["x_sum"],
            "sy": g["y_sum"],
            "sxx": g["xx_sum"],
            "syy": g["yy_sum"],
            "sxy": g["xy_sum"],
        }
    )


def finalize_bivar(df: pd.DataFrame) -> pd.DataFrame:
    """Moments frame (keys…, n, sx, sy, sxx, syy, sxy) → keys…, n, corr,
    slope, intercept (sample semantics; NULL on degenerate groups)."""
    n = df["n"].to_numpy(dtype=np.float64)
    sx = df["sx"].to_numpy(dtype=np.float64)
    sy = df["sy"].to_numpy(dtype=np.float64)
    mx = np.divide(sx, n, out=np.zeros_like(sx), where=n > 0)
    my = np.divide(sy, n, out=np.zeros_like(sy), where=n > 0)
    # mean-centered second moments (less cancellation than n·sxx − sx²)
    cxx = df["sxx"].to_numpy(dtype=np.float64) - mx * sx
    cyy = df["syy"].to_numpy(dtype=np.float64) - my * sy
    cxy = df["sxy"].to_numpy(dtype=np.float64) - mx * sy
    ok_x = (n >= 2) & (cxx > 0)
    ok_y = (n >= 2) & (cyy > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = np.where(ok_x & ok_y, cxy / np.sqrt(np.where(ok_x & ok_y, cxx * cyy, 1.0)), np.nan)
        slope = np.where(ok_x, cxy / np.where(ok_x, cxx, 1.0), np.nan)
        intercept = np.where(ok_x, my - slope * mx, np.nan)
    out = df.drop(columns=[c for c in _MOMENTS if c != "n"]).copy()
    out["n"] = df["n"].astype("int64")
    out["corr"] = corr
    out["slope"] = slope
    out["intercept"] = intercept
    return out


def grouped_corr(
    ds,
    *,
    keys: list[str],
    x_col: str,
    y_col: str,
    num_partitions: int = 4,
) -> pd.DataFrame:
    """Pearson correlation + OLS regression of y on x per key group →
    DataFrame(keys…, n, corr, slope, intercept).

    ONE pass over the input: in-batch moment partials (#groups rows per
    block) → coalesce to ``num_partitions`` schema-stable blocks (sandbox
    lesson #22) → one hash aggregate → driver finalize on the
    group-universe-sized frame."""
    from ray.data.aggregate import Sum

    keys = list(keys)
    merged = (
        ds.map_batches(
            bivar_partials_batch,
            fn_kwargs=dict(keys=keys, x_col=x_col, y_col=y_col),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .groupby(keys)
        .aggregate(*[Sum(m, alias_name=m) for m in _MOMENTS])
    )
    df = merged.to_pandas()  # group-universe-sized
    return (
        finalize_bivar(df)
        .sort_values(keys)
        .reset_index(drop=True)[keys + ["n", "corr", "slope", "intercept"]]
    )
