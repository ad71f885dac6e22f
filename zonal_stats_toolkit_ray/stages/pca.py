"""Distributed PCA over the embedding column — the whitening / dimension-
reduction step a large-scale embedding pipeline runs before clustering,
ANN indexing or dedup (e.g. SemDeDup preprocessing; OPQ-style rotations).

Two streaming passes, no shuffle:

* **Train** (:func:`pca_train`): per-batch moment partials — one fixed
  (d + d*d + 1)-double row per block (sum vector, Gram matrix X^T X,
  count) — summed on the driver, then covariance + ``np.linalg.eigh`` on
  the tiny d×d matrix.  The mergeable fixed-size-partial shape of
  ``lm.train_char_lm`` / the HLL sketch: scales with BLOCK COUNT only, so
  100 TB of embeddings costs exactly one slim read pass.
* **Project** (:func:`pca_project`): broadcast (mean, components) once
  via ``ray.put``; each batch does one float64 matmul
  ``(X - mean) @ W`` — zero-copy Arrow FixedSizeList/List decode on the
  way in, no per-row Python.

Component sign is canonicalized (largest-|coefficient| entry positive) so
results are deterministic across eigensolver builds.  The DuckDB oracle
re-derives every projection from an EXPORTED (dim, mean, c1..ck) table —
a full value oracle, not a certificate (the char_lm oracle pattern).

Reference parity: the reference toolkit has no linear-algebra operators;
this extends the training-data-pipeline surface (SURVEY §2.6) alongside
knn.py (which shares the embedding decode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(col) -> np.ndarray:
    """Arrow list<float> / fixed_size_list<float> / Ray tensor-extension
    column → (n, d) float64 matrix via one flat buffer view (knn.py's
    zero-copy decode shape)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):
        # Ray's ArrowTensorArray (from_pandas of ndarray cells) exposes
        # the (n, d) tensor directly
        arr = col.to_numpy(zero_copy_only=False)
        return np.asarray(np.stack(arr) if arr.dtype == object else arr).astype(
            np.float64
        )
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat.reshape(-1, d).astype(np.float64)
    flat = col.values.to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    d = int(widths[0]) if widths.size else 0
    if widths.size and not np.all(widths == d):
        raise ValueError("ragged embedding column")
    return flat[offs[0] : offs[0] + widths.sum()].reshape(-1, d).astype(np.float64)


def _moment_partial(batch: pa.Table, vec_col: str) -> pa.Table:
    x = _batch_matrix(batch[vec_col])
    d = x.shape[1] if x.size else 0
    s = x.sum(axis=0) if x.size else np.zeros(d)
    g = x.T @ x if x.size else np.zeros((d, d))
    return pa.table(
        {
            "n": pa.array([x.shape[0]], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
        }
    )


def pca_train(ds, *, vec_col: str = "embedding", k: int = 4):
    """One streaming moment pass → (mean (d,), components (d, k),
    explained_variance (k,)).  Components are eigh's top-k eigenvectors of
    the sample covariance, sign-canonicalized, variance-descending."""
    parts = ds.map_batches(
        _moment_partial, batch_format="pyarrow", fn_kwargs=dict(vec_col=vec_col)
    ).to_pandas()
    parts = parts[parts["n"] > 0]
    d = int(parts["d"].max())
    n = int(parts["n"].sum())
    if n < 2:
        raise ValueError("PCA needs >= 2 vectors")
    s = np.zeros(d)
    g = np.zeros((d, d))
    for _, row in parts.iterrows():
        s += np.asarray(row["s"])
        g += np.asarray(row["g"]).reshape(d, d)
    mean = s / n
    cov = (g - np.outer(s, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # symmetrize fp residue before eigh
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    # canonical sign: the largest-|coefficient| entry of each component
    # is positive (ties broken by lowest dim index, argmax's convention)
    piv = np.abs(comps).argmax(axis=0)
    comps = comps * np.sign(comps[piv, np.arange(comps.shape[1])])
    return mean, comps, w[order]


def project_batch(
    batch: pa.Table,
    model_ref,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> pa.Table:
    """(X - mean) @ W per batch; model (mean, W) fetched from the
    broadcast ref once per task (knn._cached_ref memoizes per worker)."""
    from .knn import _cached_ref

    mean, comps = _cached_ref(model_ref)
    x = _batch_matrix(batch[vec_col])
    proj = (x - mean) @ comps if x.size else np.zeros((0, comps.shape[1]))
    cols = {id_col: batch[id_col]}
    for j in range(comps.shape[1]):
        cols[f"pc{j + 1}"] = pa.array(np.round(proj[:, j], round_dp) + 0.0)
    return pa.table(cols)


def pca_project(
    ds,
    mean: np.ndarray,
    comps: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Project every vector onto the components → Dataset
    (id, pc1..pck), 6-dp rounded (sum order over d terms differs from the
    oracle's SQL SUM; d=64 float64 dot products are far inside 6 dp)."""
    from .knn import _put_maybe

    ref = _put_maybe((np.asarray(mean, np.float64), np.asarray(comps, np.float64)))
    return ds.map_batches(
        project_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(model_ref=ref, vec_col=vec_col, id_col=id_col),
    )


def write_pca_oracle(mean: np.ndarray, comps: np.ndarray, path: str) -> None:
    """Persist (dim 1-based, mean, c1..ck) for the DuckDB re-projection
    oracle (parallel unnest(embedding) + unnest(generate_series))."""
    import pyarrow.parquet as pq

    d, k = comps.shape
    cols = {
        "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
        "mean": pa.array(mean.astype(np.float64)),
    }
    for j in range(k):
        cols[f"c{j + 1}"] = pa.array(comps[:, j].astype(np.float64))
    pq.write_table(pa.table(cols), path)
