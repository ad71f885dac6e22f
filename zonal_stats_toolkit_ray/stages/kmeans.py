"""Distributed Euclidean k-means over the embedding column.

Unlike ``knn.train_centroids`` (a driver-side cosine quantizer for IVF
seeding), this is the full-corpus Lloyd iteration as a streaming
operation: every iteration is ONE ``map_batches`` pass emitting a fixed
(k·d sums + k counts + 1 inertia)-double partial row per block, summed on
the driver — the mergeable-moment shape of ``pca.pca_train``.  No
shuffle, no sample bias: the update uses EVERY vector, and the cost per
iteration is one slim read pass whatever the corpus size (the 100-TB
shape: k·d doubles per block of driver traffic).

Init is k-means++ (Euclidean) on a deterministic unbiased driver sample
(``knn.hash_sample`` — global bottom-k by id hash, not head-of-file).

Assignment ties (two centroids exactly equidistant) break to the lowest
cluster id — ``np.argmin``'s convention, mirrored by the oracle's
``ROW_NUMBER ... ORDER BY d2, cid``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pca import _batch_matrix


def _assign(x: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) × (k, d) → (argmin cluster ids, squared distances).  Direct
    (x - c)² expansion per pair — same arithmetic as the SQL oracle's
    SUM((v - w)^2), keeping near-tie behavior aligned (the matmul trick
    ||x||²-2xc+||c||² has a larger fp divergence)."""
    # chunk the (n, k, d) cube so a 4096-row batch stays ~tens of MB
    n = x.shape[0]
    out_a = np.empty(n, dtype=np.int64)
    out_d = np.empty(n, dtype=np.float64)
    step = max(1, int(2_000_000 / max(1, cent.shape[0] * cent.shape[1])))
    for s in range(0, n, step):
        e = min(n, s + step)
        d2 = ((x[s:e, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        out_a[s:e] = np.argmin(d2, axis=1)
        out_d[s:e] = d2[np.arange(e - s), out_a[s:e]]
    return out_a, out_d


def _iter_partial(batch: pa.Table, cent_ref, vec_col: str) -> pa.Table:
    from .knn import _cached_ref

    cent = np.asarray(_cached_ref(cent_ref), dtype=np.float64)
    x = _batch_matrix(batch[vec_col])
    k, d = cent.shape
    if x.size == 0:
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
    else:
        a, d2 = _assign(x, cent)
        sums = np.zeros((k, d))
        np.add.at(sums, a, x)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        inertia = float(d2.sum())
    return pa.table(
        {
            "sums": pa.array([sums.ravel().tolist()], pa.list_(pa.float64())),
            "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
            "inertia": pa.array([inertia], pa.float64()),
        }
    )


def _kmeanspp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    k = min(k, n)
    first = int(rng.integers(n))
    cent = [sample[first]]
    d2 = ((sample - sample[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        nxt = (
            int(rng.integers(n))
            if total <= 0
            else int(rng.choice(n, p=d2 / total))
        )
        cent.append(sample[nxt])
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    return np.stack(cent)


def kmeans_fit(
    ds,
    k: int = 8,
    *,
    iters: int = 5,
    seed: int = 42,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, float]:
    """Fit k-means → (centroids (k, d), final inertia).  ``iters``
    streaming Lloyd passes over the FULL dataset; empty clusters keep
    their previous centroid.  Deterministic for a given (data, seed)."""
    from .knn import _put_maybe, hash_sample

    sample = hash_sample(ds, sample_size, id_col=id_col, vec_col=vec_col)
    cent = _kmeanspp_init(np.asarray(sample, np.float64), k, seed)
    inertia = float("inf")
    for _ in range(iters):
        ref = _put_maybe(cent)
        parts = ds.map_batches(
            _iter_partial,
            batch_format="pyarrow",
            fn_kwargs=dict(cent_ref=ref, vec_col=vec_col),
        ).to_pandas()
        kk, d = cent.shape
        sums = np.zeros((kk, d))
        counts = np.zeros(kk, dtype=np.int64)
        for _, row in parts.iterrows():
            sums += np.asarray(row["sums"]).reshape(kk, d)
            counts += np.asarray(row["counts"], dtype=np.int64)
        inertia = float(parts["inertia"].sum())
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / counts[nz, None]
    return cent, inertia


def assign_batch(
    batch: pa.Table, cent_ref, *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> pa.Table:
    from .knn import _cached_ref

    cent = np.asarray(_cached_ref(cent_ref), dtype=np.float64)
    x = _batch_matrix(batch[vec_col])
    a = (
        _assign(x, cent)[0]
        if x.size
        else np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {id_col: batch[id_col], "cluster_id": pa.array(a, pa.int64())}
    )


def kmeans_assign(
    ds, centroids: np.ndarray, *, vec_col: str = "embedding", id_col: str = "vec_id"
):
    """Assign every vector to its nearest centroid → Dataset
    (id, cluster_id).  Centroids broadcast once."""
    from .knn import _put_maybe

    ref = _put_maybe(np.asarray(centroids, np.float64))
    return ds.map_batches(
        assign_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(cent_ref=ref, vec_col=vec_col, id_col=id_col),
    )


def write_centroids_oracle(cent: np.ndarray, path: str) -> None:
    """Long-format (cid, dim 1-based, w) for the DuckDB argmin oracle."""
    import pyarrow.parquet as pq

    k, d = cent.shape
    pq.write_table(
        pa.table(
            {
                "cid": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
                "w": pa.array(cent.ravel().astype(np.float64)),
            }
        ),
        path,
    )


def silhouette(ds, cent: np.ndarray, *, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Simplified (centroid-based) silhouette score per vector →
    Dataset(id, cluster_id, s): with da = distance to the OWN (nearest)
    centroid and db = distance to the nearest OTHER centroid,
    ``s = (db − da) / max(da, db)`` ∈ [0, 1] here (da is the minimum by
    construction) — the standard k-means quality readout at corpus scale,
    where true pairwise silhouette is quadratic and this centroid form is
    the accepted estimator (Hruschka et al.).

    One broadcast of the (k, d) centroid matrix, one streaming pass; per
    batch the (n, k) distance cube uses the same (x − c)² expansion as
    ``_assign`` so argmins and the SQL oracle's ROW_NUMBER ordering agree
    on near-ties.  Degenerate da = db = 0 (a vector exactly on two
    centroids) yields NaN — unreachable with mean centroids."""
    import ray

    cent = np.asarray(cent, dtype=np.float64)
    if cent.ndim != 2 or cent.shape[0] < 2:
        raise ValueError(
            "silhouette needs a (k, d) centroid matrix with k >= 2 — "
            "'nearest OTHER centroid' is undefined for k = 1"
        )
    cent_ref = ray.put(cent)

    def score(batch: pa.Table, *, _ref=cent_ref) -> pa.Table:
        from .knn import _cached_ref

        c = np.asarray(_cached_ref(_ref), dtype=np.float64)
        x = _batch_matrix(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if x.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                }
            )
        n = x.shape[0]
        a = np.empty(n, dtype=np.int64)
        da = np.empty(n, dtype=np.float64)
        db = np.empty(n, dtype=np.float64)
        step = max(1, int(2_000_000 / max(1, c.shape[0] * c.shape[1])))
        for s_ in range(0, n, step):
            e = min(n, s_ + step)
            d2 = ((x[s_:e, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a[s_:e] = np.argmin(d2, axis=1)
            part = np.partition(d2, 1, axis=1)
            da[s_:e] = np.sqrt(part[:, 0])
            db[s_:e] = np.sqrt(part[:, 1])
        with np.errstate(invalid="ignore"):
            s_val = (db - da) / np.maximum(da, db)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster_id": pa.array(a, pa.int64()),
                "s": pa.array(s_val, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
