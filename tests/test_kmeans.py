"""Distributed Euclidean k-means (stages/kmeans.py): Lloyd updates equal
a single-process reference; inertia decreases; layout-invariant;
clusters recover well-separated synthetic blobs."""

import numpy as np
import pyarrow as pa


def _blobs(n_per=200, k=4, d=8, seed=3, spread=0.3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=5.0, size=(k, d))
    x = np.concatenate(
        [centers[i] + rng.normal(scale=spread, size=(n_per, d)) for i in range(k)]
    )
    labels = np.repeat(np.arange(k), n_per)
    return x.astype(np.float32), labels


def _ds_from(x, npart):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(t).repartition(npart)


def _ref_lloyd(x, cent0, iters):
    cent = cent0.copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(cent.shape[0]):
            m = a == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def test_fit_matches_reference_and_layout_invariant(ray_session):
    from zonal_stats_toolkit_ray.stages.kmeans import (
        _kmeanspp_init,
        kmeans_fit,
    )
    from zonal_stats_toolkit_ray.stages.knn import hash_sample

    x, _ = _blobs()
    ds3, ds11 = _ds_from(x, 3), _ds_from(x, 11)
    cent_a, inert_a = kmeans_fit(ds3, k=4, iters=4, seed=1)
    cent_b, inert_b = kmeans_fit(ds11, k=4, iters=4, seed=1)
    np.testing.assert_allclose(cent_a, cent_b, atol=1e-9)
    assert abs(inert_a - inert_b) < 1e-6 * max(1.0, abs(inert_a))
    # same init → same Lloyd trajectory as the single-process reference
    sample = hash_sample(ds3, 2048)
    cent0 = _kmeanspp_init(np.asarray(sample, np.float64), 4, 1)
    ref = _ref_lloyd(x.astype(np.float64), cent0, 4)
    np.testing.assert_allclose(np.sort(cent_a, axis=0), np.sort(ref, axis=0), atol=1e-8)


def test_recovers_blobs_and_inertia_decreases(ray_session):
    from zonal_stats_toolkit_ray.stages.kmeans import kmeans_assign, kmeans_fit

    x, labels = _blobs(seed=9)
    ds = _ds_from(x, 6)
    _, inert1 = kmeans_fit(ds, k=4, iters=1, seed=7)
    cent, inert5 = kmeans_fit(ds, k=4, iters=5, seed=7)
    assert inert5 <= inert1 + 1e-9
    got = (
        kmeans_assign(ds, cent)
        .to_pandas()
        .sort_values("vec_id")["cluster_id"]
        .to_numpy()
    )
    # each true blob maps to exactly one cluster id (purity 1.0 on
    # well-separated blobs)
    for b in range(4):
        assert len(np.unique(got[labels == b])) == 1
    assert len(np.unique([got[labels == b][0] for b in range(4)])) == 4


def test_empty_cluster_keeps_centroid(ray_session):
    from zonal_stats_toolkit_ray.stages.kmeans import kmeans_fit

    # 10 identical points, k=3: two clusters go empty and must keep
    # finite centroids (no NaN from 0/0)
    x = np.ones((10, 4), dtype=np.float32)
    cent, inert = kmeans_fit(_ds_from(x, 2), k=3, iters=3, seed=0)
    assert np.isfinite(cent).all()
    assert inert < 1e-12
