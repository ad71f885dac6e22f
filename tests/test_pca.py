"""Distributed PCA (stages/pca.py): moment-partial training equals the
single-process covariance eigendecomposition; projection is exact;
results are invariant to block layout."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(n=800, d=16, seed=2):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so eigenvalues are separated
    basis = rng.normal(size=(d, d))
    scales = np.linspace(5, 0.1, d)
    x = rng.normal(size=(n, d)) * scales @ basis
    return x.astype(np.float32)


def _ds_from(x, npart):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "embedding": pa.array(
                list(x), pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(t).repartition(npart)


def test_train_matches_numpy_and_is_layout_invariant(ray_session):
    from zonal_stats_toolkit_ray.stages.pca import pca_train

    x = _mk()
    mean_a, comps_a, var_a = pca_train(_ds_from(x, 3), k=4)
    mean_b, comps_b, var_b = pca_train(_ds_from(x, 17), k=4)

    xd = x.astype(np.float64)
    mean = xd.mean(axis=0)
    cov = np.cov(xd, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    ref = v[:, order]
    piv = np.abs(ref).argmax(axis=0)
    ref = ref * np.sign(ref[piv, np.arange(4)])

    np.testing.assert_allclose(mean_a, mean, rtol=1e-10)
    np.testing.assert_allclose(var_a, w[order], rtol=1e-8)
    np.testing.assert_allclose(comps_a, ref, atol=1e-8)
    # layout invariance (different block counts → same model)
    np.testing.assert_allclose(mean_a, mean_b, rtol=1e-12)
    np.testing.assert_allclose(comps_a, comps_b, atol=1e-10)
    # orthonormal, variance-descending
    np.testing.assert_allclose(comps_a.T @ comps_a, np.eye(4), atol=1e-10)
    assert np.all(np.diff(var_a) <= 1e-12)


def test_project_exact(ray_session):
    from zonal_stats_toolkit_ray.stages.pca import pca_project, pca_train

    x = _mk(n=300, d=8, seed=5)
    ds = _ds_from(x, 5)
    mean, comps, _ = pca_train(ds, k=3)
    got = (
        pca_project(ds, mean, comps)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp = (x.astype(np.float64) - mean) @ comps
    for j in range(3):
        np.testing.assert_allclose(got[f"pc{j+1}"], np.round(exp[:, j], 6), atol=1e-9)
    # projected data is centered and decorrelated with variance = eigvals
    proj = got[["pc1", "pc2", "pc3"]].to_numpy()
    np.testing.assert_allclose(proj.mean(axis=0), 0.0, atol=1e-4)


def test_pca_needs_two_vectors(ray_session):
    from zonal_stats_toolkit_ray.stages.pca import pca_train

    with pytest.raises(ValueError):
        pca_train(_ds_from(_mk(n=1, d=4), 1), k=2)
