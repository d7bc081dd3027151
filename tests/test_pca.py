"""Distributed PCA (pipelines/similarity.pca_fit / pca_project):
moment-partial accumulation must match full-matrix numpy PCA exactly
(up to float tolerance), with a deterministic sign convention."""

import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.pipelines.similarity import pca_fit, pca_project


def _make(n=300, d=12, seed=3):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: a few dominant directions
    basis = np.linalg.qr(rng.randn(d, d))[0]
    scales = np.array([10, 6, 3] + [0.5] * (d - 3))
    X = rng.randn(n, d) @ (basis * scales).T + rng.randn(d) * 2
    return X


def _ds(X):
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(X), dtype="int64"),
        "embedding": list(X.astype(np.float32)),
    })).repartition(5)


def test_matches_full_matrix_pca(ray_session):
    X = _make()
    m = pca_fit(_ds(X), n_components=5)
    Xf = X.astype(np.float32).astype(np.float64)  # the stored precision
    cov = np.cov(Xf, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:5]
    ref_ev = evals[order]
    np.testing.assert_allclose(m["explained_var"], ref_ev,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(m["mean"], Xf.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(m["total_var"], np.trace(cov), rtol=1e-10)
    # components span the same subspace (compare up to sign, fixed by
    # the largest-|coord|-positive convention)
    ref = evecs[:, order].T
    flip = np.sign(ref[np.arange(5), np.argmax(np.abs(ref), axis=1)])
    np.testing.assert_allclose(m["components"], ref * flip[:, None],
                               atol=1e-8)


def test_components_orthonormal_and_variance_sorted(ray_session):
    m = pca_fit(_ds(_make(seed=11)), n_components=6)
    C = np.asarray(m["components"])
    np.testing.assert_allclose(C @ C.T, np.eye(6), atol=1e-10)
    ev = np.asarray(m["explained_var"])
    assert (np.diff(ev) <= 1e-12).all()
    assert ev.sum() <= m["total_var"] + 1e-9


def test_projection_variance_equals_eigenvalues(ray_session):
    X = _make(seed=7)
    ds = _ds(X)
    m = pca_fit(ds, n_components=4)
    P = np.stack(pca_project(ds, m).to_pandas()
                 .sort_values("vec_id")["pca"].to_numpy())
    np.testing.assert_allclose(P.var(axis=0, ddof=1),
                               m["explained_var"], rtol=1e-8)
    # centered projections: mean ~ 0
    np.testing.assert_allclose(P.mean(axis=0), 0, atol=1e-9)


def test_block_layout_invariance(ray_session):
    X = _make(n=200, seed=5)
    m1 = pca_fit(_ds(X), n_components=3)
    m2 = pca_fit(rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(X), dtype="int64"),
        "embedding": list(X.astype(np.float32)),
    })).repartition(1), n_components=3)
    np.testing.assert_allclose(m1["explained_var"], m2["explained_var"],
                               rtol=1e-9)
    np.testing.assert_allclose(m1["components"], m2["components"],
                               atol=1e-9)
