"""Distributed PCA (operators/pca.py) — numpy parity + invariants."""

from __future__ import annotations

import numpy as np
import pytest

from top2vec_spark.operators.pca import (
    covariance_table,
    fit_pca,
    transform_pca,
)


def _fixture(n=300, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic gaussian so principal axes are well separated
    scales = np.linspace(5.0, 0.1, d)
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    x = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    return x


@pytest.fixture(scope="module")
def emb_df(spark):
    x = _fixture()
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(8)


def test_moments_match_numpy(spark, emb_df):
    x = _fixture()
    model = fit_pca(emb_df, n_components=5)
    assert model.n == x.shape[0]
    np.testing.assert_allclose(model.mean, x.mean(axis=0), rtol=1e-10)
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:5]
    np.testing.assert_allclose(model.explained_variance, evals, rtol=1e-8)


def test_projection_matches_numpy_and_is_deterministic(spark, emb_df):
    x = _fixture()
    model = fit_pca(emb_df, n_components=3)
    out = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in transform_pca(emb_df, model).collect()
    }
    z = (x - model.mean) @ model.components.T
    got = np.vstack([out[i] for i in range(x.shape[0])])
    np.testing.assert_allclose(got, z, rtol=1e-12, atol=1e-12)
    # refit -> byte-identical components (sign convention pins them)
    model2 = fit_pca(emb_df, n_components=3)
    np.testing.assert_array_equal(model.components, model2.components)


def test_variance_ordering_and_capture(spark, emb_df):
    x = _fixture()
    model = fit_pca(emb_df, n_components=6)
    ev = model.explained_variance
    assert np.all(np.diff(ev) <= 1e-12)  # descending
    # top components capture the dominant anisotropic directions:
    # projected variance per component equals its eigenvalue
    z = (x - model.mean) @ model.components.T
    np.testing.assert_allclose(z.var(axis=0), ev, rtol=1e-8)
    # orthonormal rows
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(6), atol=1e-10
    )


def test_reconstruction_error_decreases_with_k(spark, emb_df):
    x = _fixture()
    errs = []
    for k in (1, 4, 8):
        m = fit_pca(emb_df, n_components=k)
        z = (x - m.mean) @ m.components.T
        rec = z @ m.components + m.mean
        errs.append(float(((x - rec) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]


def test_covariance_table_matches_numpy(spark, emb_df):
    x = _fixture()
    cov = np.cov(x, rowvar=False, bias=True)
    rows = covariance_table(emb_df).collect()
    d = x.shape[1]
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        assert r["cov"] == pytest.approx(cov[r["i"], r["j"]], rel=1e-9, abs=1e-12)


def test_partition_invariance(spark):
    x = _fixture(n=120, d=8, seed=3)
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    a = fit_pca(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(1),
        n_components=4,
    )
    b = fit_pca(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(7),
        n_components=4,
    )
    np.testing.assert_allclose(a.components, b.components, atol=1e-9)
    np.testing.assert_allclose(a.mean, b.mean, atol=1e-12)
