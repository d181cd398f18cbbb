"""Distributed UMAP (operators/umap.py) — semantics pinned against
scalar reimplementations of umap-learn's published algorithms
(McInnes 2018; reference consumer: top2vec.py:1541-1551).

- smooth-kNN calibration (rho, sigma): bit-identical to a scalar
  64-iteration binary search with umap's clamps, including duplicate
  points, zero-distance prefixes, and fractional local_connectivity.
- (a, b) curve fit: matches umap-learn's published default fit.
- fuzzy-union symmetrization: equals the numpy t-conorm.
- driver vs distributed optimizer: identical update semantics.
- manifold quality: planted clusters separate and are recoverable;
  embedding kNN preserves input kNN far above chance.
- determinism: same seed -> identical coordinates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from top2vec_spark.operators.umap import (
    _neg_indices,
    _smooth_knn_batch,
    embed_graph,
    find_ab_params,
    fuzzy_edges,
    symmetrize,
    transform_points,
    umap_reduce,
)

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


def _smooth_knn_scalar(distmat, n_neighbors, local_connectivity=1.0, bandwidth=1.0):
    """Straight transcription of umap-learn smooth_knn_dist: rows are
    the implicit self (d=0) + k non-self distances."""
    n, k = distmat.shape
    target = np.log2(n_neighbors) * bandwidth
    full = np.hstack([np.zeros((n, 1)), distmat])
    mean_distances = np.mean(full)
    rho = np.zeros(n)
    result = np.zeros(n)
    for i in range(n):
        lo, hi, mid = 0.0, np.inf, 1.0
        ith = full[i]
        non_zero = ith[ith > 0]
        if non_zero.shape[0] >= local_connectivity:
            index = int(np.floor(local_connectivity))
            interp = local_connectivity - index
            if index > 0:
                rho[i] = non_zero[index - 1]
                if interp > SMOOTH_K_TOLERANCE:
                    rho[i] += interp * (non_zero[index] - non_zero[index - 1])
            else:
                rho[i] = interp * non_zero[0]
        elif non_zero.shape[0] > 0:
            rho[i] = np.max(non_zero)
        for _ in range(64):
            psum = 0.0
            for j in range(1, ith.shape[0]):
                d = ith[j] - rho[i]
                psum += np.exp(-(d / mid)) if d > 0 else 1.0
            if abs(psum - target) < SMOOTH_K_TOLERANCE:
                break
            if psum > target:
                hi = mid
                mid = (lo + hi) / 2
            else:
                lo = mid
                mid = mid * 2 if hi == np.inf else (lo + hi) / 2
        result[i] = mid
        if rho[i] > 0:
            if result[i] < MIN_K_DIST_SCALE * np.mean(ith):
                result[i] = MIN_K_DIST_SCALE * np.mean(ith)
        else:
            if result[i] < MIN_K_DIST_SCALE * mean_distances:
                result[i] = MIN_K_DIST_SCALE * mean_distances
    return rho, result


def _clusters(rng, n_per=80, dim=8, sep=6.0, noise=0.3, n_clusters=3):
    centers = np.eye(dim)[:n_clusters] * sep
    X, lab = [], []
    for c in range(n_clusters):
        X.append(centers[c] + rng.normal(0, noise, (n_per, dim)))
        lab += [c] * n_per
    return np.vstack(X), np.array(lab)


# ---------------------------------------------------------------------------
# numeric core
# ---------------------------------------------------------------------------

def test_find_ab_params_matches_umap_defaults():
    a, b = find_ab_params(1.0, 0.1)
    assert a == pytest.approx(1.5769434, abs=2e-4)
    assert b == pytest.approx(0.8950608, abs=2e-4)
    # residual actually small: the fit reproduces the target curve
    x = np.linspace(0.05, 3.0, 50)
    y = np.where(x < 0.1, 1.0, np.exp(-(x - 0.1)))
    assert np.abs(1.0 / (1.0 + a * x ** (2 * b)) - y).max() < 0.08


@pytest.mark.parametrize("lc", [1.0, 1.5, 2.0])
def test_smooth_knn_bit_identical_to_scalar(lc):
    rng = np.random.default_rng(0)
    n, k = 60, 14
    distmat = np.sort(rng.random((n, k)) * 3, axis=1)
    distmat[5, :] = 0.0       # k+1 exact duplicates
    distmat[7, :3] = 0.0      # zero-distance prefix
    distmat[9, :] = 1e-9      # near-duplicates -> MIN_K_DIST_SCALE clamp
    mask = np.ones((n, k), bool)
    mean_all = np.hstack([np.zeros((n, 1)), distmat]).mean()
    rho_v, sig_v = _smooth_knn_batch(distmat, mask, k + 1, mean_all, lc, 1.0)
    rho_s, sig_s = _smooth_knn_scalar(distmat, k + 1, local_connectivity=lc)
    np.testing.assert_array_equal(rho_v, rho_s)
    np.testing.assert_array_equal(sig_v, sig_s)


def test_neg_indices_deterministic_and_spread():
    h = np.arange(1000, dtype=np.int64)
    a = _neg_indices(h, 7, 2, 42, 500)
    b = _neg_indices(h, 7, 2, 42, 500)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() < 500
    # roughly uniform: every eighth of the range gets hits
    hist, _ = np.histogram(a, bins=8, range=(0, 500))
    assert hist.min() > 60
    # different epoch/slot -> different stream
    assert not np.array_equal(a, _neg_indices(h, 8, 2, 42, 500))
    assert not np.array_equal(a, _neg_indices(h, 7, 3, 42, 500))


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

def _emb_df(spark, X, ids=None):
    ids = np.arange(len(X), dtype=np.int64) if ids is None else ids
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(map(list, X))})
    return spark.createDataFrame(pdf, "vec_id long, embedding array<double>")


def test_fuzzy_edges_match_scalar_reference(spark):
    from top2vec_spark.operators.hdbscan import knn_graph

    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (40, 6))
    X[1] = X[0]  # duplicate pair
    emb = _emb_df(spark, X)
    k = 9
    knn = knn_graph(emb, k=k)
    rows = fuzzy_edges(knn, k + 1).collect()

    # independent scalar recomputation from the same kNN rows
    by_src: dict[int, list] = {}
    for r in knn.collect():
        by_src.setdefault(r["src"], []).append((r["rank"], r["dist"], r["dst"]))
    dmat = np.zeros((40, k))
    for s, lst in by_src.items():
        lst.sort()
        dmat[s] = [d for _, d, _ in lst]
    rho, sig = _smooth_knn_scalar(dmat, k + 1)
    got = {(r["src"], r["dst"]): (r["w"], r["rho"], r["sigma"]) for r in rows}
    assert len(got) == 40 * k
    for s, lst in by_src.items():
        for rank, d, dst in sorted(lst):
            w_exp = (
                1.0
                if (d - rho[s] <= 0 or sig[s] == 0)
                else float(np.exp(-(d - rho[s]) / sig[s]))
            )
            w, rh, sg = got[(s, dst)]
            assert rh == pytest.approx(rho[s], abs=1e-12)
            assert sg == pytest.approx(sig[s], abs=1e-12)
            assert w == pytest.approx(w_exp, abs=1e-12)


def test_symmetrize_equals_numpy_tconorm(spark):
    rng = np.random.default_rng(5)
    edges = []
    for s in range(20):
        for d in rng.choice([x for x in range(20) if x != s], 4, replace=False):
            edges.append((s, int(d), float(rng.random())))
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst", "w"]),
        "src long, dst long, w double",
    )
    W = np.zeros((20, 20))
    for s, d, w in edges:
        W[s, d] = w
    expected = W + W.T - W * W.T
    out = symmetrize(df).collect()
    got = np.zeros((20, 20))
    for r in out:
        got[r["src"], r["dst"]] = r["w"]
    np.testing.assert_allclose(got, expected, atol=1e-12)
    # symmetric, both directions present
    np.testing.assert_allclose(got, got.T, atol=1e-12)


def test_driver_and_distributed_optimizers_agree(spark):
    from top2vec_spark.operators.hdbscan import knn_graph

    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (50, 5))
    emb = _emb_df(spark, X)
    knn = knn_graph(emb, k=7)
    sym = symmetrize(fuzzy_edges(knn, 8)).persist()
    sym.count()
    a, b = find_ab_params()
    init = _emb_df(spark, rng.normal(0, 1, (50, 2)))
    try:
        kw = dict(n_epochs=4, a=a, b=b, seed=11)
        Yd = np.vstack(
            [
                r["embedding"]
                for r in embed_graph(sym, init, optimize="driver", **kw)
                .orderBy("vec_id")
                .collect()
            ]
        )
        Yx = np.vstack(
            [
                r["embedding"]
                for r in embed_graph(sym, init, optimize="distributed", **kw)
                .orderBy("vec_id")
                .collect()
            ]
        )
    finally:
        sym.unpersist()
    # same update rule, same seeds; only float summation order differs
    np.testing.assert_allclose(Yd, Yx, atol=1e-9)


def test_embedding_separates_planted_clusters(spark):
    rng = np.random.default_rng(7)
    X, lab = _clusters(rng)
    emb = _emb_df(spark, X)
    out = umap_reduce(
        emb, n_components=2, n_neighbors=15, metric="euclidean",
        n_epochs=150, seed=3,
    )
    rows = out.orderBy("vec_id").collect()
    Y = np.vstack([r["embedding"] for r in rows])
    assert Y.shape == (240, 2) and np.isfinite(Y).all()
    cents = np.vstack([Y[lab == c].mean(0) for c in range(3)])
    intra = np.mean(
        [np.linalg.norm(Y[lab == c] - cents[c], axis=1).mean() for c in range(3)]
    )
    inter = np.mean(
        [np.linalg.norm(cents[i] - cents[j]) for i in range(3) for j in range(i + 1, 3)]
    )
    assert inter / intra > 3.0  # dev runs show ~8-9x
    # nearest-centroid label recovery well above chance (1/3)
    assign = np.argmin(((Y[:, None, :] - cents[None, :, :]) ** 2).sum(-1), axis=1)
    assert (assign == lab).mean() > 0.95


def test_cosine_metric_and_neighbor_preservation(spark):
    rng = np.random.default_rng(11)
    X, _ = _clusters(rng, n_per=60, dim=10, sep=4.0, noise=0.5)
    emb = _emb_df(spark, X)
    out = umap_reduce(
        emb, n_components=2, n_neighbors=10, metric="cosine",
        n_epochs=120, seed=5,
    )
    Y = np.vstack([r["embedding"] for r in out.orderBy("vec_id").collect()])
    # input kNN (cosine) vs embedding kNN (euclidean) overlap
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    k = 10
    sim = Xn @ Xn.T
    np.fill_diagonal(sim, -np.inf)
    knn_in = np.argsort(-sim, axis=1)[:, :k]
    d2 = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    knn_out = np.argsort(d2, axis=1)[:, :k]
    overlap = np.mean(
        [len(set(knn_in[i]) & set(knn_out[i])) / k for i in range(len(X))]
    )
    assert overlap > 0.25  # chance = k/(n-1) ~ 0.056; dev runs ~0.33


def test_umap_reduce_deterministic(spark):
    rng = np.random.default_rng(13)
    X, _ = _clusters(rng, n_per=40, dim=6)
    emb = _emb_df(spark, X)
    kw = dict(n_components=2, n_neighbors=8, metric="euclidean", n_epochs=30, seed=9)
    Y1 = np.vstack(
        [r["embedding"] for r in umap_reduce(emb, **kw).orderBy("vec_id").collect()]
    )
    Y2 = np.vstack(
        [r["embedding"] for r in umap_reduce(emb, **kw).orderBy("vec_id").collect()]
    )
    np.testing.assert_array_equal(Y1, Y2)


def test_transform_points_lands_in_fitted_clusters(spark):
    rng = np.random.default_rng(17)
    X, lab = _clusters(rng, n_per=70, dim=8)
    fit_emb = _emb_df(spark, X)
    layout = umap_reduce(
        fit_emb, n_components=2, n_neighbors=15, metric="euclidean",
        n_epochs=120, seed=3,
    ).persist()
    Y = np.vstack([r["embedding"] for r in layout.orderBy("vec_id").collect()])

    Xn, labn = _clusters(rng, n_per=15, dim=8)  # fresh points, same geometry
    new_emb = _emb_df(spark, Xn, ids=np.arange(10_000, 10_000 + len(Xn)))
    try:
        got = transform_points(
            new_emb, fit_emb, layout, n_neighbors=15, metric="euclidean"
        ).orderBy("vec_id").collect()
    finally:
        layout.unpersist()
    Yn = np.vstack([r["embedding"] for r in got])
    assert Yn.shape == (45, 2) and np.isfinite(Yn).all()
    # a transformed point is a convex combination of its (almost
    # entirely same-cluster) fit neighbors' coordinates, so its
    # nearest FIT POINT in the layout must carry its planted label —
    # nearest-centroid would be confounded by layout outliers
    # (disconnected fuzzy components may drift; umap-learn's do too)
    d2 = ((Yn[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    assign = lab[np.argmin(d2, axis=1)]
    np.testing.assert_array_equal(assign, labn)


def test_discover_topics_umap_reduction_recovers_planted(spark):
    """The facade chain with reduction='umap': planted orthogonal
    clusters must come back as exactly three topics with the planted
    sizes (the same contract the PCA-reduction driver row pins)."""
    from top2vec_spark.api import Top2VecSpark

    rng = np.random.default_rng(23)
    sizes = [120, 80, 50]
    centers = np.eye(12)[:3] * 5.0
    X = np.vstack(
        [centers[c] + rng.normal(0, 0.1, (s, 12)) for c, s in enumerate(sizes)]
    )
    ids = np.arange(len(X), dtype=np.int64)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "text": [f"doc {i} words here" for i in ids]}),
        "doc_id long, text string",
    )
    emb = _emb_df(spark, X, ids=ids)
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.discover_topics(
        emb,
        umap_args={"n_components": 2, "n_neighbors": 15, "metric": "euclidean",
                   "n_epochs": 120, "seed": 3},
        reduction="umap",
    )
    got = [
        (r["topic_id"], r["topic_size"])
        for r in eng.get_topic_sizes().orderBy("topic_id").collect()
    ]
    assert got == [(0, 120), (1, 80), (2, 50)]
