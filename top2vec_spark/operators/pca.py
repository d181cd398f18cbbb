"""Distributed PCA over an embedding column — the engine's
dimensionality-reduction stage for topic discovery (SURVEY.md §2.10).

Reference contract: Top2Vec reduces document vectors to 5 dimensions
with UMAP before density clustering (reference top2vec.py:1541-1551,
``umap_args = {'n_components': 5, ...}``). UMAP itself is an
iterative SGD layout with no faithful distributed re-expression; this
engine substitutes linear PCA (documented semantics delta, SURVEY.md
§7.6): same pipeline position (high-dim -> low-dim before HDBSCAN),
deterministic, and one-pass distributed.

Spark shape (the 10^12-row story):
- ``fit_pca`` is ONE narrow mapInPandas pass emitting ONE partial
  moment row per partition (count, sum vector, sum of outer
  products). Partials are O(partitions) x O(d^2) — collected to the
  driver and combined there (d is small: 5..1024). No shuffle at all;
  the reduction is the collect of ~num_partitions tiny rows.
- The d x d covariance eigendecomposition is driver-side numpy
  (O(d^3), microseconds for d<=1024).
- ``transform_pca`` broadcasts (mean, components) and projects each
  Arrow batch with one matmul — narrow, zero shuffle.

Determinism: eigenvector SIGN is fixed by convention (the component
entry with the largest magnitude is made positive), so repeated fits
over the same data give byte-identical projections.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack(col.to_numpy()).astype(np.float64)


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes, desc. variance
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    n: int


def _moments(embeddings: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass -> (n, sum_x (d,), sum_xxT (d,d)).

    Emits ONE row per partition (not per Arrow batch): the in-task
    accumulation is the map-side combine, so the driver collects only
    O(num_partitions) rows regardless of corpus size."""

    def partial(pdfs):
        n = 0
        s = None
        xtx = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            m = _as_matrix(pdf[vec_col])
            n += m.shape[0]
            if s is None:
                s = m.sum(axis=0)
                xtx = m.T @ m
            else:
                s += m.sum(axis=0)
                xtx += m.T @ m
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "xtx": [xtx.ravel().tolist()],
                }
            )

    parts = embeddings.select(vec_col).mapInPandas(
        partial, "n long, s array<double>, xtx array<double>"
    ).collect()
    if not parts:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"], dtype=np.float64) for r in parts], axis=0)
    d = s.shape[0]
    xtx = np.sum(
        [np.asarray(r["xtx"], dtype=np.float64).reshape(d, d) for r in parts],
        axis=0,
    )
    return n, s, xtx


def fit_pca(
    embeddings: DataFrame,
    n_components: int = 5,
    vec_col: str = "embedding",
) -> PCAModel:
    """Fit PCA: distributed moments -> driver-side d x d eigh."""
    n, s, xtx = _moments(embeddings, vec_col)
    mu = s / n
    # population covariance: E[xx^T] - mu mu^T (ONE division per
    # entry, same formula the DuckDB oracle replays)
    cov = xtx / n - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(n_components, cov.shape[0])]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|entry| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mu,
        components=comps,
        explained_variance=evals[order],
        n=n,
    )


def transform_pca(
    embeddings: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "embedding",
) -> DataFrame:
    """Project to the principal subspace: (id, vec) -> (id, vec_k).

    Broadcast (mean, components); one matmul per Arrow batch. Narrow
    plan — partitioning of the input is preserved (no Exchange)."""
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast((model.mean, model.components))

    def project(pdfs):
        mu, comps = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            m = _as_matrix(pdf[vec_col])
            z = (m - mu) @ comps.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: list(map(list, z))}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, {out_col} array<double>"
    )


def covariance_table(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """The fitted covariance as an (i, j, cov) relation (upper
    triangle), for inspection and the driver's DuckDB oracle row.
    The heavy lifting is the same one-pass distributed moment
    aggregation as ``fit_pca``; the emitted relation is d(d+1)/2
    rows — driver-size by construction."""
    spark = embeddings.sparkSession
    n, s, xtx = _moments(embeddings, vec_col)
    mu = s / n
    cov = xtx / n - np.outer(mu, mu)
    d = cov.shape[0]
    rows = [
        (int(i), int(j), float(cov[i, j]))
        for i in range(d)
        for j in range(i, d)
    ]
    return spark.createDataFrame(rows, "i int, j int, cov double")
