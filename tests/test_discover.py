"""discover_topics — the reference's full density-discovery chain
(top2vec.py:1480-1590): PCA reduction (UMAP substitute) -> true
distributed HDBSCAN -> original-dim topic centroids (noise excluded)
-> duplicate-topic merge -> nearest-topic assignment. Pins cluster
recovery, merge semantics, guard parity, and facade coherence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 16


def _engine_for(spark, centers, n_per, scale=0.15, seed=11):
    """Clustered corpus: docs whose text carries a cluster marker term,
    embeddings = center + tight gaussian noise."""
    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(seed)
    doc_rows, emb_rows = [], []
    did = 0
    letters = "abcdefgh"
    for c, center in enumerate(centers):
        pts = center + rng.normal(scale=scale, size=(n_per, DIM))
        for p in pts:
            doc_rows.append(
                (
                    did,
                    f"marker{letters[c]} topic words about "
                    f"subject{letters[c]} item{letters[did % 7]}",
                )
            )
            emb_rows.append((did, [float(x) for x in p]))
            did += 1
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")
    return Top2VecSpark(spark, docs, min_count=1, ascii_fast_path=True), emb


def _orthogonal_centers(k, radius=5.0):
    c = np.zeros((k, DIM))
    for i in range(k):
        c[i, i] = radius
    return c


def test_discover_recovers_clusters_end_to_end(spark):
    eng, emb = _engine_for(spark, _orthogonal_centers(3), n_per=40)
    dt = eng.discover_topics(emb, hdbscan_args={"min_cluster_size": 10})
    assert eng.get_num_topics() == 3
    rows = dt.collect()
    assert len(rows) == 120
    # perfect purity: ground-truth cluster = doc_id // 40
    seen = {}
    for r in rows:
        truth = r["doc_id"] // 40
        seen.setdefault(truth, set()).add(r["topic_id"])
    assert all(len(v) == 1 for v in seen.values())
    assert len({next(iter(v)) for v in seen.values()}) == 3
    # sizes all 40 after size-renumbering
    sizes = {r["topic_id"]: r["topic_size"] for r in eng.get_topic_sizes().collect()}
    assert sizes == {0: 40, 1: 40, 2: 40}
    # topic words surface each cluster's marker term
    words = eng.get_topics(3).collect()
    by_topic = {}
    for r in words:
        by_topic.setdefault(r["topic_id"], []).append(r["term"])
    for tid, terms in by_topic.items():
        assert any(t.startswith("marker") for t in terms[:5])
    # reduction happened at the reference's default 5 components,
    # but centroids live in ORIGINAL space (top2vec.py:1056-1062)
    assert eng._reduction_model.components.shape == (5, DIM)
    cent = eng.topic_centroids.collect()[0]["centroid"]
    assert len(cent) == DIM


def test_discover_merges_same_direction_topics(spark):
    # two dense clusters along +e0 at radii 5 and 10 (cosine ~ 1,
    # euclidean-separated) + one orthogonal cluster. HDBSCAN sees 3;
    # the reference's dedup (dbscan eps=topic_merge_delta on cosine
    # distance, top2vec.py:1064-1086) folds the colinear pair.
    centers = np.zeros((3, DIM))
    centers[0, 0] = 5.0
    centers[1, 0] = 10.0
    centers[2, 1] = 5.0
    eng, emb = _engine_for(spark, centers, n_per=30, scale=0.1)
    eng.discover_topics(
        emb, hdbscan_args={"min_cluster_size": 10}, topic_merge_delta=0.0
    )
    assert eng.get_num_topics() == 3
    eng2, emb2 = _engine_for(spark, centers, n_per=30, scale=0.1)
    dt = eng2.discover_topics(emb2, hdbscan_args={"min_cluster_size": 10})
    assert eng2.get_num_topics() == 2
    # merged topic is the big one and is renumbered to id 0
    sizes = {r["topic_id"]: r["topic_size"] for r in eng2.get_topic_sizes().collect()}
    assert sizes == {0: 60, 1: 30}
    assert dt.count() == 90


def test_discover_all_noise_raises(spark):
    # n < 2*min_cluster_size -> provably all noise
    eng, emb = _engine_for(spark, _orthogonal_centers(1), n_per=20)
    with pytest.raises(ValueError, match="no dense clusters"):
        eng.discover_topics(emb, hdbscan_args={"min_cluster_size": 15})


def test_discover_guard_parity(spark):
    eng, emb = _engine_for(spark, _orthogonal_centers(1), n_per=20)
    with pytest.raises(ValueError, match="metric 'cosine' not"):
        eng.discover_topics(emb, hdbscan_args={"metric": "cosine"})
    with pytest.raises(ValueError, match="cluster_selection_method 'leaf'"):
        eng.discover_topics(
            emb, hdbscan_args={"cluster_selection_method": "leaf"}
        )
    with pytest.raises(ValueError, match="no document vectors"):
        eng.discover_topics()


def test_discover_facade_coherence(spark):
    eng, emb = _engine_for(spark, _orthogonal_centers(2), n_per=30)
    eng.discover_topics(emb, hdbscan_args={"min_cluster_size": 10})
    # keyword -> topic search works off the discovered c-TF-IDF
    res = eng.search_topics(["markera"], 2).collect()
    assert res[0]["score"] >= res[-1]["score"]
    top = res[0]["topic_id"]
    # docs-by-topic returns members of that topic, descending score
    docs = eng.search_documents_by_topic(top, 5).collect()
    assert len(docs) == 5
    scores = [r["score"] for r in docs]
    assert scores == sorted(scores, reverse=True)
    # vector search over the same table the topics were built from
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    hits = eng.search_documents_by_vector(list(q), 3).collect()
    assert hits[0]["doc_id"] == 0
