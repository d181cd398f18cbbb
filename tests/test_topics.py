"""Topic layer (SURVEY.md §7.6): sizes, renumbering, c-TF-IDF words,
membership search, hierarchical reduction."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.similarity import assign_nearest, label_centroids
from top2vec_spark.operators.topics import (
    hierarchical_topic_reduction,
    renumber_topics_by_size,
    search_documents_by_topic,
    topic_sizes,
    topic_words_ctfidf,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def doc_topic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dt = assign_nearest(emb, label_centroids(emb)).select(
        F.col("vec_id").alias("doc_id"),
        F.col("assigned_label").alias("topic_id"),
        "score",
    )
    return dt.cache()


def test_topic_sizes_conservation(doc_topic):
    """Reference invariant (test_top2vec.py:241-248): sizes sum to
    n_docs."""
    sizes = topic_sizes(doc_topic).collect()
    assert sum(r["topic_size"] for r in sizes) == doc_topic.count()
    vals = [r["topic_size"] for r in sizes]
    assert vals == sorted(vals, reverse=True)


def test_renumbering(doc_topic):
    ren = renumber_topics_by_size(doc_topic)
    sizes = topic_sizes(ren).collect()
    # topic 0 is the biggest after renumbering; ids are dense 0..k-1
    ids = sorted(r["topic_id"] for r in sizes)
    assert ids == list(range(len(ids)))
    assert sizes[0]["topic_id"] == 0


def test_membership_search_semantics(doc_topic):
    """Docs returned for a topic really belong to it and come back
    score-desc (reference test_top2vec.py:283-294)."""
    top = topic_sizes(doc_topic).first()["topic_id"]
    res = search_documents_by_topic(doc_topic, top, 10).collect()
    assert len(res) == 10
    assert all(r["topic_id"] == top for r in res)
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_ctfidf_topic_words(spark):
    rows = [
        (0, 0, "apple banana apple fruit"),
        (1, 0, "apple fruit banana apple"),
        (2, 1, "car engine wheel car"),
        (3, 1, "engine car road wheel"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, topic_id long, text string")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    words = topic_words_ctfidf(tf, docs.select("doc_id", "topic_id"), top_n=3)
    by_topic = {}
    for r in words.collect():
        by_topic.setdefault(r["topic_id"], []).append((r["rank"], r["term"]))
    assert sorted(by_topic[0])[0][1] == "apple"  # top word of topic 0
    assert sorted(by_topic[1])[0][1] in ("car", "engine")
    # topic-exclusive words rank above shared ones; no cross-topic leak
    assert "car" not in [t for _, t in by_topic[0]]


def test_hierarchical_reduction():
    cents = {
        0: np.array([1.0, 0.0, 0.0]),
        1: np.array([0.9, 0.1, 0.0]),  # close to 0
        2: np.array([0.0, 1.0, 0.0]),
        3: np.array([0.0, 0.0, 1.0]),
    }
    sizes = {0: 100, 1: 5, 2: 50, 3: 40}
    reduced, hierarchy = hierarchical_topic_reduction(cents, sizes, 3)
    assert len(reduced) == 3
    assert [0, 1] in hierarchy  # smallest (1) merged into most-similar (0)
    # merged centroid stays unit-norm
    for v in reduced.values():
        assert np.linalg.norm(v) == pytest.approx(1.0)
    # reduce further
    reduced2, h2 = hierarchical_topic_reduction(cents, sizes, 1)
    assert len(reduced2) == 1 and sorted(h2[0]) == [0, 1, 2, 3]
