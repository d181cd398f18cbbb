"""W1/W2 window operators vs numpy oracles + topic API wiring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.windows import sliding_window_mean, smooth_adjacent

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def tok_vecs(spark):
    rng = np.random.default_rng(5)
    rows = []
    for d in range(4):
        n = int(rng.integers(3, 30))
        for p in range(n):
            rows.append((d, p, rng.normal(size=4).tolist()))
    return spark.createDataFrame(
        rows, "doc_id long, pos int, vec array<double>"
    ).cache()


def _collect_np(tok_vecs):
    docs = {}
    for r in tok_vecs.collect():
        docs.setdefault(r["doc_id"], {})[r["pos"]] = np.array(r["vec"])
    return {
        d: np.vstack([m[p] for p in sorted(m)]) for d, m in docs.items()
    }


def test_smooth_adjacent_matches_numpy(tok_vecs):
    w = 2
    got = {}
    for r in smooth_adjacent(tok_vecs, w=w).collect():
        got[(r["doc_id"], r["pos"])] = np.array(r["vec"])
    for d, mat in _collect_np(tok_vecs).items():
        normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n = mat.shape[0]
        for p in range(n):
            lo, hi = max(0, p - w), min(n, p + w + 1)
            expect = normed[lo:hi].mean(axis=0)
            np.testing.assert_allclose(got[(d, p)], expect, atol=1e-9)


def test_sliding_window_mean_matches_reference_arithmetic(tok_vecs):
    window, stride = 8, 5
    got = {}
    for r in sliding_window_mean(tok_vecs, window, stride).collect():
        got.setdefault(r["doc_id"], {})[r["start"]] = np.array(r["vec"])
    for d, mat in _collect_np(tok_vecs).items():
        n = mat.shape[0]
        # reference embedding.py:112-144: starts 0, stride, ...;
        # overrun windows right-aligned to max(0, n-window), deduped
        starts = []
        s = 0
        while True:
            if s + window >= n:
                starts.append(max(0, n - window))
                break
            starts.append(s)
            s += stride
        starts = sorted(set(starts))
        assert sorted(got[d]) == starts, (d, n)
        for s0 in starts:
            expect = mat[s0 : s0 + window].mean(axis=0)
            np.testing.assert_allclose(got[d][s0], expect, atol=1e-9)


def test_topic_api_wiring(spark):
    from top2vec_spark import Top2VecSpark

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    dt = eng.compute_topics(emb)
    sizes = eng.get_topic_sizes().collect()
    assert sum(r["topic_size"] for r in sizes) == emb.count()
    assert eng.get_num_topics() == len(sizes)
    # topic ids dense 0..k-1 after renumbering, topic 0 largest
    assert sizes[0]["topic_id"] == 0
    res = eng.search_documents_by_topic(0, 5, return_documents=True).collect()
    assert len(res) == 5 and "text" in res[0].asDict()
    words = eng.get_topics().collect()
    assert {r["topic_id"] for r in words} == {r["topic_id"] for r in sizes}
    reduced, hierarchy = eng.hierarchical_topic_reduction(3)
    assert len(reduced) == 3
    assert sum(len(h) for h in hierarchy) == len(sizes)
    # get_documents_by_ids
    got = eng.get_documents_by_ids([1, 3]).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 3]
    with pytest.raises(ValueError):
        eng.get_documents_by_ids([999999])


def test_batched_keyword_search_api(spark, tmp_path):
    from top2vec_spark import Top2VecSpark
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.sources.pages import generate_pages_pdf

    pdf = generate_pages_pdf(300, seed=21)
    docs = assign_doc_ids(spark.createDataFrame(pdf[["url", "text"]]))
    eng = Top2VecSpark(spark, docs)
    eng.build_index(str(tmp_path / "bidx"))
    batch = {"a": (["wa"], []), "b": (["wb", "wc"], ["wa"])}
    res = eng.search_documents_by_keywords_batch(batch, 5).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, (pos, neg) in batch.items():
        single = [
            (r["doc_id"], r["score"])
            for r in eng.search_documents_by_keywords(
                pos, 5, keywords_neg=neg, return_documents=False
            ).collect()
        ]
        assert by_q[qid] == single
