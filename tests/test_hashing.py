"""Feature-hashing document vectors (operators/hashing.py): exact
arithmetic vs the pure-Python mirror, unit norms, OOV/zero-vector
drop semantics, idf weighting, and the turnkey end-to-end path
(hashed vectors -> compute_topics -> vector search)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from top2vec_spark.api import Top2VecSpark
from top2vec_spark.operators.hashing import (
    hashed_doc_vectors,
    hashed_vector_py,
)


@pytest.fixture(scope="module")
def eng(spark, tiny_docs):
    return Top2VecSpark(spark, tiny_docs, min_count=0)


@pytest.fixture(scope="module")
def vecs(eng):
    return {
        r["vec_id"]: list(r["embedding"])
        for r in eng.hashed_document_vectors(dim=16).collect()
    }


def test_matches_python_mirror(eng, vecs):
    vocab = {r["term"]: r["term_id"] for r in eng.vocab.collect()}
    tf = (
        eng.tokens.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in tf:
        by_doc.setdefault(r["doc_id"], []).append(
            (vocab[r["term"]], r["tf"])
        )
    for doc_id, pairs in by_doc.items():
        exp = hashed_vector_py(pairs, 16)
        assert exp, doc_id
        got = vecs[doc_id]
        assert all(
            abs(a - b) < 1e-6 for a, b in zip(exp, got)
        ), doc_id


def test_unit_norm(vecs):
    for doc_id, v in vecs.items():
        assert math.isqrt  # noqa: B018 - keep flake quiet
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5, doc_id


def test_deterministic_across_partitionings(spark, tiny_docs):
    a = Top2VecSpark(
        spark, tiny_docs.repartition(1), min_count=0
    ).hashed_document_vectors(dim=16)
    b = Top2VecSpark(
        spark, tiny_docs.repartition(7), min_count=0
    ).hashed_document_vectors(dim=16)
    ra = {r["vec_id"]: list(r["embedding"]) for r in a.collect()}
    rb = {r["vec_id"]: list(r["embedding"]) for r in b.collect()}
    assert ra == rb  # bit-identical: integer sums, same divide


def test_oov_doc_absent(spark):
    # min_count=1 (strict >) drops every term occurring once; doc 1
    # has only singleton terms -> no vector (no zero vector on the
    # unit sphere)
    docs = spark.createDataFrame(
        [(0, "aaa bbb aaa bbb"), (1, "zzz qqq www")],
        "doc_id long, text string",
    )
    eng = Top2VecSpark(spark, docs, min_count=1)
    ids = {
        r["vec_id"]
        for r in eng.hashed_document_vectors(dim=8).collect()
    }
    assert ids == {0}


def test_idf_downweights_common_terms(eng):
    out = eng.hashed_document_vectors(dim=16, use_idf=True)
    rows = out.collect()
    assert rows and all(
        abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-5
        for r in rows
    )
    # 'the' (df=3 of 6 docs) gets idf ln(2); 'sat' (df=3) same; a
    # df=1 term carries ln(6): verify idf ordering shifts doc 5
    # ('sat' x4 only) vs tf weighting is still a unit vector with a
    # single bucket
    v5 = [r["embedding"] for r in rows if r["vec_id"] == 5][0]
    nz = [x for x in v5 if x != 0]
    assert len(nz) == 1 and abs(abs(nz[0]) - 1.0) < 1e-6


def test_end_to_end_topics_and_search(spark, tiny_docs):
    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    emb = eng.hashed_document_vectors(dim=16)
    eng.compute_topics(emb, n_topics=2)
    sizes = eng.get_topic_sizes().collect()
    assert sum(r["topic_size"] for r in sizes) == 6
    # a doc's own vector retrieves the doc itself first
    v5 = [
        list(r["embedding"])
        for r in emb.collect()
        if r["vec_id"] == 5
    ][0]
    top = eng.search_documents_by_vector(v5, 2).collect()
    assert top[0]["doc_id"] == 5


def test_plan_two_small_exchanges_only(eng):
    """Scale pin: the plan must carry exactly 2 hash Exchanges (the
    map-side-combined (doc_id, bucket) sum and the per-doc assembly)
    plus broadcast joins — the raw token stream must never shuffle.
    A third Exchange means someone reintroduced a tf pre-aggregation
    or lost the broadcast."""
    v = eng.hashed_document_vectors(dim=16)
    plan = v._jdf.queryExecution().executedPlan().toString()
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_use_idf_requires_n_docs(eng):
    with pytest.raises(ValueError, match="n_docs"):
        hashed_doc_vectors(
            eng.tokens, eng.vocab, dim=8, use_idf=True
        )
