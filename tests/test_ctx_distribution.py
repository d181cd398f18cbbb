"""Contextual per-document topic distribution / relevance — reference
calculate_documents_topic_distributions (top2vec.py:805-856) +
get_document_topic_distribution (1633-1646) /
get_document_topic_relevance (1648-1661), plus the embedding-model
path setters (1846-1870) and get_label_vocabulary (859-896).

Every numeric assertion replays the reference's own numpy loop
verbatim (np.inner -> argmax/max -> per-label count fractions and
mean scores) so the engine's one-map-one-groupBy re-expression is
pinned against the reference algorithm, not a reimplementation of
the engine."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from top2vec_spark.api import Top2VecSpark


def _make_token_model():
    # nested so cloudpickle ships it by value (qualname has <locals>),
    # not by module path — executors don't import the test module
    def fake_token_model(texts):
        out = []
        for t in texts:
            toks = t.lower().split()
            mat = [
                [
                    float(len(tok)),
                    tok.count("a") + 1.0,
                    tok.count("e") + 1.0,
                    7.0,
                ]
                for tok in toks
            ]
            out.append((toks, mat))
        return out

    return fake_token_model


_fake_token_model = _make_token_model()


TOPIC_VECTORS = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 2.0, -1.0, 0.0],
        [0.0, 0.0, 1.0, -0.5],
    ]
)


def _reference_replay(docs):
    """Verbatim transcription of reference top2vec.py:805-856."""
    labels, vecs = [], []
    for doc_id, text in docs:
        toks, mat = _fake_token_model([text])[0]
        for v in mat:
            labels.append(doc_id)
            vecs.append(v)
    document_vectors = np.array(vecs)
    document_labels = np.array(labels)
    res = np.inner(document_vectors, TOPIC_VECTORS)
    doc_top = np.argmax(res, axis=1)
    doc_dist = np.max(res, axis=1)
    dist: dict = {}
    scores: dict = {}
    for doc_ind in np.unique(document_labels):
        doc_inds = np.where(document_labels == doc_ind)[0]
        token_topics = doc_top[doc_inds]
        token_scores = doc_dist[doc_inds]
        n = len(doc_inds)
        uniq, counts = np.unique(token_topics, return_counts=True)
        for topic, cnt in zip(uniq, counts):
            dist[(int(doc_ind), int(topic))] = cnt / n
            scores[(int(doc_ind), int(topic))] = float(
                token_scores[token_topics == topic].mean()
            )
    sizes: dict = {}
    for t in doc_top:
        sizes[int(t)] = sizes.get(int(t), 0) + 1
    return dist, scores, sizes


@pytest.fixture(scope="module")
def ctx_engine(spark, tiny_docs):
    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    eng.set_token_embedding_model(_fake_token_model)
    eng.embed_document_tokens(batch_size=2)
    return eng


def _topic_df(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(TOPIC_VECTORS)],
        "label long, centroid array<double>",
    )


def test_distribution_matches_reference_loop(spark, tiny_docs, ctx_engine):
    dist, scores, _ = _reference_replay(
        [(r["doc_id"], r["text"]) for r in tiny_docs.collect()]
    )
    out = ctx_engine.calculate_documents_topic_distributions(
        topic_vectors=_topic_df(spark)
    ).collect()
    assert len(out) == len(dist)
    for r in out:
        key = (r["doc_id"], r["topic_id"])
        assert r["probability"] == pytest.approx(dist[key], abs=1e-12)
        assert r["relevance"] == pytest.approx(scores[key], abs=1e-12)
    # distribution is a probability per doc
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["probability"]
    for s in per_doc.values():
        assert s == pytest.approx(1.0, abs=1e-12)


def test_getters_and_token_topic_sizes(spark, tiny_docs, ctx_engine):
    _, _, sizes = _reference_replay(
        [(r["doc_id"], r["text"]) for r in tiny_docs.collect()]
    )
    ctx_engine.calculate_documents_topic_distributions(
        topic_vectors=_topic_df(spark)
    )
    d = ctx_engine.get_document_topic_distribution()
    r = ctx_engine.get_document_topic_relevance()
    assert d.columns == ["doc_id", "topic_id", "probability"]
    assert r.columns == ["doc_id", "topic_id", "relevance"]
    got = {
        row["topic_id"]: row["topic_size"]
        for row in ctx_engine.get_token_topic_sizes().collect()
    }
    assert got == sizes
    # ordered largest-first like the reference's value_counts
    ordered = [
        row["topic_size"]
        for row in ctx_engine.get_token_topic_sizes().collect()
    ]
    assert ordered == sorted(ordered, reverse=True)


def test_getters_raise_before_calculation(spark, tiny_docs):
    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    with pytest.raises(ValueError, match="calculate_documents_topic"):
        eng.get_document_topic_distribution()
    with pytest.raises(ValueError, match="calculate_documents_topic"):
        eng.get_document_topic_relevance()
    with pytest.raises(ValueError, match="calculate_documents_topic"):
        eng.get_token_topic_sizes()
    with pytest.raises(ValueError, match="embed_document_tokens first"):
        eng.calculate_documents_topic_distributions(
            topic_vectors=None, token_embeddings=None
        )


def test_argmax_tie_breaks_to_smaller_topic_id(spark):
    """np.argmax takes the FIRST max (reference
    _calculate_documents_topic) — a token equidistant to two topics
    must land in the smaller topic_id."""
    eng_docs = spark.createDataFrame(
        [(0, "aa")], "doc_id long, text string"
    )
    eng = Top2VecSpark(spark, eng_docs, min_count=0)
    eng.set_token_embedding_model(_fake_token_model)
    eng.embed_document_tokens()
    # token 'aa' -> vec [2, 3, 1, 7]; both topics score 2*1+3*1=5
    tv = spark.createDataFrame(
        [(0, [1.0, 1.0, 0.0, 0.0]), (1, [1.0, 1.0, 0.0, 0.0])],
        "label long, centroid array<double>",
    )
    rows = eng.calculate_documents_topic_distributions(
        topic_vectors=tv
    ).collect()
    assert len(rows) == 1
    assert rows[0]["topic_id"] == 0
    assert rows[0]["relevance"] == pytest.approx(5.0)


def test_embedding_model_path_setters(spark, tiny_docs):
    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    eng.update_embedding_model_path("/models/use-large")
    assert eng.embedding_model_path == "/models/use-large"
    eng.change_to_download_embedding_model()
    assert eng.embedding_model_path is None


def test_get_label_vocabulary(spark, tiny_docs):
    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    # strict '>' — corpus counts: 'the' 6x, 'sat' 6x, everything else <3
    terms = {r["term"] for r in eng.get_label_vocabulary(min_count=4).collect()}
    assert terms == {"the", "sat"}
    # cf == 6 fails a strict '> 6' filter (reference np.where(wc > mc))
    with pytest.raises(ValueError, match="min_count of 6 results in"):
        eng.get_label_vocabulary(min_count=6)


def test_get_label_vocabulary_ngram_replaces(spark):
    """ngram_vocab=True REPLACES the vocabulary with mined phrases
    (reference top2vec.py:878-894: vocab = phrases)."""
    docs = spark.createDataFrame(
        [(i, "machine learning rules machine learning wins x" + str(i))
         for i in range(8)],
        "doc_id long, text string",
    )
    eng = Top2VecSpark(spark, docs, min_count=0)
    out = {
        r["term"]
        for r in eng.get_label_vocabulary(
            ngram_vocab=True,
            ngram_vocab_args={"min_count": 2, "threshold": 0.2},
        ).collect()
    }
    assert all(" " in t for t in out)  # phrases only — vocab replaced
    assert "machine learning" in out


def test_default_topic_vectors_path(spark, tiny_docs, ctx_engine):
    """topic_vectors=None must pull the engine's computed topic
    centroids (_centroid_df) — the reference's self.topic_vectors
    default (top2vec.py:816-822)."""
    emb = spark.createDataFrame(
        [
            (r["doc_id"], [1.0, 0.0, 0.0, 0.0])
            if r["doc_id"] % 2 == 0
            else (r["doc_id"], [0.0, 1.0, 0.0, 0.0])
            for r in tiny_docs.collect()
        ],
        "vec_id long, embedding array<float>",
    )
    ctx_engine.compute_topics(emb, n_topics=2)
    out = ctx_engine.calculate_documents_topic_distributions()
    rows = out.collect()
    assert rows, "default-centroid path returned nothing"
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["probability"]
    for s in per_doc.values():
        assert s == pytest.approx(1.0, abs=1e-9)
