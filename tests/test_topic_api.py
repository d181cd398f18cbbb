"""Round-2 API surface: search_topics / query_topics /
get_documents_topics / vector entry points / reduced-topic mirror /
topic merge / tokenizer+chunker hooks — invariants mirroring the
reference suite shapes (test_top2vec.py: descending scores, size
conservation, self-consistency)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    from top2vec_spark import Top2VecSpark

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb)
    return eng


def test_search_topics_descending_and_relevant(engine):
    # pick a term known to the vocab with decent frequency
    term = (
        engine.vocab.orderBy(F.col("df").desc()).limit(5).collect()[2]["term"]
    )
    res = engine.search_topics([term], 5).collect()
    assert 1 <= len(res) <= 5
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    # the top topic must actually contain the term among its words
    top_topic = res[0]["topic_id"]
    words = {
        r["term"]
        for r in engine.get_topics().filter(
            F.col("topic_id") == top_topic
        ).collect()
    }
    assert term in words or scores[0] > 0


def test_search_topics_unknown_keyword_raises(engine):
    with pytest.raises(ValueError, match="has not been learned"):
        engine.search_topics(["zzzznotaword"], 3)


def test_query_topics(engine):
    term = engine.vocab.orderBy(F.col("df").desc()).first()["term"]
    res = engine.query_topics(f"Some text about {term}!", 3).collect()
    assert len(res) >= 1
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="vocabulary"):
        engine.query_topics("zzzznotaword qqqqq", 3)


def test_get_documents_topics_single(engine):
    got = {r["doc_id"]: r for r in engine.get_documents_topics([3, 7, 11]).collect()}
    assert set(got) == {3, 7, 11}
    stored = {
        r["doc_id"]: r["topic_id"]
        for r in engine.doc_topic.filter(F.col("doc_id").isin([3, 7, 11])).collect()
    }
    for d in (3, 7, 11):
        assert got[d]["topic_id"] == stored[d]
        assert got[d]["rank"] == 1


def test_get_documents_topics_topn(engine):
    res = engine.get_documents_topics([3, 7], num_topics=3).collect()
    by_doc = {}
    for r in res:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3]
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # rank-1 equals the stored assignment
    stored = {
        r["doc_id"]: r["topic_id"]
        for r in engine.doc_topic.filter(F.col("doc_id").isin([3, 7])).collect()
    }
    for d in (3, 7):
        assert by_doc[d][0]["topic_id"] == stored[d]


def test_vector_entry_points(spark, engine):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]

    docs = engine.search_documents_by_vector(qvec, 5, return_documents=False).collect()
    assert docs[0]["doc_id"] == 7  # self is the nearest vector
    assert [r["score"] for r in docs] == sorted(
        [r["score"] for r in docs], reverse=True
    )

    topics = engine.search_topics_by_vector(qvec, 3).collect()
    assert len(topics) == 3
    # best topic by vector == the doc's assigned topic
    assigned = engine.doc_topic.filter(F.col("doc_id") == 7).first()["topic_id"]
    assert topics[0]["topic_id"] == assigned

    # word vectors: synthesize from topic centroids (term == topic word)
    wv = engine.spark.createDataFrame(
        [(f"w{r['label']}", [float(x) for x in r["centroid"]])
         for r in engine.topic_centroids.collect()],
        "term string, embedding array<double>",
    )
    engine.set_word_vectors(wv)
    words = engine.search_words_by_vector(qvec, 3).collect()
    assert words[0]["term"] == f"w{assigned}"


def test_use_index_vector_search(spark, engine):
    """Reference index_document_vectors / index_word_vectors +
    use_index=True serving (top2vec.py:1710-1788, 2627-2643): guard
    message parity before indexing, exactness at exhaustive ef, and
    the word-id mapping join."""
    import pytest as _pt

    engine._document_index = None
    engine._word_index = None
    with _pt.raises(ImportError, match="no document index"):
        engine.search_documents_by_vector([0.0] * 64, 5, use_index=True)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    brute = engine.search_documents_by_vector(
        qvec, 5, return_documents=False
    ).collect()

    engine.index_document_vectors(ef_construction=64, M=8, n_shards=2)
    # ef >= corpus size -> provably exhaustive -> equals brute exactly
    idx = engine.search_documents_by_vector(
        qvec, 5, return_documents=False, use_index=True, ef=1000
    ).collect()
    assert [r["doc_id"] for r in idx] == [r["doc_id"] for r in brute]
    for a, b in zip(idx, brute):
        assert a["score"] == _pt.approx(b["score"], abs=1e-9)
    # reference ef=None default (set_ef(num_docs)) still returns k docs
    dflt = engine.search_documents_by_vector(
        qvec, 5, return_documents=False, use_index=True
    ).collect()
    assert len(dflt) == 5 and dflt[0]["doc_id"] == 7
    # batched facade twin: identical ranking in one job
    batched = engine.search_documents_by_vectors_batch(
        {"a": qvec}, 5, ef=1000
    ).collect()
    assert [r["doc_id"] for r in batched] == [r["doc_id"] for r in idx]
    assert all(r["query_id"] == "a" for r in batched)

    # word side: vectors from topic centroids, mapping joined back
    wv = engine.spark.createDataFrame(
        [(f"w{r['label']}", [float(x) for x in r["centroid"]])
         for r in engine.topic_centroids.collect()],
        "term string, embedding array<double>",
    )
    engine.set_word_vectors(wv)
    with _pt.raises(ImportError, match="no word index"):
        engine.search_words_by_vector(qvec, 3, use_index=True)
    engine.index_word_vectors(ef_construction=64, M=8, n_shards=1)
    brute_w = engine.search_words_by_vector(qvec, 3).collect()
    idx_w = engine.search_words_by_vector(
        qvec, 3, use_index=True, ef=1000
    ).collect()
    assert [r["term"] for r in idx_w] == [r["term"] for r in brute_w]
    # blob storage quantizes float64 inputs to float32 -> ~1e-7 score drift
    for a, b in zip(idx_w, brute_w):
        assert a["score"] == _pt.approx(b["score"], abs=1e-6)


def test_index_lifecycle_add_delete(spark):
    """Reference parity for the indexed-model lifecycle: deletes mark
    tombstones in the ANN index (hnswlib mark_deleted,
    top2vec.py:2104-2110) and adds append an epoch (add_items,
    top2vec.py:2040-2058) — searches see both immediately, no
    rebuild. The brute vector path must also drop deleted docs
    (np.delete parity, top2vec.py:2091)."""
    from top2vec_spark import Top2VecSpark

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb)
    eng.index_document_vectors(ef_construction=64, M=8, n_shards=2)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    base = eng.search_documents_by_vector(
        qvec, 5, return_documents=False, use_index=True, ef=1000
    ).collect()
    assert base[0]["doc_id"] == 7

    # delete the top hit: tombstoned out of the index AND the brute path
    eng2 = eng.delete_documents([7])
    got = eng2.search_documents_by_vector(
        qvec, 5, return_documents=False, use_index=True, ef=1000
    ).collect()
    assert all(r["doc_id"] != 7 for r in got)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in base[1:]] + [
        got[-1]["doc_id"]
    ]
    brute = eng2.search_documents_by_vector(
        qvec, 5, return_documents=False
    ).collect()
    assert [r["doc_id"] for r in brute] == [r["doc_id"] for r in got]

    # add a doc whose embedding IS the query: epoch-appended, found first
    new_docs = spark.createDataFrame(
        [(100000, "a fresh appended document", "en", "t", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    new_emb = spark.createDataFrame(
        [(100000, qvec)], "vec_id long, embedding array<float>"
    )
    eng3 = eng2.add_documents(new_docs, new_embeddings=new_emb)
    got3 = eng3.search_documents_by_vector(
        qvec, 5, return_documents=False, use_index=True, ef=1000
    ).collect()
    assert got3[0]["doc_id"] == 100000
    assert got3[0]["score"] == pytest.approx(1.0, abs=1e-6)
    assert all(r["doc_id"] != 7 for r in got3)  # tombstones carried


def test_ann_index_save_load_roundtrip(spark, tmp_path):
    """Reference save/load serializes + rehydrates the hnswlib indexes
    (top2vec.py:894-943, 945-1012): after save_ann_indexes ->
    load_ann_indexes into a FRESH engine, indexed searches (including
    tombstones and the word-id mapping) return identical results."""
    from top2vec_spark import Top2VecSpark

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.set_document_vectors(emb.select("vec_id", "embedding"))
    eng.index_document_vectors(ef_construction=64, M=8, n_shards=2)
    eng._doc_index_tombstones = frozenset({7})
    wv = spark.createDataFrame(
        [("alpha", [1.0, 0.0]), ("beta", [0.8, 0.6]), ("gamma", [0.0, 1.0])],
        "term string, embedding array<float>",
    )
    eng.set_word_vectors(wv)
    eng.index_word_vectors(ef_construction=32, M=4, n_shards=1)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    want_docs = eng.search_documents_by_vector(
        qvec, 5, return_documents=False, use_index=True, ef=1000
    ).collect()
    want_words = eng.search_words_by_vector([1.0, 0.1], 2, use_index=True, ef=10).collect()

    eng.save_ann_indexes(str(tmp_path / "ann"))
    fresh = Top2VecSpark(spark, docs, ascii_fast_path=True)
    fresh.set_document_vectors(emb.select("vec_id", "embedding"))
    fresh.set_word_vectors(wv)
    fresh.load_ann_indexes(str(tmp_path / "ann"))
    got_docs = fresh.search_documents_by_vector(
        qvec, 5, return_documents=False, use_index=True, ef=1000
    ).collect()
    got_words = fresh.search_words_by_vector([1.0, 0.1], 2, use_index=True, ef=10).collect()
    assert [r["doc_id"] for r in got_docs] == [r["doc_id"] for r in want_docs]
    assert all(r["doc_id"] != 7 for r in got_docs)  # tombstones restored
    assert [(r["term"], round(r["score"], 9)) for r in got_words] == [
        (r["term"], round(r["score"], 9)) for r in want_words
    ]


def test_reduced_mirror_and_hierarchy(engine):
    n0 = engine.get_num_topics()
    reduced, hierarchy = engine.hierarchical_topic_reduction(4)
    assert engine.get_num_topics(reduced=True) == 4
    # conservation invariant (reference test_top2vec.py:241-248)
    sizes = engine.get_topic_sizes(reduced=True).collect()
    assert sum(r["topic_size"] for r in sizes) == 500
    # sizes descending by reduced id
    by_id = sorted(sizes, key=lambda r: r["topic_id"])
    vals = [r["topic_size"] for r in by_id]
    assert vals == sorted(vals, reverse=True)
    # hierarchy covers all original topics exactly once
    h = engine.get_topic_hierarchy()
    assert len(h) == 4
    flat = sorted(t for grp in h for t in grp)
    assert flat == list(range(n0))
    # reduced query surfaces work
    words = engine.get_topics(reduced=True).collect()
    assert {r["topic_id"] for r in words} <= {0, 1, 2, 3}
    term = engine.vocab.orderBy(F.col("df").desc()).first()["term"]
    st = engine.search_topics([term], 2, reduced=True).collect()
    assert len(st) >= 1
    docs = engine.search_documents_by_topic(
        0, 5, return_documents=False, reduced=True
    ).collect()
    assert len(docs) == 5
    dt = engine.get_documents_topics([3], reduced=True).collect()
    assert dt[0]["topic_id"] in {0, 1, 2, 3}


def test_merge_duplicate_topics(spark):
    """Two labels with near-identical centroids merge into one."""
    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(7)
    base_a = rng.normal(size=8)
    base_b = rng.normal(size=8)
    rows = []
    for i in range(30):
        v = base_a + rng.normal(scale=0.01, size=8)
        rows.append((i, [float(x) for x in v], 0))
    for i in range(30, 50):
        v = base_a + rng.normal(scale=0.01, size=8)
        rows.append((i, [float(x) for x in v], 1))  # duplicate of label 0
    for i in range(50, 70):
        v = base_b + rng.normal(scale=0.01, size=8)
        rows.append((i, [float(x) for x in v], 2))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    docs = spark.createDataFrame(
        [(i, f"doc number {i} words here") for i in range(70)],
        "doc_id long, text string",
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb)
    assert eng.get_num_topics() == 3
    n = eng.merge_duplicate_topics(threshold=0.95)
    assert n == 2
    sizes = {r["topic_id"]: r["topic_size"] for r in eng.get_topic_sizes().collect()}
    assert sizes == {0: 50, 1: 20}


def test_merge_invalidates_reduced_mirror(spark):
    """A merge renumbers topics, so a reduction computed BEFORE the
    merge must not silently serve afterwards: reduced=True queries
    raise until hierarchical_topic_reduction is re-run."""
    import pytest

    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(11)
    bases = [rng.normal(size=8) for _ in range(3)]
    rows = []
    for i in range(60):
        lbl = i % 3
        # labels 0 and 1 share a base -> they merge
        v = bases[0 if lbl <= 1 else 2] + rng.normal(scale=0.01, size=8)
        rows.append((i, [float(x) for x in v], lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    docs = spark.createDataFrame(
        [(i, f"doc number {i} words here") for i in range(60)],
        "doc_id long, text string",
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb)
    eng.hierarchical_topic_reduction(2)
    assert hasattr(eng, "doc_topic_reduced")
    assert eng.merge_duplicate_topics(threshold=0.95) == 2
    assert not hasattr(eng, "doc_topic_reduced")
    with pytest.raises(ValueError, match="reduction has not been performed"):
        eng.get_topic_sizes(reduced=True)


def test_custom_tokenizer_hook(spark, tiny_docs):
    from top2vec_spark import Top2VecSpark

    # NOTE: query keywords are lowercased by the engine (reference T4
    # quirk), so a custom tokenizer must emit lowercase terms for
    # keyword search to resolve them.
    def bigram_tokenizer(text):
        ws = text.lower().split()
        return ws + [f"{a}_{b}" for a, b in zip(ws, ws[1:])]

    eng = Top2VecSpark(spark, tiny_docs, tokenizer=bigram_tokenizer)
    vocab = {r["term"] for r in eng.vocab.collect()}
    assert "the" in vocab and "the_cat" in vocab  # custom contract in force
    res = eng.search_documents_by_keywords(
        ["the_cat"], 1, return_documents=False
    ).collect()
    assert res[0]["doc_id"] == 0


def test_custom_chunker_hook(spark, tiny_docs):
    from top2vec_spark import Top2VecSpark

    eng = Top2VecSpark(spark, tiny_docs)
    ch = eng.chunk_documents(chunker=lambda t: [t[:10], t[10:]]).collect()
    assert {r["doc_id"] for r in ch} == {0, 1, 2, 3, 4, 5}
    assert all(r["chunk_id"] in (0, 1) for r in ch)
    # default path: sequential over tokens
    seq = eng.chunk_documents(chunk_length=3).collect()
    assert all(len(r["chunk"]) <= 3 for r in seq)


def test_documents_topic_distribution(engine):
    dist = engine.get_documents_topic_distribution([3, 7]).collect()
    n = engine.get_num_topics()
    by_doc = {}
    for r in dist:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {3, 7}
    for d, rows in by_doc.items():
        assert len(rows) == n  # one row per topic
        total = sum(r["probability"] for r in rows)
        assert abs(total - 1.0) < 1e-9
        assert all(r["probability"] >= 0 for r in rows)
        # argmax equals the stored assignment
        best = max(rows, key=lambda r: r["probability"])["topic_id"]
        stored = engine.doc_topic.filter(F.col("doc_id") == d).first()["topic_id"]
        assert best == stored


def test_noise_label_excluded_from_centroids(spark):
    """P2: label -1 (cluster noise) never forms a topic; noise docs
    still get assigned to the nearest real topic."""
    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(3)
    a = rng.normal(size=6); a /= np.linalg.norm(a)
    b = rng.normal(size=6); b /= np.linalg.norm(b)
    rows = []
    for i in range(20):
        rows.append((i, [float(x) for x in a + rng.normal(scale=0.02, size=6)], 0))
    for i in range(20, 30):
        rows.append((i, [float(x) for x in b + rng.normal(scale=0.02, size=6)], 1))
    for i in range(30, 35):  # noise
        rows.append((i, [float(x) for x in rng.normal(size=6)], -1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    docs = spark.createDataFrame(
        [(i, f"words here {i}") for i in range(35)], "doc_id long, text string"
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb)
    assert eng.get_num_topics() == 2  # noise never a topic
    # all 35 docs assigned (noise included)
    assert eng.doc_topic.count() == 35
    sizes = sum(r["topic_size"] for r in eng.get_topic_sizes().collect())
    assert sizes == 35


def test_a5_incremental_topic_sizes_on_add_delete(spark):
    """A5: add_documents with embeddings extends assignments to the
    nearest EXISTING topic (no retrain); delete shrinks sizes."""
    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(11)
    a = rng.normal(size=6); a /= np.linalg.norm(a)
    b = rng.normal(size=6); b /= np.linalg.norm(b)
    rows, docs_rows = [], []
    for i in range(20):
        rows.append((i, [float(x) for x in a + rng.normal(scale=0.02, size=6)], 0))
        docs_rows.append((i, f"alpha words {i}"))
    for i in range(20, 30):
        rows.append((i, [float(x) for x in b + rng.normal(scale=0.02, size=6)], 1))
        docs_rows.append((i, f"beta words {i}"))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb)
    sizes0 = {r["topic_id"]: r["topic_size"] for r in eng.get_topic_sizes().collect()}
    assert sizes0 == {0: 20, 1: 10}

    # 5 new docs near cluster b -> topic 1 grows to 15, no retrain
    new_docs = spark.createDataFrame(
        [(100 + i, f"new beta {i}") for i in range(5)], "doc_id long, text string"
    )
    new_emb = spark.createDataFrame(
        [(100 + i, [float(x) for x in b + rng.normal(scale=0.02, size=6)])
         for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    eng2 = eng.add_documents(new_docs, new_embeddings=new_emb)
    sizes1 = {r["topic_id"]: r["topic_size"] for r in eng2.get_topic_sizes().collect()}
    assert sizes1 == {0: 20, 1: 15}

    # delete 3 topic-0 docs -> 17/15
    eng3 = eng2.delete_documents([0, 1, 2])
    sizes2 = {r["topic_id"]: r["topic_size"] for r in eng3.get_topic_sizes().collect()}
    assert sizes2 == {0: 17, 1: 15}


def test_label_free_topic_discovery(spark):
    """compute_topics on a BARE (vec_id, embedding) table: labels
    default to IVF cells; sizes conserve (reference
    test_top2vec.py:241-248 invariant) and topic queries work."""
    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(13)
    bases = [rng.normal(size=8) for _ in range(4)]
    rows = [
        (i, [float(x) for x in bases[i % 4] + rng.normal(scale=0.05, size=8)])
        for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    docs = spark.createDataFrame(
        [(i, f"document number {i} some words") for i in range(120)],
        "doc_id long, text string",
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb, n_topics=4)
    sizes = [r["topic_size"] for r in eng.get_topic_sizes().collect()]
    assert sum(sizes) == 120  # every doc assigned exactly once
    assert eng.get_num_topics() >= 2
    # sizes renumbered descending
    assert sizes == sorted(sizes, reverse=True)
    assert eng.search_documents_by_topic(0, 5, return_documents=False).count() == 5


def test_recompute_topics_clears_previous_reduction(spark):
    """compute_topics on a NEW embeddings table must not serve a
    reduced mirror from the previous topic generation."""
    import pytest

    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(19)
    docs = spark.createDataFrame(
        [(i, f"doc {i} words here") for i in range(40)],
        "doc_id long, text string",
    )

    def emb(seed, k):
        r = np.random.default_rng(seed)
        bases = [r.normal(size=6) for _ in range(k)]
        return spark.createDataFrame(
            [
                (i, [float(x) for x in bases[i % k] + r.normal(scale=0.01, size=6)], i % k)
                for i in range(40)
            ],
            "vec_id long, embedding array<double>, label int",
        )

    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.compute_topics(emb(1, 4))
    eng.hierarchical_topic_reduction(2)
    eng.compute_topics(emb(2, 3))  # new generation
    with pytest.raises(ValueError, match="reduction has not been performed"):
        eng.get_topic_sizes(reduced=True)


def test_delete_filters_reduced_mirror(spark, tmp_path):
    """Index-path delete_documents must remove deleted docs from
    doc_topic_reduced too (reference rewrites doc_top_reduced)."""
    from top2vec_spark import Top2VecSpark

    rng = np.random.default_rng(23)
    bases = [rng.normal(size=6) for _ in range(4)]
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma") for i in range(40)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (i, [float(x) for x in bases[i % 4] + rng.normal(scale=0.01, size=6)], i % 4)
            for i in range(40)
        ],
        "vec_id long, embedding array<double>, label int",
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    eng.build_index(str(tmp_path / "rdidx"))
    eng.compute_topics(emb)
    eng.hierarchical_topic_reduction(2)
    assert eng.doc_topic_reduced.filter(F.col("doc_id") == 7).count() == 1
    eng.delete_documents([7])
    assert eng.doc_topic_reduced.filter(F.col("doc_id") == 7).count() == 0
    total = eng.get_topic_sizes(reduced=True).agg(
        F.sum("topic_size").alias("s")
    ).collect()[0]["s"]
    assert total == 39


def test_generate_topic_wordcloud(engine):
    """M5/S6 export (reference generate_topic_wordcloud,
    top2vec.py:3188-3236): softmax frequencies dict — positive,
    sums to 1, ordered like the stored word scores, and validated
    like the reference."""
    import math

    freqs = engine.generate_topic_wordcloud(0)
    assert freqs and all(v > 0 for v in freqs.values())
    assert abs(sum(freqs.values()) - 1.0) < 1e-9
    # softmax is monotone: weight order == stored ctfidf order
    words = {
        r["term"]: (r["ctfidf"], r["rank"])
        for r in engine.topic_words.filter("topic_id = 0").collect()
    }
    assert set(freqs) == set(words)
    by_weight = sorted(freqs, key=freqs.get, reverse=True)
    by_score = sorted(words, key=lambda t: (-words[t][0], words[t][1]))
    assert [round(freqs[t], 12) for t in by_weight] == sorted(
        (round(v, 12) for v in freqs.values()), reverse=True
    )
    assert freqs[by_score[0]] == max(freqs.values())
    # validation parity (reference _validate_topic_num)
    with pytest.raises(ValueError, match="cannot be less than 0"):
        engine.generate_topic_wordcloud(-1)
    with pytest.raises(ValueError, match="valid original topics"):
        engine.generate_topic_wordcloud(10_000)


def test_get_document_tokens(engine):
    """Reference get_document_tokens (top2vec.py:1694-1706): per-doc
    ordered token lists == reference_tokenize of each text."""
    from top2vec_spark.functions.tokenizer import reference_tokenize

    got = {r["doc_id"]: r["tokens"] for r in engine.get_document_tokens().collect()}
    for r in engine.docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == reference_tokenize(r["text"]), r["doc_id"]


def test_get_document_token_topic_assignment(engine):
    """Reference get_document_token_topic_assignment
    (top2vec.py:1681-1692), lexical re-expression: one row per token
    occurrence; each term maps to its argmax-ctfidf topic; scores
    match the stored ctfidf relation."""
    out = engine.get_document_token_topic_assignment()
    rows = out.collect()
    assert len(rows) == engine.tokens.count()
    scored = {}
    for r in engine._ctfidf.collect():
        cur = scored.get(r["term"])
        key = (r["ctfidf"], -r["topic_id"])
        if cur is None or key > (cur[1], -cur[0]):
            scored[r["term"]] = (r["topic_id"], r["ctfidf"])
    n_topics = engine.get_num_topics()
    for r in rows[:500]:
        if r["term"] in scored:
            tid, sc = scored[r["term"]]
            assert r["topic_id"] == tid and r["score"] == pytest.approx(sc)
            assert 0 <= r["topic_id"] < n_topics
        else:
            assert r["topic_id"] is None and r["score"] is None


def test_embedding_model_hook(spark, tiny_docs):
    """H2 seam end-to-end (reference set_embedding_model
    top2vec.py:1827-1843 + _embed_documents 1022-1048): a user
    callable list[str] -> ndarray runs batched inside mapInPandas,
    output L2-normalized, registered for vector search."""
    import math

    from top2vec_spark.api import Top2VecSpark

    def toy_embed(texts):
        # deterministic, shape (n, 3)
        return [
            [float(len(t)), float(t.count("a")) + 1.0, 2.0] for t in texts
        ]

    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    with pytest.raises(ValueError, match="must be callable"):
        eng.set_embedding_model("nope")
    with pytest.raises(ValueError, match="set_embedding_model first"):
        eng.embed_documents()
    eng.set_embedding_model(toy_embed)
    out = {r["vec_id"]: r["embedding"] for r in eng.embed_documents(batch_size=2).collect()}
    for r in tiny_docs.collect():
        raw = toy_embed([r["text"]])[0]
        n = math.sqrt(sum(x * x for x in raw))
        exp = [x / n for x in raw]
        got = out[r["doc_id"]]
        assert got == pytest.approx(exp, abs=1e-6), r["doc_id"]
        assert sum(x * x for x in got) == pytest.approx(1.0, abs=1e-5)
    # the registered table powers vector search end-to-end
    qv = eng.embed_query("aaaa")
    assert sum(x * x for x in qv) == pytest.approx(1.0, abs=1e-9)
    res = eng.search_documents_by_vector(qv, 3, return_documents=False)
    rows = res.collect()
    assert 0 < len(rows) <= 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def _py_window_starts(n, window, stride):
    """The engine's W1 start rule (windows.py sliding_window_mean):
    starts = distinct(least(i*stride, max(n-window, 0))) for
    i in 0..max(ceil((n-window)/stride), 0)."""
    import math

    upper = max(math.ceil((n - window) / stride), 0)
    starts = []
    for i in range(upper + 1):
        s = min(i * stride, max(n - window, 0))
        if s not in starts:
            starts.append(s)
    return starts


def test_token_embedding_hook_contextual_chain(spark, tiny_docs):
    """L3/L4 execution seam end-to-end (reference
    contextual_token_embeddings embedding.py:51-109 ->
    sliding_window_average embedding.py:112-144 at top2vec.py:752-760,
    average_embeddings embedding.py:9-48 at top2vec.py:738): a user
    token-embedding callable runs distributed, its ragged output lands
    as the long (doc_id, pos, term, vec) table, the W1/W2 window
    operators turn it into normalized chunk vectors, the per-doc chunk
    mean registers for vector search, and the vocab path registers
    word vectors."""
    import numpy as np

    from top2vec_spark.api import Top2VecSpark

    def _fake_token_model(texts):
        # Deterministic L3 stand-in for a HF tokenizer+encoder: tokens
        # are the whitespace pieces (lowercased), per-token hidden
        # state is [len, count('a')+1, count('e')+1, 7] — integer-
        # valued so float32 storage is exact and replayable from text.
        # Defined as a closure so cloudpickle ships it by value.
        out = []
        for t in texts:
            toks = t.lower().split()
            mat = [
                [float(len(tok)), tok.count("a") + 1.0, tok.count("e") + 1.0, 7.0]
                for tok in toks
            ]
            out.append((toks, mat))
        return out

    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    with pytest.raises(ValueError, match="must be callable"):
        eng.set_token_embedding_model(42)
    with pytest.raises(ValueError, match="set_token_embedding_model first"):
        eng.embed_document_tokens()
    with pytest.raises(ValueError, match="embed_document_tokens first"):
        eng.contextual_document_vectors()
    eng.set_token_embedding_model(_fake_token_model)
    with pytest.raises(ValueError, match="embed_document_tokens first"):
        eng.contextual_document_vectors()

    # --- L3: long token-vector table matches a pure-python replay
    long_rows = eng.embed_document_tokens(batch_size=2).collect()
    expect = {}
    for r in tiny_docs.collect():
        toks, mat = _fake_token_model([r["text"]])[0]
        for pos, (tok, vec) in enumerate(zip(toks, mat)):
            expect[(r["doc_id"], pos)] = (tok, vec)
    assert len(long_rows) == len(expect)
    for r in long_rows:
        tok, vec = expect[(r["doc_id"], r["pos"])]
        assert r["term"] == tok
        assert list(r["vec"]) == pytest.approx(vec)

    # --- W1 chain: chunk vectors replay (window 3, stride 2)
    window, stride = 3, 2
    chunks = eng.contextual_document_vectors(
        window_size=window, stride=stride
    ).collect()
    by_doc = {}
    for (did, _), (tok, vec) in sorted(expect.items()):
        by_doc.setdefault(did, []).append(vec)
    exp_chunks = {}
    for did, vecs in by_doc.items():
        for wid, start in enumerate(_py_window_starts(len(vecs), window, stride)):
            win = vecs[start : start + window]
            m = np.mean(np.asarray(win, dtype=np.float64), axis=0)
            m = m / np.linalg.norm(m)
            exp_chunks[(did, wid)] = (start, m)
    assert len(chunks) == len(exp_chunks)
    for r in chunks:
        start, m = exp_chunks[(r["doc_id"], r["chunk_id"])]
        assert r["start"] == start
        assert list(r["vec"]) == pytest.approx(list(m), abs=1e-6)

    # --- registered per-doc mean powers vector search (vec_id == doc_id)
    reg = {r["vec_id"]: list(r["embedding"]) for r in eng._doc_vectors.collect()}
    for did, vecs in by_doc.items():
        cm = np.mean(
            np.vstack(
                [m for (d, _), (_, m) in sorted(exp_chunks.items()) if d == did]
            ),
            axis=0,
        )
        cm = cm / np.linalg.norm(cm)
        assert reg[did] == pytest.approx(list(cm), abs=1e-6), did
    res = eng.search_documents_by_vector(reg[0], 3, return_documents=False)
    rows = res.collect()
    assert rows and rows[0]["doc_id"] == 0  # exact self-match ranks first

    # --- W2 smoothing composes in front of W1 (embedding.py:147-171)
    sm = eng.contextual_document_vectors(
        window_size=window, stride=stride, smoothing_window=1, register=False
    ).collect()
    exp_sm = {}
    for did, vecs in by_doc.items():
        a = np.asarray(vecs, dtype=np.float64)
        a = a / np.linalg.norm(a, axis=1, keepdims=True)
        sm_vecs = np.vstack(
            [
                a[max(0, i - 1) : min(len(a), i + 2)].mean(axis=0)
                for i in range(len(a))
            ]
        )
        for wid, start in enumerate(
            _py_window_starts(len(vecs), window, stride)
        ):
            m = sm_vecs[start : start + window].mean(axis=0)
            exp_sm[(did, wid)] = (start, m / np.linalg.norm(m))
    assert len(sm) == len(exp_sm)
    for r in sm:
        start, m = exp_sm[(r["doc_id"], r["chunk_id"])]
        assert r["start"] == start
        assert list(r["vec"]) == pytest.approx(list(m), abs=1e-6)

    # --- L4: vocab word vectors (single-token words -> own normalized vec)
    with pytest.raises(ValueError, match="set_token_embedding_model first"):
        eng2 = Top2VecSpark(spark, tiny_docs, min_count=0)
        eng2.vocab_word_vectors()
    wv = {r["term"]: list(r["vec"]) for r in eng.vocab_word_vectors().collect()}
    vocab_terms = [r["term"] for r in eng.vocab.collect()]
    assert sorted(wv) == sorted(vocab_terms)
    for term, vec in wv.items():
        raw = _fake_token_model([term])[0][1]
        m = np.mean(np.asarray(raw, dtype=np.float64), axis=0)
        m = m / np.linalg.norm(m)
        assert vec == pytest.approx(list(m), abs=1e-6), term
    # registered as the word-vector table -> search_words_by_vector
    # works; the fake model maps many 3-letter words to IDENTICAL
    # vectors, so assert on the exact-match score, not membership
    res = eng.search_words_by_vector(wv[vocab_terms[0]], 3)
    rows = res.collect()
    assert len(rows) == 3
    assert rows[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_token_model_single_execution(spark, tiny_docs, tmp_path):
    """The contextual chain references the token-vector table on BOTH
    sides of the window-starts join; without the persist+materialize
    in embed_document_tokens the user model would run once per branch
    (measured 2x inference — AQE does not stage-reuse the two
    MapInPandas instances). Pin: the model embeds each document
    EXACTLY once across the embed call and two downstream consumers."""
    from top2vec_spark.api import Top2VecSpark

    log = str(tmp_path / "calls.log")

    def counting_model(texts):
        with open(log, "a") as f:
            f.write(f"{len(texts)}\n")
        return [
            (t.split(), [[float(len(x)), 1.0] for x in t.split()])
            for t in texts
        ]

    eng = Top2VecSpark(spark, tiny_docs, min_count=0)
    eng.set_token_embedding_model(counting_model)
    tok = eng.embed_document_tokens()
    n_docs = tiny_docs.count()
    assert sum(int(l) for l in open(log)) == n_docs
    eng.contextual_document_vectors(window_size=3, stride=2, register=False).count()
    eng.contextual_document_vectors(
        window_size=3, stride=2, smoothing_window=1, register=False
    ).count()
    assert sum(int(l) for l in open(log)) == n_docs  # still exactly once
    tok.unpersist()
