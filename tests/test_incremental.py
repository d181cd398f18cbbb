"""Incremental append (U1): appended index answers queries
rank+score-identically to a full rebuild over the union corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.bm25 import (
    bm25_topk_bruteforce,
    resolve_query_terms,
    term_weights,
)
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.tokens import assign_doc_ids, tokenize_docs
from top2vec_spark.operators.wand import wand_topk
from top2vec_spark.plans.build import IndexBuilder, PostingsIndex
from top2vec_spark.sources.pages import generate_pages_pdf

QUERIES = [(["wa", "wb"], []), (["wc"], []), (["wa", "wd"], ["wb"])]


@pytest.fixture(scope="module")
def corpora(spark):
    base_pdf = generate_pages_pdf(300, seed=31)
    new_pdf = generate_pages_pdf(150, seed=32, start=10_000)
    base = assign_doc_ids(spark.createDataFrame(base_pdf[["url", "text"]])).select(
        "doc_id", "url", "text"
    ).cache()
    new = assign_doc_ids(spark.createDataFrame(new_pdf[["url", "text"]])).select(
        "doc_id", "url", "text"
    ).cache()
    return base, new


def test_append_matches_full_rebuild(spark, corpora, tmp_path):
    base, new = corpora
    dps, nb = 128, 8

    # incremental: build base, then append shifted new docs
    inc_path = str(tmp_path / "inc")
    idx = IndexBuilder(spark, inc_path, docs_per_shard=dps, n_buckets=nb).build_from_docs(
        base, resume=False
    )
    lo = idx.next_doc_id()
    assert lo % dps == 0 and lo >= 300
    shifted = new.withColumn("doc_id", (F.col("doc_id") + F.lit(lo)).cast("long"))
    idx2 = idx.append_documents(shifted)
    assert idx2.stats_fresh is False
    assert idx2.globs.n_docs == 450

    # full rebuild oracle over the union corpus
    union = base.unionByName(shifted)
    full_path = str(tmp_path / "full")
    full = IndexBuilder(
        spark, full_path, docs_per_shard=dps, n_buckets=nb
    ).build_from_docs(union, resume=False)
    assert full.globs == idx2.globs

    tokens = tokenize_docs(union).cache()
    vocab = build_vocab(tokens).cache()
    ds = build_doc_stats(tokens).cache()
    g = compute_globals(ds)

    vmap = {r["term"]: (r["term_id"], r["df"]) for r in idx2.vocab.collect()}
    for pos, neg in QUERIES:
        q = resolve_query_terms(vmap, pos, neg)
        got = wand_topk(spark, idx2, q, idx2.globs, 15).collect()
        w = term_weights(spark, vocab, pos, neg)
        expect = bm25_topk_bruteforce(tokens, ds, g, w, 15).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expect], (pos, neg)
        for a, b in zip(got, expect):
            assert a["score"] == pytest.approx(b["score"], abs=1e-9)

    # stable term_ids: every base term keeps its id after the append
    base_ids = {r["term"]: r["term_id"] for r in idx.vocab.collect()}
    new_ids = {r["term"]: r["term_id"] for r in idx2.vocab.collect()}
    for t, i in base_ids.items():
        assert new_ids[t] == i

    # reload from disk sees stats_fresh=False
    loaded = PostingsIndex.load(spark, inc_path)
    assert loaded.stats_fresh is False


def test_append_rejects_low_ids(spark, corpora, tmp_path):
    base, new = corpora
    idx = IndexBuilder(
        spark, str(tmp_path / "i2"), docs_per_shard=128, n_buckets=8
    ).build_from_docs(base, resume=False)
    with pytest.raises(ValueError, match="shard boundary"):
        idx.append_documents(new)  # ids overlap the base range


def test_api_add_documents_incremental(spark, corpora, tmp_path):
    from top2vec_spark import Top2VecSpark

    base, new = corpora
    eng = Top2VecSpark(spark, base)
    eng.build_index(str(tmp_path / "api_idx"))
    n_before = eng._index.globs.n_docs
    eng2 = eng.add_documents(new)
    assert eng2._index.globs.n_docs == n_before + 150
    res = eng2.search_documents_by_keywords(
        ["wa"], 5, return_documents=False
    ).collect()
    assert len(res) == 5
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_append_is_o_batch_and_idempotent(spark, corpora, tmp_path):
    """(a) append never re-reads the base tf history: deleting
    {path}/tf after the build must not break an append (O(batch)
    proof). (b) replaying the same epoch is a no-op (exactly-once for
    foreachBatch retries)."""
    import shutil

    base, new = corpora
    p = str(tmp_path / "obatch")
    idx = IndexBuilder(
        spark, p, docs_per_shard=128, n_buckets=8
    ).build_from_docs(base, resume=False)
    lo = idx.next_doc_id()
    shifted = new.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(lo)).cast("long")
    ).cache()
    shifted.count()

    shutil.rmtree(f"{p}/tf")  # base history gone: append must not care
    idx2 = idx.append_documents(shifted, epoch_id="ep1")
    assert idx2.globs.n_docs == 450

    # replay the SAME epoch: no-op, stats unchanged
    idx3 = idx2.append_documents(shifted, epoch_id="ep1")
    assert idx3.globs.n_docs == 450
    assert idx3.globs.sum_dl == idx2.globs.sum_dl
    # postings not duplicated: total emitted rows for one head term
    n_blocks_2 = idx2.postings.count()
    n_blocks_3 = idx3.postings.count()
    assert n_blocks_2 == n_blocks_3

    # queries still serve correctly after the replay
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in idx3.vocab.collect()}
    q = resolve_query_terms(vmap, ["wa"], [])
    got = wand_topk(spark, idx3, q, idx3.globs, 5).collect()
    assert len(got) == 5


def test_append_delete_soak_matches_oneshot(spark, tmp_path):
    """Lifecycle soak: build -> append -> delete -> append -> delete
    must answer queries IDENTICALLY (docids + scores) to a one-shot
    build over the full union with the same tombstones — pins that
    epoch-partitioned appends and shard-sidecar tombstones compose
    across interleavings, not just individually."""
    dps, nb = 128, 8
    a = assign_doc_ids(
        spark.createDataFrame(generate_pages_pdf(300, seed=61)[["url", "text"]])
    ).select("doc_id", "url", "text").cache()

    inc_path = str(tmp_path / "soak_inc")
    idx = IndexBuilder(
        spark, inc_path, docs_per_shard=dps, n_buckets=nb
    ).build_from_docs(a, resume=False)

    lo1 = idx.next_doc_id()
    b = assign_doc_ids(
        spark.createDataFrame(generate_pages_pdf(150, seed=62, start=20_000)[["url", "text"]])
    ).select("doc_id", "url", "text").withColumn(
        "doc_id", (F.col("doc_id") + F.lit(lo1)).cast("long")
    ).cache()
    idx = idx.append_documents(b, epoch_id="e1")

    victims1 = [5, 17, lo1 + 3]  # from base AND first append
    idx.delete_documents(victims1)

    lo2 = idx.next_doc_id()
    c = assign_doc_ids(
        spark.createDataFrame(generate_pages_pdf(150, seed=63, start=40_000)[["url", "text"]])
    ).select("doc_id", "url", "text").withColumn(
        "doc_id", (F.col("doc_id") + F.lit(lo2)).cast("long")
    ).cache()
    idx = idx.append_documents(c, epoch_id="e2")

    victims2 = [lo2 + 1, 42]
    idx.delete_documents(victims2)
    assert idx.globs.n_docs == 600

    oneshot_path = str(tmp_path / "soak_full")
    full = IndexBuilder(
        spark, oneshot_path, docs_per_shard=dps, n_buckets=nb
    ).build_from_docs(a.unionByName(b).unionByName(c), resume=False)
    full.delete_documents(victims1 + victims2)

    vmap = {r["term"]: (r["term_id"], r["df"]) for r in idx.vocab.collect()}
    vmap_full = {
        r["term"]: (r["term_id"], r["df"]) for r in full.vocab.collect()
    }
    for pos, neg in QUERIES:
        qi = resolve_query_terms(vmap, pos, neg)
        qf = resolve_query_terms(vmap_full, pos, neg)
        ri = [(r["doc_id"], r["score"]) for r in wand_topk(spark, idx, qi, idx.globs, 10).collect()]
        rf = [(r["doc_id"], r["score"]) for r in wand_topk(spark, full, qf, full.globs, 10).collect()]
        assert ri == rf and len(ri) == 10
        assert not ({v for v in victims1 + victims2} & {d for d, _ in ri})

    # reload from disk: tombstones + epochs survive
    loaded = PostingsIndex.load(spark, inc_path)
    assert set(victims1 + victims2) <= loaded.tombstones
    qi = resolve_query_terms(vmap, *QUERIES[0])
    assert [
        (r["doc_id"], r["score"])
        for r in wand_topk(spark, loaded, qi, loaded.globs, 10).collect()
    ] == [
        (r["doc_id"], r["score"])
        for r in wand_topk(spark, idx, qi, idx.globs, 10).collect()
    ]
