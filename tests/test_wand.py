"""Block-max WAND ≡ brute-force BM25 — rank-identical docIDs and
bit-identical float64 scores on the fixture query set (north rule;
FIXTURES.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.bm25 import bm25_topk_bruteforce, term_weights
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.tokens import assign_doc_ids, tokenize_docs
from top2vec_spark.operators.wand import wand_topk
from top2vec_spark.plans.build import IndexBuilder
from top2vec_spark.sources.pages import generate_pages_pdf


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = generate_pages_pdf(600, seed=11)
    docs = assign_doc_ids(
        spark.createDataFrame(pdf[["url", "text"]])
    ).select("doc_id", "url", "text").cache()
    tokens = tokenize_docs(docs).cache()
    vocab = build_vocab(tokens).cache()
    ds = build_doc_stats(tokens).cache()
    g = compute_globals(ds)
    path = str(tmp_path_factory.mktemp("idx"))
    builder = IndexBuilder(
        spark, path, docs_per_shard=100, n_buckets=8, block_size=16
    )
    index = builder.build(tokens, vocab, ds, resume=False)
    return spark, tokens, vocab, ds, g, index


# query set mirroring the reference pytest shapes (FIXTURES.md §5):
# head terms, tail terms, mixed, negatives
QUERY_SET = [
    (["wa"], [], 10),               # heaviest head term
    (["wa", "wb"], [], 10),
    (["wcz", "wdm"], [], 25),       # tail terms
    (["wa", "wcz"], ["wb"], 10),    # mixed + negative
    (["wb", "wc", "wd"], [], 50),
    (["wa"], ["wb", "wc"], 10),
    (["wzz"], [], 5),
]


@pytest.mark.parametrize("pos,neg,k", QUERY_SET)
def test_wand_rank_and_score_identical_to_bruteforce(built, pos, neg, k):
    spark, tokens, vocab, ds, g, index = built
    w = term_weights(spark, vocab, pos, neg)
    brute = bm25_topk_bruteforce(tokens, ds, g, w, k).collect()
    wand = wand_topk(spark, index, w, g, k).collect()
    assert [r["doc_id"] for r in wand] == [r["doc_id"] for r in brute]
    for wr, br in zip(wand, brute):
        # bit-identical float64: both accumulate per-term contributions
        # in ascending term_id order
        assert wr["score"] == br["score"], (wr, br)
    # structural invariants (reference suite): k rows, non-increasing
    assert len(wand) == min(k, len(brute))
    assert all(
        wand[i]["score"] >= wand[i + 1]["score"] for i in range(len(wand) - 1)
    )


def test_wand_exclusion(built):
    spark, tokens, vocab, ds, g, index = built
    w = term_weights(spark, vocab, ["wa"], [])
    base = wand_topk(spark, index, w, g, 5).collect()
    excl = [r["doc_id"] for r in base[:2]]
    out = wand_topk(spark, index, w, g, 5, exclude_doc_ids=excl).collect()
    assert not (set(excl) & {r["doc_id"] for r in out})
    brute = bm25_topk_bruteforce(
        tokens, ds, g, w, 5, exclude_doc_ids=excl
    ).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in brute]


def test_manifest_reconciles(built):
    """Manifest metrics must reconcile with the actual tables
    (FIXTURES.md §4)."""
    spark, tokens, vocab, ds, g, index = built
    m = index.manifest
    postings_total = (
        m.filter(F.col("checkpoint_path").contains("postings"))
        .agg(F.sum("postings_emitted"))
        .collect()[0][0]
    )
    # sum over buckets == total (term_id, doc_id) pairs
    expected = tokens.select("term", "doc_id").distinct().count()
    assert postings_total == expected
    docs_tok = (
        m.filter(F.col("checkpoint_path").contains("doc_stats"))
        .agg(F.sum("docs_tokenized"))
        .collect()[0][0]
    )
    assert docs_tok == g.n_docs
    bytes_c = (
        m.filter(F.col("checkpoint_path").contains("postings"))
        .agg(F.sum("bytes_compressed"))
        .collect()[0][0]
    )
    assert bytes_c > 0


def test_api_uses_wand_after_build(spark, tmp_path):
    from top2vec_spark.api import Top2VecSpark

    pdf = generate_pages_pdf(300, seed=3)
    docs = assign_doc_ids(spark.createDataFrame(pdf[["url", "text"]]))
    eng = Top2VecSpark(spark, docs)
    brute = eng.search_documents_by_keywords(
        ["wa", "wb"], 5, return_documents=False
    ).collect()
    eng.build_index(str(tmp_path / "idx"))
    wand = eng.search_documents_by_keywords(
        ["wa", "wb"], 5, return_documents=False
    ).collect()
    assert [r["doc_id"] for r in wand] == [r["doc_id"] for r in brute]
    assert [r["score"] for r in wand] == [r["score"] for r in brute]


def test_wand_negative_only_docs(spark, tmp_path):
    """Adversarial regression (round-1 advice): when fewer than k docs
    score positively, documents matching ONLY negative keywords can
    still belong in the top-k (their negative score beats the more
    negative positive-matching docs). WAND must enumerate negative
    blocks as candidate sources once theta <= 0 — exactly like brute
    force ranks them."""
    rows = []
    # 12 docs with one 'pos' drowned in 'neg' -> strongly negative net
    for i in range(12):
        rows.append((i, "pos " + "neg " * (60 + i) + "filler common"))
    # 4 long docs with a single 'neg' -> mildly negative (rank higher)
    for i in range(4):
        rows.append((12 + i, "neg common filler " + "pad " * (35 + i)))
    # 30 docs with neither query term: keep idf(neg) meaningful
    for i in range(30):
        rows.append((16 + i, "common filler pad extra words"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tokens = tokenize_docs(docs).cache()
    vocab = build_vocab(tokens).cache()
    ds = build_doc_stats(tokens).cache()
    g = compute_globals(ds)
    index = IndexBuilder(
        spark, str(tmp_path / "negidx"), docs_per_shard=8, n_buckets=4,
        block_size=4,
    ).build(tokens, resume=False)

    w = term_weights(spark, vocab, ["pos"], ["neg"])
    brute = bm25_topk_bruteforce(tokens, ds, g, w, 10).collect()
    wand = wand_topk(spark, index, w, g, 10).collect()
    # neg-only docs must appear (they are the least-negative scores)
    assert {12, 13, 14, 15} <= {r["doc_id"] for r in brute}
    assert [r["doc_id"] for r in wand] == [r["doc_id"] for r in brute]
    for a, b in zip(wand, brute):
        assert a["score"] == b["score"]


def test_bucketed_serving_no_exchange(built):
    """register_bucketed: rank+score-identical results AND a physical
    plan with NO Exchange between the postings scan and the per-shard
    kernel (the per-query block shuffle is gone)."""
    spark, tokens, vocab, ds, g, index = built
    w = term_weights(spark, vocab, ["wa", "wb"], [])
    base = wand_topk(spark, index, w, g, 10).collect()
    index.register_bucketed(shard_buckets=8)
    try:
        res_df = wand_topk(spark, index, w, g, 10)
        res = res_df.collect()
        assert [r["doc_id"] for r in res] == [r["doc_id"] for r in base]
        assert [r["score"] for r in res] == [r["score"] for r in base]
        plan = res_df._jdf.queryExecution().executedPlan().toString()
        # the only allowed exchange is the final single-partition
        # top-k merge AFTER the kernel; nothing between scan and kernel
        before_kernel = plan.split("FlatMapGroupsInPandas")[-1]
        assert "Exchange" not in before_kernel, before_kernel
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {index.bucketed_table}")
        index.bucketed_table = None


def test_wand_topk_many_matches_single(built):
    """Batched serving: one job answers many queries, each result
    rank+score-identical to the per-query path."""
    from top2vec_spark.operators.bm25 import resolve_query_terms
    from top2vec_spark.operators.wand import wand_topk_many

    spark, tokens, vocab, ds, g, index = built
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in vocab.collect()}
    batch = {
        f"q{i}": resolve_query_terms(vmap, pos, neg)
        for i, (pos, neg, _) in enumerate(QUERY_SET[:5])
    }
    many = wand_topk_many(spark, index, batch, g, 10).collect()
    by_q = {}
    for r in many:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for i, (pos, neg, _) in enumerate(QUERY_SET[:5]):
        w = term_weights(spark, vocab, pos, neg)
        single = [
            (r["doc_id"], r["score"])
            for r in wand_topk(spark, index, w, g, 10).collect()
        ]
        assert by_q[f"q{i}"] == single, (pos, neg)
