"""Postings construction: decoded blocks == per-(term, doc) counts
oracle; block invariants (FIXTURES.md §4)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from top2vec_spark.config import BM25Config
from top2vec_spark.functions.tokenizer import reference_tokenize
from top2vec_spark.operators.codec import decode_block
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.postings import build_postings
from top2vec_spark.operators.tokens import tokenize_docs
from top2vec_spark.sources.pages import generate_pages_pdf

BLOCK = 16
DPS = 128  # docs per shard — small to force multi-shard


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = generate_pages_pdf(400, seed=7)
    docs = spark.createDataFrame(pdf[["url", "text"]]).selectExpr(
        "monotonically_increasing_id() as _x", "url", "text"
    )
    # deterministic dense ids by url
    from top2vec_spark.operators.tokens import assign_doc_ids

    docs = assign_doc_ids(docs.select("url", "text")).select("doc_id", "url", "text")
    return docs.cache(), pdf


@pytest.fixture(scope="module")
def built(spark, corpus):
    docs, _ = corpus
    tokens = tokenize_docs(docs).cache()
    vocab = build_vocab(tokens).cache()
    ds = build_doc_stats(tokens).cache()
    g = compute_globals(ds)
    postings = build_postings(
        tokens, vocab, ds, g, docs_per_shard=DPS, block_size=BLOCK
    ).cache()
    return tokens, vocab, ds, g, postings


def test_decoded_postings_match_tf_oracle(built):
    tokens, vocab, ds, g, postings = built
    # oracle: (term_id, doc_id) -> tf from the tokens table
    tid = {r["term"]: r["term_id"] for r in vocab.collect()}
    oracle = Counter()
    for r in tokens.collect():
        oracle[(tid[r["term"]], r["doc_id"])] += 1

    got = {}
    for r in postings.collect():
        d, t = decode_block(bytes(r["doc_ids"]), bytes(r["tfs"]), r["n"])
        assert r["n"] <= BLOCK
        assert (np.diff(d) > 0).all() if d.size > 1 else True
        assert d[0] == r["first_doc_id"] and d[-1] == r["last_doc_id"]
        assert t.max() == r["block_max_tf"]
        # all docs within the shard's range
        assert (d // DPS == r["shard"]).all()
        for di, ti in zip(d, t):
            key = (r["term_id"], int(di))
            assert key not in got, f"duplicate posting {key}"
            got[key] = int(ti)
    assert got == dict(oracle)


def test_block_max_score_is_upper_bound(built):
    """block_max_score must dominate every entry's true contribution."""
    import math

    tokens, vocab, ds, g, postings = built
    cfg = BM25Config()
    dfs = {r["term_id"]: r["df"] for r in vocab.collect()}
    dls = {r["doc_id"]: r["dl"] for r in ds.collect()}
    for r in postings.collect():
        d, t = decode_block(bytes(r["doc_ids"]), bytes(r["tfs"]), r["n"])
        idf = math.log(1.0 + (g.n_docs - dfs[r["term_id"]] + 0.5) / (dfs[r["term_id"]] + 0.5))
        for di, ti in zip(d, t):
            s = idf * (ti * (cfg.k1 + 1.0)) / (
                ti + cfg.k1 * (1.0 - cfg.b + cfg.b * dls[int(di)] / g.avgdl)
            )
            assert s <= r["block_max_score"] + 1e-12


def test_skip_pointers(built):
    *_, postings = built
    for r in postings.collect():
        skips = r["skips"]
        assert skips[0]["doc_id"] == r["first_doc_id"]
        assert skips[0]["offset"] == 0
        assert len(skips) == (r["n"] + 15) // 16
        offs = [s["offset"] for s in skips]
        assert offs == sorted(offs)


def test_head_term_spreads_across_shards(built):
    """Zipf head terms must appear in many (term, shard) groups — the
    salted repartition actually spreads the skew."""
    *_, postings = built
    from pyspark.sql import functions as F

    head = (
        postings.groupBy("term_id")
        .agg(F.countDistinct("shard").alias("n_shards"), F.sum("n").alias("df"))
        .orderBy(F.desc("df"))
        .first()
    )
    assert head["n_shards"] == 400 // DPS + 1  # head term in every shard
