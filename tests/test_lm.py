"""Bigram-LM scoring (operators/lm.py) vs a pure-Python reference."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from top2vec_spark.functions.tokenizer import sql_tokens_expr
from top2vec_spark.operators.lm import bigram_lm, bigram_lm_scores


def _reference(token_lists: dict[int, list[str]], k: float):
    c2: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for toks in token_lists.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    out = {}
    for doc, toks in token_lists.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            out[doc] = (0, None, None)
            continue
        lp = [
            math.log((c2[bg] + k) / (c1[bg[0]] + k * v)) for bg in bgs
        ]
        avg = sum(lp) / len(lp)
        out[doc] = (len(bgs), round(avg, 6), round(math.exp(-avg), 6))
    return out


@pytest.fixture(scope="module")
def lm_tokens(spark, tiny_docs):
    extra = spark.createDataFrame(
        [(100, "zz"), (101, "")], "doc_id long, text string"
    )  # <2-token docs: must yield n_bigrams=0, NULL scores
    docs = tiny_docs.unionByName(extra)
    return docs.select("doc_id", sql_tokens_expr("text").alias("tokens"))


def test_scores_match_reference(spark, lm_tokens):
    token_lists = {
        r["doc_id"]: list(r["tokens"]) for r in lm_tokens.collect()
    }
    want = _reference(token_lists, k=0.1)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["perplexity"])
        for r in bigram_lm_scores(lm_tokens, k=0.1).collect()
    }
    assert got == want


def test_model_counts(spark, lm_tokens):
    c2, c1, v = bigram_lm(lm_tokens)
    token_lists = {
        r["doc_id"]: list(r["tokens"]) for r in lm_tokens.collect()
    }
    ref2: Counter = Counter()
    for toks in token_lists.values():
        for bg in zip(toks, toks[1:]):
            ref2[bg] += 1
    assert {
        (r["w1"], r["w2"]): r["c2"] for r in c2.collect()
    } == dict(ref2)
    assert v == len({t for toks in token_lists.values() for t in toks})


def test_partition_invariant(spark, lm_tokens):
    a = bigram_lm_scores(lm_tokens).orderBy("doc_id").collect()
    b = bigram_lm_scores(lm_tokens.repartition(7)).orderBy("doc_id").collect()
    assert a == b


def test_gibberish_scores_worse(spark, tiny_docs):
    """A doc of corpus-typical text must out-score (lower perplexity)
    a doc of never-repeated token salad under the corpus LM."""
    docs = tiny_docs.unionByName(
        tiny_docs.sparkSession.createDataFrame(
            [
                (50, "the cat sat on the mat the dog sat on the log"),
                (51, "qqq www eee rrr ttt yyy uuu iii ooo ppp"),
            ],
            "doc_id long, text string",
        )
    )
    toks = docs.select("doc_id", sql_tokens_expr("text").alias("tokens"))
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in bigram_lm_scores(toks).collect()
    }
    assert ppl[50] < ppl[51]


def _reference_contrast(corpus: dict, target: dict, k: float):
    def counts(tl):
        c2, c1, vocab = Counter(), Counter(), set()
        for toks in tl.values():
            vocab.update(toks)
            for bg in zip(toks, toks[1:]):
                c2[bg] += 1
                c1[bg[0]] += 1
        return c2, c1, len(vocab)

    c2t, c1t, vt = counts(target)
    c2c, c1c, vc = counts(corpus)
    out = {}
    for doc, toks in corpus.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            out[doc] = (0, None)
            continue
        d = [
            math.log((c2t[bg] + k) / (c1t[bg[0]] + k * vt))
            - math.log((c2c[bg] + k) / (c1c[bg[0]] + k * vc))
            for bg in bgs
        ]
        out[doc] = (len(bgs), round(sum(d) / len(d), 6))
    return out


def test_contrast_matches_reference(spark, lm_tokens):
    from top2vec_spark.operators.lm import lm_contrast_scores

    corpus = {r["doc_id"]: list(r["tokens"]) for r in lm_tokens.collect()}
    target_df = lm_tokens.filter(F.col("doc_id") % 2 == 0)
    target = {d: t for d, t in corpus.items() if d % 2 == 0}
    got = {
        r["doc_id"]: (r["n_bigrams"], r["contrast"])
        for r in lm_contrast_scores(lm_tokens, target_df, k=0.5).collect()
    }
    assert got == _reference_contrast(corpus, target, k=0.5)


def test_contrast_prefers_target_like_docs(spark, tiny_docs):
    """A doc phrased like the target domain must out-score one phrased
    like the rest of the corpus."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.lm import lm_contrast_scores

    docs = tiny_docs.unionByName(
        tiny_docs.sparkSession.createDataFrame(
            [
                (60, "spark builds fast indexes and spark builds inverted indexes"),
                (61, "the cat sat on the log and the dog sat on the mat"),
            ],
            "doc_id long, text string",
        )
    )
    toks = docs.select("doc_id", sql_tokens_expr("text").alias("tokens"))
    target = toks.filter(F.col("doc_id") == 3)  # the spark/indexes doc
    got = {
        r["doc_id"]: r["contrast"]
        for r in lm_contrast_scores(toks, target).collect()
    }
    assert got[60] > got[61]


def _reference_buckets(token_lists: dict[int, list[str]], k: float):
    """Rank scored docs by (round6 perplexity, doc_id), bucket into
    integer thirds — the perplexity_buckets contract."""
    scores = _reference(token_lists, k)
    scored = sorted(
        (ppl, doc) for doc, (_, _, ppl) in scores.items() if ppl is not None
    )
    n = len(scored)
    out = {}
    for rank, (ppl, doc) in enumerate(scored):
        bucket = (
            "head" if rank * 3 < n else "middle" if rank * 3 < 2 * n else "tail"
        )
        out[doc] = (ppl, rank, bucket)
    return out


def test_perplexity_buckets_match_reference(spark, lm_tokens):
    from top2vec_spark.operators.lm import perplexity_buckets

    token_lists = {
        r["doc_id"]: list(r["tokens"]) for r in lm_tokens.collect()
    }
    want = _reference_buckets(token_lists, k=0.1)
    got = {
        r["doc_id"]: (r["perplexity"], r["ppl_rank"], r["bucket"])
        for r in perplexity_buckets(lm_tokens, k=0.1).collect()
    }
    assert got == want
    # unscored (<2-token) docs are absent, scored docs all present
    assert 100 not in got and 101 not in got
    assert set(got) == {d for d, (_, _, p) in _reference(token_lists, 0.1).items() if p is not None}


def test_perplexity_buckets_integer_thirds(spark):
    """n=10 scored docs: head gets ranks 0-3 (rank*3 < 10), middle
    4-6, tail 7-9 — the integer-arithmetic split, never float
    quantiles."""
    from top2vec_spark.operators.lm import perplexity_buckets

    rows = [(d, [f"w{d}", "x", f"w{d}", "y"]) for d in range(10)]
    ta = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = perplexity_buckets(ta, k=0.1).collect()
    from collections import Counter as C

    sizes = C(r["bucket"] for r in got)
    assert sizes == {"head": 4, "middle": 3, "tail": 3}
    by_rank = {r["ppl_rank"]: r["bucket"] for r in got}
    assert [by_rank[i] for i in range(10)] == (
        ["head"] * 4 + ["middle"] * 3 + ["tail"] * 3
    )


def test_perplexity_buckets_partition_invariant(spark, lm_tokens):
    from top2vec_spark.operators.lm import perplexity_buckets

    a = sorted(
        map(tuple, perplexity_buckets(lm_tokens.repartition(7), k=0.1).collect())
    )
    b = sorted(
        map(tuple, perplexity_buckets(lm_tokens.coalesce(1), k=0.1).collect())
    )
    assert a == b
