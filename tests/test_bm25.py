"""Brute-force BM25 reference scorer vs a pure-Python oracle, plus the
reference test suite's structural invariants (SURVEY.md §5: descending
scores, shapes, self-exclusion)."""

from __future__ import annotations

import math

import pytest

from top2vec_spark.config import BM25Config
from top2vec_spark.functions.tokenizer import reference_tokenize
from top2vec_spark.operators.bm25 import bm25_topk_bruteforce, term_weights
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.tokens import tokenize_docs


def py_bm25_topk(corpus, pos, neg, k, k1=1.2, b=0.75, exclude=()):
    """Pure-Python BM25 oracle with the frozen constants/tie-break."""
    toks = {d: reference_tokenize(t) for d, t in corpus}
    toks = {d: ts for d, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for term, sign in [(t, 1.0) for t in pos] + [(t, -1.0) for t in neg]:
        idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        for d, ts in toks.items():
            tf = ts.count(term)
            if tf:
                dl = len(ts)
                s = sign * idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                scores[d] = scores.get(d, 0.0) + s
    items = [(d, s) for d, s in scores.items() if d not in set(exclude)]
    items.sort(key=lambda x: (-x[1], x[0]))
    return items[:k]


@pytest.fixture(scope="module")
def engine_parts(spark, tiny_docs):
    tokens = tokenize_docs(tiny_docs).cache()
    vocab = build_vocab(tokens).cache()
    ds = build_doc_stats(tokens).cache()
    return tokens, vocab, ds, compute_globals(ds)


CASES = [
    (["sat"], [], 3),
    (["the", "dog"], [], 4),
    (["cat", "sat"], ["dog"], 6),
    (["spark"], [], 1),
    (["the", "sat", "dog"], ["cats"], 10),
]


@pytest.mark.parametrize("pos,neg,k", CASES)
def test_bruteforce_matches_python_oracle(spark, engine_parts, tiny_corpus, pos, neg, k):
    tokens, vocab, ds, g = engine_parts
    w = term_weights(spark, vocab, pos, neg)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_bruteforce(tokens, ds, g, w, k).collect()
    ]
    expect = py_bm25_topk(tiny_corpus, pos, neg, k)
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, gs), (_, es) in zip(got, expect):
        assert gs == pytest.approx(es, abs=1e-12)
    # structural invariant: scores non-increasing (reference tests
    # e.g. test_top2vec.py:317)
    assert all(got[i][1] >= got[i + 1][1] for i in range(len(got) - 1))


def test_exclusion_contract(spark, engine_parts, tiny_corpus):
    tokens, vocab, ds, g = engine_parts
    w = term_weights(spark, vocab, ["sat"], [])
    got = [
        r["doc_id"]
        for r in bm25_topk_bruteforce(tokens, ds, g, w, 3, exclude_doc_ids=[5]).collect()
    ]
    assert 5 not in got
    expect = py_bm25_topk(tiny_corpus, ["sat"], [], 3, exclude=[5])
    assert got == [d for d, _ in expect]


def test_unknown_keyword_raises(spark, engine_parts):
    _, vocab, _, _ = engine_parts
    with pytest.raises(ValueError, match="not in vocabulary"):
        term_weights(spark, vocab, ["zzzznotaword"], [])


def test_keywords_lowercased(spark, engine_parts):
    # reference top2vec.py:1433-1434 (T4)
    _, vocab, _, _ = engine_parts
    w = term_weights(spark, vocab, ["SAT"], [])
    assert [r["term"] for r in w.collect()] == ["sat"]
