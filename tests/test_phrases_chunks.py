"""Phrase mining (T8/A7) and chunkers (T5/T6) vs python oracles."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from top2vec_spark.functions.tokenizer import reference_tokenize
from top2vec_spark.operators.chunks import random_chunks, sequential_chunks
from top2vec_spark.operators.phrases import find_phrases
from top2vec_spark.operators.tokens import tokenize_docs


@pytest.fixture(scope="module")
def phrase_docs(spark):
    rows = [
        (0, "new york is a big city and new york never sleeps"),
        (1, "i love new york and new york loves me"),
        (2, "machine learning and machine learning and machine learning"),
        (3, "the city that never sleeps is new york"),
        (4, "big data machine learning new york"),
        (5, "random words without repeated pairs here today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def py_phrases(corpus, min_count, threshold):
    toks = {d: reference_tokenize(t) for d, t in corpus}
    uni = Counter(t for ts in toks.values() for t in ts)
    pairs = Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            pairs[(a, b)] += 1
    vocab_size = len(uni)
    out = {}
    for (a, b), pc in pairs.items():
        if pc < min_count:
            continue
        score = (pc - min_count) * vocab_size / (uni[a] * uni[b])
        if score > threshold:
            out[f"{a} {b}"] = (pc, score)
    return out


@pytest.mark.parametrize("min_count,threshold", [(2, 0.1), (3, 0.5), (1, 0.0)])
def test_find_phrases_matches_oracle(spark, phrase_docs, min_count, threshold):
    corpus = [(r["doc_id"], r["text"]) for r in phrase_docs.collect()]
    tokens = tokenize_docs(phrase_docs)
    got = {
        r["phrase"]: (r["pair_count"], r["score"])
        for r in find_phrases(tokens, min_count, threshold).collect()
    }
    expect = py_phrases(corpus, min_count, threshold)
    assert set(got) == set(expect)
    for ph in got:
        assert got[ph][0] == expect[ph][0]
        assert got[ph][1] == pytest.approx(expect[ph][1])
    if min_count == 2:
        assert "new york" in got and "machine learning" in got


@pytest.fixture(scope="module")
def tok_arr(spark, phrase_docs):
    return phrase_docs.select(
        "doc_id", F.split("text", " ").alias("tokens")
    ).cache()


def py_seq_chunks(tokens, chunk_length, max_chunks, overlap):
    stride = max(1, int(chunk_length * (1 - overlap)))
    n = len(tokens)
    n_chunks = max(1, math.ceil(n / chunk_length))
    if max_chunks is not None:
        n_chunks = min(n_chunks, max_chunks)
    return [tokens[i * stride : i * stride + chunk_length] for i in range(n_chunks)]


@pytest.mark.parametrize(
    "cl,mx,ov", [(4, None, 0.0), (3, 2, 0.0), (5, None, 0.4), (100, None, 0.0)]
)
def test_sequential_chunks_match_reference_arithmetic(tok_arr, cl, mx, ov):
    got = {}
    for r in sequential_chunks(tok_arr, cl, mx, ov).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = list(r["chunk"])
    for r in tok_arr.collect():
        expect = py_seq_chunks(list(r["tokens"]), cl, mx, ov)
        chunks = [got[r["doc_id"]][i] for i in sorted(got[r["doc_id"]])]
        assert chunks == expect, (r["doc_id"], cl, mx, ov)


def test_random_chunks_deterministic_and_in_bounds(tok_arr):
    a = random_chunks(tok_arr, 4, 1.0, seed=7).collect()
    b = random_chunks(tok_arr, 4, 1.0, seed=7).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))  # seeded => stable
    c = random_chunks(tok_arr, 4, 1.0, seed=8).collect()
    assert sorted(map(str, a)) != sorted(map(str, c))  # seed matters
    toks = {r["doc_id"]: list(r["tokens"]) for r in tok_arr.collect()}
    for r in a:
        full = toks[r["doc_id"]]
        chunk = list(r["chunk"])
        assert 1 <= len(chunk) <= 4
        # chunk is a contiguous slice of the doc
        joined = " ".join(full)
        assert " ".join(chunk) in joined
    # coverage arithmetic: ceil(n * ratio / len) chunks
    counts = Counter(r["doc_id"] for r in a)
    for d, n in counts.items():
        assert n == max(1, math.ceil(len(toks[d]) * 1.0 / 4))


# -- sentencizer seam (H4/T7, reference top2vec.py:365-370, 550-558) --------


def test_sentencize_splits_before_tokenize(spark, phrase_docs):
    from top2vec_spark.operators.chunks import sentencize

    out = sentencize(phrase_docs, lambda t: [s for s in t.split(" and ")])
    got = {
        (r["doc_id"], r["sent_id"]): r["sentence"] for r in out.collect()
    }
    exp = {}
    for r in phrase_docs.collect():
        for i, s in enumerate(r["text"].split(" and ")):
            exp[(r["doc_id"], i)] = s
    assert got == exp


def test_sentencizer_api_validation(spark, phrase_docs):
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, phrase_docs, min_count=0)
    # mutual exclusion (reference top2vec.py:371 docstring contract)
    with pytest.raises(ValueError, match="Only one of"):
        eng.chunk_documents(chunker=lambda t: [t], sentencizer=lambda t: [t])
    # non-callable message parity (reference top2vec.py:557-558)
    with pytest.raises(ValueError, match="must be callable"):
        eng.chunk_documents(sentencizer="nope")
    # happy path through the api
    out = eng.chunk_documents(sentencizer=lambda t: t.split(" and "))
    assert out.columns == ["doc_id", "sent_id", "sentence"]
    n_sent = out.count()
    n_doc = phrase_docs.count()
    assert n_sent > n_doc  # the corpus contains ' and ', so it must split
