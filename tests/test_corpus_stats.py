"""Corpus statistics (SURVEY.md A1/A8/P1) vs hand-computed oracles."""

from __future__ import annotations

from collections import Counter

import pytest

from top2vec_spark.functions.tokenizer import reference_tokenize
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
    number_vocab,
)
from top2vec_spark.operators.tokens import tokenize_docs


@pytest.fixture(scope="module")
def tokens_df(spark, tiny_docs):
    return tokenize_docs(tiny_docs).cache()


def _py_tokens(tiny_corpus):
    return {doc_id: reference_tokenize(text) for doc_id, text in tiny_corpus}


def test_tokens_long_format(tokens_df, tiny_corpus):
    got = {
        (r["doc_id"], r["pos"]): r["term"] for r in tokens_df.collect()
    }
    expect = {
        (doc_id, pos): term
        for doc_id, toks in _py_tokens(tiny_corpus).items()
        for pos, term in enumerate(toks)
    }
    assert got == expect


def test_vocab_counts(tokens_df, tiny_corpus):
    toks = _py_tokens(tiny_corpus)
    cf = Counter(t for ts in toks.values() for t in ts)
    df = Counter(t for ts in toks.values() for t in set(ts))
    vocab = {r["term"]: (r["df"], r["cf"]) for r in build_vocab(tokens_df).collect()}
    assert vocab == {t: (df[t], cf[t]) for t in cf}


def test_min_count_strictly_greater(tokens_df):
    # 'sat' has cf=6 ('the' cf=6 too); strict '>' must drop cf == min_count
    v2 = {r["term"] for r in build_vocab(tokens_df, min_count=2).collect()}
    assert "cats" not in v2  # cf == 2 dropped by strict >
    assert "sat" in v2
    v6 = {r["term"] for r in build_vocab(tokens_df, min_count=6).collect()}
    assert "sat" not in v6 and "the" not in v6


def test_term_ids_dense_and_deterministic(tokens_df):
    rows = build_vocab(tokens_df).orderBy("term_id").collect()
    ids = [r["term_id"] for r in rows]
    assert ids == list(range(len(rows)))
    # ordered by df desc, term asc
    keys = [(-r["df"], r["term"]) for r in rows]
    assert keys == sorted(keys)


def test_doc_stats_and_globals(tokens_df, tiny_corpus):
    toks = _py_tokens(tiny_corpus)
    ds = {r["doc_id"]: r["dl"] for r in build_doc_stats(tokens_df).collect()}
    assert ds == {d: len(ts) for d, ts in toks.items() if ts}
    g = compute_globals(build_doc_stats(tokens_df))
    assert g.n_docs == len(ds)
    assert g.avgdl == pytest.approx(sum(ds.values()) / len(ds))


def test_two_phase_numbering_persist_invariant(tokens_df):
    """persist_input (vocab path: cache the counts frame across the
    range-sampler and count jobs) must not change a single term_id."""
    from pyspark.sql import functions as F

    from top2vec_spark.operators.numbering import two_phase_row_number

    counts = (
        tokens_df.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"), F.countDistinct("doc_id").alias("df"))
    )
    order = [F.col("df").desc(), F.col("term").asc()]
    plain = {
        r["term"]: r["term_id"]
        for r in two_phase_row_number(
            counts, order, "term_id", persist_input=False
        ).collect()
    }
    cached = {
        r["term"]: r["term_id"]
        for r in two_phase_row_number(
            counts, order, "term_id", persist_input=True
        ).collect()
    }
    assert plain == cached and len(plain) > 0


def test_two_phase_numbering_stable_across_actions(spark):
    """The eager localCheckpoint freezes range boundaries: repeated
    actions on the SAME numbered frame — and downstream plans that
    embed it (the postings-build shape that caught the fused-offsets
    design producing duplicate ids) — must see one consistent, dense,
    duplicate-free numbering."""
    import random

    from pyspark.sql import functions as F

    from top2vec_spark.operators.numbering import two_phase_row_number

    random.seed(11)
    rows = [(f"t{i:05d}", random.randint(1, 40)) for i in range(3000)]
    df = spark.createDataFrame(rows, "term string, df int")
    out = two_phase_row_number(
        df, [F.col("df").desc(), F.col("term").asc()], "rid"
    )
    a = sorted((r["rid"], r["term"]) for r in out.collect())
    assert [x[0] for x in a] == list(range(3000))  # dense, no dups/skips
    # embed in a downstream plan (separate QueryExecution) — ids must
    # not shift: group by rid parity and re-collect the raw frame
    parity = {
        r["p"]: r["n"]
        for r in out.groupBy((F.col("rid") % 2).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert parity == {0: 1500, 1: 1500}
    b = sorted((r["rid"], r["term"]) for r in out.collect())
    assert a == b
    # order respected
    exp = sorted(rows, key=lambda r: (-r[1], r[0]))
    assert [(t, d) for (_, t), (t2, d) in zip(a, exp) if t == t2] or [
        x[1] for x in a
    ] == [t for t, _ in exp]


def test_driver_numbering_matches_two_phase_unicode_ties(spark):
    """r06: the index builder numbers a small vocab on the driver
    (python sort) — must equal number_vocab's distributed two-phase
    (df desc, term asc) numbering exactly, including unicode terms
    (UTF-8 byte order == code-point order) and df ties."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    alphas = ["ab", "über", "ñ", "漢", "ß", "émigré", "ａ", "𝒳", "🙂x"]
    # 9^4 = 6561 possible strings — comfortably above the 2000 target
    # (a tighter alphabet would loop forever)
    terms = set()
    while len(terms) < 2000:
        terms.add("".join(rng.choice(alphas) for _ in range(rng.randint(1, 4))))
    data = [(t, rng.randint(1, 50), rng.randint(1, 10)) for t in sorted(terms)]
    counts = spark.createDataFrame(
        data, "term string, cf long, df long"
    ).repartition(8)
    old = {r["term"]: r["term_id"] for r in number_vocab(counts).collect()}
    rows = counts.collect()
    rows.sort(key=lambda r: (-r["df"], r["term"]))
    new = {r["term"]: i for i, r in enumerate(rows)}
    assert old == new
