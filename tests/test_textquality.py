"""Text-analysis operators vs python oracles."""

from __future__ import annotations

import re

import pytest

from top2vec_spark.operators.textquality import (
    fingerprint,
    lang_id,
    quality_features,
    quality_score,
    token_counts,
)


@pytest.fixture(scope="module")
def tdocs(spark):
    rows = [
        (0, "The quick brown fox is in the garden with the dog.", "en"),
        (1, "Der Hund ist nicht in der Küche und das ist gut.", "de"),
        (2, "Le chat est dans la maison et les oiseaux pour toujours.", "fr"),
        (3, "El perro es una mascota que vive con los gatos.", "es"),
        (4, "zzzz qqqq xxxx 12345 67890 !!!", "und"),
        (5, "data 123 data 123 data 123, mixed: tokens!", "en?"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, truth string").cache()


def test_lang_id(tdocs):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(tdocs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"


def test_token_counts_oracle(tdocs):
    got = {
        r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"])
        for r in token_counts(tdocs).collect()
    }
    for r in tdocs.collect():
        ws = len(r["text"].strip().split())
        bpe = len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", r["text"]))
        assert got[r["doc_id"]] == (ws, bpe), r["text"]


def test_quality_features_oracle(tdocs):
    rows = {r["doc_id"]: r for r in quality_features(tdocs).collect()}
    for r in tdocs.collect():
        t = r["text"]
        f = rows[r["doc_id"]]
        assert f["n_chars_q"] == len(t)
        n_words = len(t.strip().split())
        assert f["n_words"] == n_words
        alpha = sum(c.isascii() and c.isalpha() for c in t)
        assert f["alpha_ratio"] == pytest.approx(alpha / len(t))
        digit = sum(c.isdigit() for c in t)
        assert f["digit_ratio"] == pytest.approx(digit / len(t))
        uniq = len(set(t.strip().split()))
        assert f["uniq_word_ratio"] == pytest.approx(uniq / n_words)


def test_quality_score_ordering(tdocs):
    got = {r["doc_id"]: r["quality"] for r in quality_score(tdocs).collect()}
    # clean English prose beats digit/punct garbage
    assert got[0] > got[4]
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_fingerprint_normalization(spark):
    rows = [(0, "Hello   World"), (1, "hello world"), (2, "  HELLO \t WORLD  "), (3, "different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fp64"] for r in fingerprint(df).collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] != got[0]
