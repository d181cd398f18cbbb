"""Tokenizer contract tests — the byte-identity invariant surface
(SURVEY.md §2.2; reference top2vec/top2vec.py:117-131)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from top2vec_spark.functions.tokenizer import (
    _tokenize_series,
    deaccent,
    reference_tokenize,
    sql_tokens_expr,
    strip_tags,
    tokenize_udf,
)
from top2vec_spark.sources.pages import generate_pages_pdf


class TestReferenceTokenize:
    def test_basic(self):
        assert reference_tokenize("The cat sat.") == ["the", "cat", "sat"]

    def test_strip_tags(self):
        assert strip_tags("<b>bold</b> text") == "bold text"
        assert reference_tokenize("<html><body>hello world</body></html>") == [
            "hello",
            "world",
        ]

    def test_deaccent_after_lowercase(self):
        # gensim tokenize(lower=True, deacc=True): lower THEN deaccent
        assert reference_tokenize("Café Naïve ÜBER") == ["cafe", "naive", "uber"]
        assert deaccent("résumé") == "resume"

    def test_length_filter(self):
        # 1-char dropped, >15-char dropped (simple_preprocess 2..15)
        assert reference_tokenize("a ab abc supercalifragilisticexpialidocious") == [
            "ab",
            "abc",
        ]
        assert reference_tokenize("x" * 15 + " " + "y" * 16) == ["x" * 15]

    def test_underscore_prefix_dropped(self):
        assert reference_tokenize("_private public _x yes") == ["public", "yes"]

    def test_digits_terminate_tokens(self):
        # PAT_ALPHABETIC repeats (?!\d)\w — a digit ENDS the token
        assert reference_tokenize("abc123def") == ["abc", "def"]
        assert reference_tokenize("2fast 4you") == ["fast", "you"]

    def test_underscore_is_word_char(self):
        # \w includes '_': internal underscores stay
        assert reference_tokenize("snake_case") == ["snake_case"]

    def test_unicode_word_chars(self):
        # ß is a word char and survives NFD (no combining mark)
        assert reference_tokenize("straße") == ["straße"]

    def test_empty_and_whitespace(self):
        assert reference_tokenize("") == []
        assert reference_tokenize("   \n\t ") == []


class TestVectorizedPaths:
    def test_pandas_path_equals_oracle(self):
        texts = [
            "The cat sat.",
            "<b>Café</b> naïve _x a 123abc456",
            "straße ÜBER résumé supercalifragilisticexpialidocious",
            "",
            None,
            "snake_case and CamelCase mixed_Case",
        ]
        out = _tokenize_series(pd.Series(texts))
        for t, got in zip(texts, out):
            assert got == reference_tokenize(t or ""), t

    def test_udf_byte_identity_on_synthetic_pages(self, spark):
        """FIXTURES.md §1 round-trip: tokenize(strip_tags(html)) ==
        tokenize(text) byte-identically per url, pandas UDF vs oracle."""
        pdf = generate_pages_pdf(200, seed=42)
        df = spark.createDataFrame(pdf)
        got = (
            df.select(
                "url",
                tokenize_udf(F.col("text")).alias("toks"),
                tokenize_udf(F.decode(F.col("html"), "utf-8")).alias("html_toks"),
            )
            .orderBy("url")
            .collect()
        )
        assert len(got) == 200
        by_url = {r["url"]: (r["toks"], r["html_toks"]) for r in got}
        for _, row in pdf.iterrows():
            expect = reference_tokenize(row["text"])
            toks, html_toks = by_url[row["url"]]
            assert toks == expect, row["url"]
            # html wraps text with tags; stripping must round-trip
            assert html_toks == expect, row["url"]

    def test_sql_fast_path_matches_on_ascii(self, spark, tiny_docs):
        got = (
            tiny_docs.select("doc_id", sql_tokens_expr("text").alias("toks"))
            .orderBy("doc_id")
            .collect()
        )
        rows = tiny_docs.orderBy("doc_id").collect()
        for r_sql, r in zip(got, rows):
            assert list(r_sql["toks"]) == reference_tokenize(r["text"])


@pytest.mark.parametrize(
    "text",
    [
        "ação côte-d'ivoire Ångström",
        "हिन्दी 中文 русский ελληνικά",
        "mixed123numbers456and_underscores",
        "<a href='x'>nested <b>tags</b></a> trailing<",
        "éclair",  # combining acute: NFD input
        "éclair",  # precomposed
    ],
)
def test_adversarial_unicode_vectorized_equals_oracle(text):
    out = _tokenize_series(pd.Series([text]))
    assert out.iloc[0] == reference_tokenize(text)
