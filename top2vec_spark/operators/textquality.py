"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All pure Spark column expressions (whole-stage codegen, zero Python)
so they run at scan speed over 100 TB.

Not in the reference (Top2Vec has no data-quality surface); added per
the engine's training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# n-gram cue words per language — tiny heuristic tables (public
# stopword knowledge), good enough for a coarse routing signal.
_LANG_CUES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con"],
}

_STOPWORDS_EN = set(_LANG_CUES["en"]) | {"a", "an", "it", "on", "as", "are", "was"}


def _cue_hits(text_col: Column, words: list[str]) -> Column:
    """Count cue-word hits via one regexp per language (JVM-side)."""
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text_col, F.lit(pat), 1))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language cue-word hit rates, argmax
    with 'und' (undetermined) when nothing fires. Adds
    (lang_pred string, lang_conf double)."""
    t = F.col(text_col)
    n_words = F.greatest(F.size(F.split(t, r"\s+")), F.lit(1))
    scores = F.array(
        *[
            F.struct(
                (_cue_hits(t, ws) / n_words).alias("rate"), F.lit(lg).alias("lg")
            )
            for lg, ws in _LANG_CUES.items()
        ]
    )
    best = F.array_max(scores)
    return docs.withColumn(
        "lang_pred", F.when(best["rate"] > 0, best["lg"]).otherwise(F.lit("und"))
    ).withColumn("lang_conf", best["rate"].cast("double"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Web-corpus quality features (C4/Gopher-style rules, public
    knowledge): length, word stats, punctuation/alpha ratios, stopword
    rate, repetition. All codegen'd column math."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    mean_word_len = (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    stop_pat = r"(?i)\b(" + "|".join(sorted(_STOPWORDS_EN)) + r")\b"
    n_stop = F.size(F.regexp_extract_all(t, F.lit(stop_pat), 1))
    n_uniq = F.size(F.array_distinct(words))
    return (
        docs.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn("alpha_ratio", (n_alpha / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("digit_ratio", (n_digit / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("punct_ratio", (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("stopword_ratio", (n_stop / F.greatest(n_words, F.lit(1))).cast("double"))
        .withColumn("uniq_word_ratio", (n_uniq / F.greatest(n_words, F.lit(1))).cast("double"))
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar [0,1] quality score from the features — a fixed linear
    rubric (documented, deterministic), NOT a learned model."""
    f = quality_features(docs, text_col)
    score = (
        F.lit(0.25) * F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.25) * F.col("alpha_ratio")
        + F.lit(0.20) * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
        + F.lit(0.20) * F.col("uniq_word_ratio")
        + F.lit(0.10) * (F.lit(1.0) - F.least(F.col("digit_ratio") * 5, F.lit(1.0)))
    )
    return f.withColumn("quality", score.cast("double"))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    (letter runs / digit runs / single non-space symbols — the classic
    GPT-2-style pre-tokenizer shape)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(t, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    )
    return docs.withColumn("n_tokens_ws", ws).withColumn("n_tokens_bpe", bpe)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint: xxhash64 of the
    whitespace-normalized, lowercased text (rolling-hash equivalent,
    JVM built-in)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.withColumn("fp64", F.xxhash64(norm))
