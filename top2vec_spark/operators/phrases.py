"""Phrase (bigram) mining — reference T8/A7 (SURVEY.md §2.2, §2.4).

The reference uses gensim ``Phrases(min_count=5, threshold=10.0,
delimiter=' ')`` (top2vec/top2vec.py:624-649, 876-890). gensim's
(public) scoring is the original word2vec NPMI-precursor:

    score(a, b) = (count(a,b) - min_count) * vocab_size
                  / (count(a) * count(b))

with a bigram kept when score > threshold (strictly greater, and only
when count(a,b) >= min_count so the numerator is non-negative).

Spark-first: adjacent pairs come from a self-join of the tokens table
on (doc_id, pos) = (doc_id, pos+1) — two shuffle-free window forms are
possible, but the lag-window needs a per-doc sort anyway, so we use
``lead() over (partition by doc_id order by pos)`` which Catalyst
executes with a single partial sort per doc partition. Counting is a
plain two-phase hash agg. Fully SQL-expressible -> DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

GENSIM_DELIM = " "


def bigram_counts(tokens: DataFrame) -> DataFrame:
    """tokens(doc_id, pos, term) -> (term_a, term_b, pair_count) for
    adjacent pairs."""
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = tokens.withColumn("term_b", F.lead("term").over(w)).filter(
        F.col("term_b").isNotNull()
    )
    return (
        pairs.groupBy(F.col("term").alias("term_a"), "term_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


def find_phrases(
    tokens: DataFrame,
    min_count: int = 5,
    threshold: float = 10.0,
) -> DataFrame:
    """Returns (phrase, term_a, term_b, pair_count, score) for bigrams
    passing the gensim original-scorer contract."""
    uni = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab_size = uni.count()
    pairs = bigram_counts(tokens)
    a = uni.select(F.col("term").alias("term_a"), F.col("cnt").alias("cnt_a"))
    b = uni.select(F.col("term").alias("term_b"), F.col("cnt").alias("cnt_b"))
    scored = (
        pairs.join(a, "term_a")
        .join(b, "term_b")
        .withColumn(
            "score",
            (F.col("pair_count") - F.lit(min_count))
            * F.lit(float(vocab_size))
            / (F.col("cnt_a") * F.col("cnt_b")),
        )
        .filter(
            (F.col("pair_count") >= min_count) & (F.col("score") > threshold)
        )
    )
    return scored.select(
        F.concat_ws(GENSIM_DELIM, "term_a", "term_b").alias("phrase"),
        "term_a",
        "term_b",
        "pair_count",
        "score",
    )


def tokens_with_phrases(tokens: DataFrame, phrases: DataFrame) -> DataFrame:
    """ngram_vocab path (reference top2vec.py:876-890): AUGMENT the
    token stream with one pseudo-token per occurrence of each mined
    phrase — "machine learning" becomes a first-class vocabulary term
    with its own df/cf/postings, so multi-word keywords retrieve
    through the same index as unigrams.

    Documented deviation: gensim's Phrases REPLACES the constituent
    pair in the stream; we ADD the phrase token and keep the unigrams,
    so all unigram statistics (and every existing oracle) stay
    unchanged while phrases become searchable. The extra rows are
    bounded by the mined-phrase occurrence count.

    Plan shape: the phrase table joins BROADCAST against the adjacent
    -pair stream (phrases are a bounded dimension — min_count filters
    the tail), so the only wide work is the same per-doc lead() window
    bigram_counts already does."""
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = tokens.withColumn("term_b", F.lead("term").over(w)).filter(
        F.col("term_b").isNotNull()
    )
    ph = phrases.select(
        F.col("term_a").alias("_pa"),
        F.col("term_b").alias("_pb"),
        "phrase",
    )
    phrase_tokens = pairs.join(
        F.broadcast(ph),
        (F.col("term") == F.col("_pa")) & (F.col("term_b") == F.col("_pb")),
    ).select("doc_id", "pos", F.col("phrase").alias("term"))
    return tokens.select("doc_id", "pos", "term").unionByName(phrase_tokens)
