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
