"""Corpus statistics: vocabulary, document stats, BM25 globals.

Replaces the reference's CountVectorizer vocabulary build
(top2vec/top2vec.py:858-874, operators A1/A8/P1 in SURVEY.md §2.4):
two-phase hash aggregations that Catalyst plans as
partial+final HashAggregate — the map-side combine keeps the
head-term (Zipf) skew from concentrating rows before the shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top2vec_spark.config import DEFAULT_MIN_COUNT


def build_vocab(tokens: DataFrame, min_count: int = DEFAULT_MIN_COUNT) -> DataFrame:
    """vocab(term, term_id, df, cf).

    cf = corpus frequency (total occurrences), df = document
    frequency. min_count filter is STRICT '>' (reference
    top2vec.py:869). term_id is a deterministic dense id by
    (df desc, term asc) — most frequent terms get the smallest ids,
    which keeps head-term postings in predictable buckets.
    """
    counts = (
        tokens.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("cf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("cf") > min_count)
    )
    return number_vocab(counts)


def number_vocab(counts: DataFrame, start: int = 0) -> DataFrame:
    """Assign term_id = start + dense rank by (df desc, term asc) to a
    (term, df, cf) frame — two-phase parallel numbering, NOT a global
    window (a min_count-filtered web vocab is 10^7-10^8 rows; a
    no-partition row_number would sort all of it in ONE task)."""
    from top2vec_spark.operators.numbering import two_phase_row_number

    return two_phase_row_number(
        counts.select("term", "df", "cf"),
        [F.col("df").desc(), F.col("term").asc()],
        "term_id",
        start=start,
        # counts is a corpus-scale aggregation: cache it so the range
        # sampler + count job don't each re-run the full tf pass
        persist_input=True,
    ).select("term", "term_id", "df", "cf")


def build_doc_stats(tokens: DataFrame) -> DataFrame:
    """doc_stats(doc_id, dl) — document length in tokens."""
    return tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))


@dataclass(frozen=True)
class CorpusGlobals:
    n_docs: int
    avgdl: float
    sum_dl: int = 0  # exact token total; lets appends update avgdl
    #                  bit-identically to a full recompute


def compute_globals(doc_stats: DataFrame) -> CorpusGlobals:
    """N and avgdl for BM25. One tiny two-column aggregate collect.

    Note: N counts documents that produced >= 1 token (empty docs have
    no tokens rows, hence dl undefined); the brute scorer and WAND use
    the same N so ranks are consistent. Exact df/N required — BM25
    score-identity forbids approx_count_distinct (SURVEY.md A8).
    avgdl is derived from the EXACT long sum (not a float-accumulated
    avg), so incremental appends reproduce it bit-identically by
    adding the new batch's exact dl sum (plans/build.py)."""
    row = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n, s = int(row["n"]), int(row["s"] or 0)
    return CorpusGlobals(n_docs=n, avgdl=s / n if n else 0.0, sum_dl=s)
