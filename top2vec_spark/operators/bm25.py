"""Brute-force BM25 top-k — the engine's reference scorer.

This is SURVEY.md §7.2 step 3: the "one real query" end-to-end slice
and, forever after, the oracle that block-max WAND must match
rank-identically (docIDs AND float64 scores). It re-expresses
Top2Vec's ``search_documents_by_keywords`` (reference
top2vec/top2vec.py:2855-2945): positive keywords add BM25 score,
negative keywords subtract (mirror of the vector sum/subtract at
top2vec.py:1264-1274, documented re-expression SURVEY.md §7.4).

Scoring (north rule constants k1=1.2, b=0.75):

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d) = sum_{t in pos} s(d, t) - sum_{t in neg} s(d, t)

Ties broken (score DESC, doc_id ASC) — the reference leaves ties to
np.argsort quicksort order (top2vec.py:1279, nondeterministic); we fix
a deterministic contract (SURVEY.md Appendix A).

Physical plan notes: the term filter prunes the tokens scan (pushed
to parquet), per-(doc,term) tf is a partial+final hash agg, the query
side (term -> idf, sign) is a broadcast join, and the final top-k is
``ORDER BY ... LIMIT k`` which Catalyst plans as
TakeOrderedAndProject (per-partition heap + driver merge — no global
sort). Zero full shuffless beyond the tf aggregation.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top2vec_spark.config import BM25Config
from top2vec_spark.operators.corpus_stats import CorpusGlobals


def idf(n_docs: int, df: int) -> float:
    """BM25 idf, shared by brute scorer, WAND block-max bounds, and
    the pytest oracle."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


QTERM_SCHEMA = "term string, term_id long, df long, sign double"


def resolve_query_terms(
    vocab_lookup,
    pos_terms: Sequence[str],
    neg_terms: Sequence[str] = (),
) -> list[tuple[str, int, int, float]]:
    """Driver-side query planning: lowercase keywords (reference
    top2vec.py:1433-1434, T4), validate vocab membership
    (top2vec.py:1426-1441), return (term, term_id, df, sign) tuples.

    ``vocab_lookup`` is either a dict term -> (term_id, df) or a vocab
    DataFrame (one filtered collect — used when the vocab is too big
    to pin on the driver).
    """
    pos = [t.lower() for t in pos_terms]
    neg = [t.lower() for t in neg_terms]
    all_terms = list(dict.fromkeys(pos + neg))
    if not all_terms:
        raise ValueError("at least one keyword required")
    if isinstance(vocab_lookup, dict):
        found = {
            t: vocab_lookup[t] for t in all_terms if t in vocab_lookup
        }
    else:
        found = {
            r["term"]: (r["term_id"], r["df"])
            for r in vocab_lookup.filter(F.col("term").isin(all_terms))
            .select("term", "term_id", "df")
            .collect()
        }
    missing = [t for t in all_terms if t not in found]
    if missing:
        raise ValueError(f"keywords not in vocabulary: {missing}")
    negset = set(neg)
    return [
        (t, found[t][0], found[t][1], -1.0 if t in negset else 1.0)
        for t in all_terms
    ]


def term_weights(
    spark: SparkSession,
    vocab: DataFrame,
    pos_terms: Sequence[str],
    neg_terms: Sequence[str] = (),
) -> DataFrame:
    """DataFrame form of resolve_query_terms (query-side broadcast
    table for the brute scorer)."""
    rows = resolve_query_terms(vocab, pos_terms, neg_terms)
    return spark.createDataFrame(rows, QTERM_SCHEMA)


def bm25_score_col(cfg: BM25Config, n_docs: int) -> F.Column:
    """Per-(doc, term) BM25 contribution as a Column expression over
    columns tf, idf, dl, avgdl, sign.

    idf arrives as a PRE-COMPUTED column (Python math.log, driver-side)
    rather than F.log: JVM Math.log and C libm disagree by 1 ulp on
    some inputs, and WAND must reproduce these scores bit-for-bit.
    The operation order matches the WAND kernel's numpy expression:
    sign * ((idf * (tf*(k1+1))) / denom).
    """
    k1 = F.lit(cfg.k1)
    b = F.lit(cfg.b)
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (F.lit(1.0) - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    return F.col("sign") * (F.col("idf") * (tf * (k1 + F.lit(1.0))) / denom)


def bm25_scores(
    tokens: DataFrame,
    doc_stats: DataFrame,
    globs: CorpusGlobals,
    weights: DataFrame,
    cfg: BM25Config = BM25Config(),
) -> DataFrame:
    """Unlimited (doc_id, score) for every doc matching >= 1 query
    term — the scoring plan shared by the top-k wrapper and the
    DuckDB-oracle entry queries."""
    wrows = weights.collect()
    terms = [r["term"] for r in wrows]
    # idf computed driver-side with Python math.log — the exact same
    # doubles the WAND kernel uses (see bm25_score_col docstring).
    wq = tokens.sparkSession.createDataFrame(
        [
            (r["term"], r["term_id"], r["df"], r["sign"], idf(globs.n_docs, r["df"]))
            for r in wrows
        ],
        "term string, term_id long, df long, sign double, idf double",
    )
    tf = (
        tokens.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Deterministic float64 accumulation: per-doc contributions are
    # sorted by term_id and summed left-to-right (F.aggregate over a
    # sorted array, JVM-side), so block-max WAND — which accumulates
    # in the same order — reproduces scores BIT-identically
    # (SURVEY.md §7.5 "score-identical BM25 under float math").
    return (
        tf.join(F.broadcast(wq), "term")
        .join(doc_stats, "doc_id")
        .withColumn("avgdl", F.lit(globs.avgdl))
        .withColumn("contrib", bm25_score_col(cfg, globs.n_docs))
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term_id", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
    )


def bm25_topk_bruteforce(
    tokens: DataFrame,
    doc_stats: DataFrame,
    globs: CorpusGlobals,
    weights: DataFrame,
    k: int,
    cfg: BM25Config = BM25Config(),
    exclude_doc_ids: Sequence[int] = (),
) -> DataFrame:
    """Exact BM25 top-k via full postings scan — returns
    (doc_id, score) ordered score DESC, doc_id ASC, k rows.

    ``exclude_doc_ids`` implements the reference's over-fetch +
    self-exclusion contract (top2vec.py:3167-3177, P5): callers
    over-fetch k + len(exclude) then re-limit.
    """
    scored = bm25_scores(tokens, doc_stats, globs, weights, cfg)
    if exclude_doc_ids:
        scored = scored.filter(~F.col("doc_id").isin(list(exclude_doc_ids)))
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def mlt_top_terms(
    tokens: DataFrame,
    vocab: DataFrame,
    globs: CorpusGlobals,
    doc_id: int,
    max_terms: int = 25,
) -> list[str]:
    """Lucene MoreLikeThis interesting-term selection (MLT
    maxQueryTerms default 25): rank the source document's terms by
    tf x idf ("frequent here, rare in the corpus") and keep the top
    ``max_terms``. The weight is ROUNDED to 6 decimals before ranking
    so the cutoff cannot flip on a 1-ulp ln() divergence between
    engines (the WAND bit-parity lesson applied to term selection);
    ties break term ASC. One planning-time collect of <= max_terms
    tiny rows — same budget class as a prefix expansion."""
    if max_terms < 1:
        raise ValueError("max_terms must be >= 1")
    n = F.lit(float(globs.n_docs))
    ranked = (
        tokens.filter(F.col("doc_id") == doc_id)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(vocab.select("term", "df"), "term")
        .withColumn(
            "tw",
            F.round(
                F.col("tf")
                * F.log(
                    F.lit(1.0)
                    + (n - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
                6,
            ),
        )
        .orderBy(F.col("tw").desc(), F.col("term").asc())
        .limit(max_terms)
        .collect()
    )
    if not ranked:
        raise ValueError(f"document {doc_id} has no vocabulary terms")
    return [r["term"] for r in ranked]
