"""Hybrid retrieval: reciprocal-rank fusion of ranked lists (RRF,
Cormack/Clarke/Buettcher 2009, public method — score(d) = Σ_lists
1/(c + rank_list(d)), c=60 the published default).

Why RRF and not score interpolation: BM25 and cosine live on
incomparable scales; ranks are scale-free AND float-robust — the fused
score is a sum of exact rationals, so it is bit-identical across
engines wherever the input RANKINGS agree (which the driver gate
proves for both retrievers at their rounding precision). That makes
hybrid search fully DuckDB-oracle-able (driver row `hybrid_rrf_top10`)
where a score-mix would drown in float-parity noise.

Scale shape: the inputs are ALREADY top-k lists from the distributed
retrievers (WAND over the postings index, cosine/IVF/HNSW over the
vector tables) — fusion touches <= k rows per list, so the
single-partition rank windows here are O(k·lists) driver-adjacent
work by design; the corpus-sized effort happened upstream.

Reference note: Top2Vec has no hybrid mode (each search API is either
lexical-index or vector, top2vec.py:2421-2495 picks ONE path); this is
an engine addition in the spirit of the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: dict[str, DataFrame],
    k: int,
    rrf_c: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Fuse pre-ranked (id, score) lists: rank within each list by
    (score DESC, id ASC), sum 1/(rrf_c + rank) per id, return the
    top-k as (id_col, rrf_score, n_lists) ordered (rrf_score DESC,
    id ASC). ``n_lists`` = how many input lists contained the id."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    parts = []
    for name, df in ranked.items():
        parts.append(
            df.select(
                F.col(id_col),
                F.col(score_col),
                F.lit(str(name)).alias("_list"),
            ).withColumn("_rank", F.row_number().over(w))
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return (
        union.groupBy(id_col)
        .agg(
            F.sum(1.0 / (F.lit(float(rrf_c)) + F.col("_rank"))).alias(
                "rrf_score"
            ),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
