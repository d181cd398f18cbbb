"""Exact, skew-safe top-N-per-group and the per-domain quota sampler.

Web-scale pipelines cap how many pages any one host can contribute
(boilerplate-heavy mega-hosts would otherwise dominate the training
mix). The naive plan — one row_number window partitioned by host —
puts an entire mega-host in ONE task: a host holding 10% of a 100 TB
corpus becomes a 10 TB straggler partition. The reference has no
sampling operators (beyond-reference pipeline component, like dedup).

``top_n_per_group`` keeps the window semantics but makes it exact AND
skew-proof with the classic two-phase refinement:

  phase 1: window over (group, salt) — salt = xxhash64(id) % S, so a
           mega-group splits into S bounded sub-partitions; keep each
           sub-partition's top N.
  phase 2: window over (group) on the <= N*S survivors per group —
           tiny by construction; keep the true top N.

Exactness: any row in a group's true top N is, a fortiori, in the top
N of the sub-partition that contains it (every row beating it there
also beats it globally), so phase 1 never discards a winner. The
ordering must be TOTAL (callers append a unique id tiebreak) or ranks
are nondeterministic — enforced by convention, pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from top2vec_spark.operators.textquality import quality_score
from top2vec_spark.operators.webtext import with_url_parts


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    id_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact top-``n`` rows per group under a total order, two-phase
    (salted partial top-n, then final top-n over survivors). Output =
    input columns + ``rank`` (1-based within the group)."""
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(*group_cols, "salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    survivors = (
        df.withColumn("salt", salt)
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= n)
        .drop("salt", "rn")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= n)
    )


def domain_quota(
    pages: DataFrame,
    per_host: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most ``per_host`` pages per URL host, preferring higher
    quality_score — the per-domain quota sampler of C4-style corpus
    construction. Deterministic cross-engine total order: quality
    ROUNDED to 6 digits descending (unrounded doubles can differ in
    the last ULP between engines, flipping near-ties), then ascending
    id. Returns (doc_id, host, quality, rank) for the kept pages."""
    scored = with_url_parts(quality_score(pages, text_col))
    q6 = F.round(F.col("quality"), 6).alias("quality")
    ranked = top_n_per_group(
        scored.select(id_col, "host", q6),
        group_cols=["host"],
        order_cols=[F.col("quality").desc(), F.col(id_col).asc()],
        n=per_host,
        id_col=id_col,
        salt_buckets=salt_buckets,
    )
    return ranked.select(id_col, "host", "quality", "rank")
