"""Deterministic corpus splitting — hash-based train/val/test
assignment for training-data pipelines.

Random splits don't survive re-runs, appends, or engine changes; the
standard production answer is a pure function of the document id, so
membership is stable forever and new documents route themselves
without touching old assignments. The hash is a two-round
multiplicative chain (Knuth TAOCP vol 3 constants, same family as
operators/hashing.py) kept strictly below 2^63 at every step, so any
engine with 64-bit integer arithmetic — Spark, DuckDB, a future
exporter — reproduces the assignment bit-identically; no engine RNG,
no salt files.

Scale shape: one codegen'd projection over the corpus — zero
shuffles, zero Python. Filters on the split column push down to the
parquet scan when the assignment is persisted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M1 = 2654435761  # Knuth multiplicative-hash constants (TAOCP vol 3)
_M2 = 40503
_BUCKETS = 10_000


def split_bucket(doc_id: Column, seed: int = 17) -> Column:
    """The 0..9999 assignment bucket for a document id — a pure,
    overflow-safe integer chain (every intermediate < 2^63 for any
    BIGINT doc_id, so Spark and SQL replays agree exactly):

        d0 = pmod(doc_id, 2^31)
        h1 = (d0 * 2654435761) mod 2^32
        h2 = ((h1 + seed) * 40503) mod 2^32
        bucket = h2 mod 10000
    """
    d0 = F.pmod(doc_id.cast("long"), F.lit(2147483648))
    h1 = F.pmod(d0 * F.lit(_M1), F.lit(4294967296))
    h2 = F.pmod((h1 + F.lit(int(seed))) * F.lit(_M2), F.lit(4294967296))
    return F.pmod(h2, F.lit(_BUCKETS))


def split_corpus(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 17,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a named split: docs -> (doc_id, split).

    ``weights`` maps split name -> fraction (must sum to 1 within
    1e-9); default {'train': .98, 'val': .01, 'test': .01}. Cutoffs
    are cumulative-fraction thresholds over the 10k-bucket hash in
    the caller's insertion order, so realized sizes are exact to
    1/10000. Changing ``seed`` re-draws every assignment; changing a
    fraction only moves documents across the one affected boundary
    (the standard stable-split property).
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must name at least one split")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    cutoffs: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in weights.items():
        if frac < 0:
            raise ValueError(f"negative weight for split {name!r}")
        acc += frac
        cutoffs.append((str(name), int(round(acc * _BUCKETS))))
    cutoffs[-1] = (cutoffs[-1][0], _BUCKETS)  # close rounding gaps
    b = split_bucket(F.col(id_col), seed=seed)
    expr: Column | None = None
    for name, hi in reversed(cutoffs):
        lit = F.lit(name)
        expr = lit if expr is None else F.when(b < F.lit(hi), lit).otherwise(expr)
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("split"))
