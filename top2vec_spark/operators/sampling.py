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

import math

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
        s  = (seed * 2654435761 + 40503) mod 2^32   -- driver-side
        h1 = (d0 * 2654435761) mod 2^32
        h2 = ((h1 + s) * 40503) mod 2^32
        bucket = (h2 * 10000) >> 32

    The bucket takes the HIGH bits of the final product (Knuth's
    multiplicative-hash rule): ``h2 mod 10000`` would make
    ``bucket mod 16`` a pure function of ``doc_id mod 16`` (both
    multipliers are odd, 16 | 10000), so residue-structured ids
    (fixed-stride keys, byte offsets) would occupy only 1/16 of the
    bucket space and tiny split fractions would realize 0% or 16x
    their target. The high-bits form has no such structure. The seed
    is pre-amplified through the same multiplier (``s``, an exact
    driver-side integer any replay recomputes) because a RAW ``+
    seed`` perturbs high-bits buckets by at most 1 per seed step —
    adjacent seeds would produce near-identical splits.
    """
    d0 = F.pmod(doc_id.cast("long"), F.lit(2147483648))
    s = (int(seed) * _M1 + _M2) % 4294967296
    h1 = F.pmod(d0 * F.lit(_M1), F.lit(4294967296))
    h2 = F.pmod((h1 + F.lit(s)) * F.lit(_M2), F.lit(4294967296))
    return F.shiftright(h2 * F.lit(_BUCKETS), 32)


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
    # a NULL id hashes to a NULL bucket: every `b < hi` is not-true,
    # so the chain must END in raise_error, not in the last split —
    # otherwise malformed ids silently contaminate the final split
    expr: Column = F.raise_error(
        F.concat(
            F.lit("split_corpus: null/invalid doc_id: "),
            F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
        )
    )
    for name, hi in reversed(cutoffs):
        expr = F.when(b < F.lit(hi), F.lit(name)).otherwise(expr)
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("split"))


def mix_corpora(
    corpora: dict[str, DataFrame],
    weights: dict[str, float],
    token_budget: int,
    seed: int = 29,
) -> DataFrame:
    """Deterministic multi-source pretraining mixture — the published
    static-mixture recipe (The Pile / LLaMA-style weighted sources,
    where a small high-quality source may be seen for MULTIPLE epochs
    while a large one is subsampled): each source ``s`` receives a
    token budget ``weights[s] * token_budget``; with ``T_s`` tokens
    available that is ``epochs = floor(budget_s / T_s)`` full passes
    plus a remainder pass sampling documents at rate
    ``frac(budget_s / T_s)`` via the same stable hash as
    split_corpus (doc-level sampling, so the realized token share
    matches the budget in expectation — the published pipelines
    sample documents, not token spans).

    Input frames need (doc_id, n_tokens); output is one row per
    (source, epoch, doc) occurrence: (source, epoch, doc_id,
    n_tokens), epoch 0..k. Fully deterministic — per-source totals are
    the only driver-side values (one tiny agg per source), replication
    is a literal sequence explode, the remainder filter is the pure
    integer hash. Zero RNG, so re-runs and engines agree exactly.
    """
    if set(corpora) != set(weights):
        raise ValueError(
            f"corpora/weights keys differ: {sorted(corpora)} vs "
            f"{sorted(weights)}"
        )
    if not corpora:
        raise ValueError("corpora must name at least one source")
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {name!r}: {w}")
    total_w = sum(weights.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"mixture weights must sum to 1, got {total_w}")
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    out: DataFrame | None = None
    for name in sorted(corpora):
        df = corpora[name]
        t_s = df.agg(F.sum("n_tokens")).collect()[0][0]
        if not t_s:
            raise ValueError(f"source {name!r} has no tokens")
        budget_s = weights[name] * token_budget
        epochs = int(budget_s // t_s)
        cut = int(math.floor((budget_s - epochs * t_s) / t_s * _BUCKETS))
        parts: list[DataFrame] = []
        if epochs > 0:
            parts.append(
                df.withColumn(
                    "epoch",
                    F.explode(
                        F.sequence(
                            F.lit(0).cast("long"),
                            F.lit(epochs - 1).cast("long"),
                        )
                    ),
                )
            )
        if cut > 0:
            parts.append(
                df.filter(
                    split_bucket(F.col("doc_id"), seed=seed) < F.lit(cut)
                ).withColumn("epoch", F.lit(epochs).cast("long"))
            )
        if not parts:
            continue
        src = parts[0]
        for p in parts[1:]:
            src = src.unionByName(p)
        src = src.select(
            F.lit(name).alias("source"), "epoch", "doc_id", "n_tokens"
        )
        out = src if out is None else out.unionByName(src)
    if out is None:
        raise ValueError(
            "mixture is empty — every source's budget rounded to zero"
        )
    return out
