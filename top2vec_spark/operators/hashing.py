"""Feature-hashing document vectors (the "hashing trick" of
Weinberger et al. 2009, the same construction as scikit-learn's
HashingVectorizer) — a TURNKEY, model-free document embedding so
``compute_topics`` / vector search / embedding near-dup work
end-to-end without a user-supplied encoder (the gap the reference
fills by downloading TF-Hub/SBERT models, top2vec.py:1313-1347, which
is out of scope here per the north rule).

Entirely JVM-side DataFrame ops: per-doc term frequencies -> a
broadcast join against the vocabulary for stable ``term_id``s ->
integer bucket/sign hashes -> per-bucket signed sums -> dense
L2-normalized ``array<float>``. No Python in the hot path; one
shuffle (the tf groupBy); output shape (vec_id, embedding) plugs
straight into compute_topics / ivf_build / cosine_topk.

Hash design (SQL-mirrorable on purpose — the driver oracle replays it
in DuckDB): bucket and sign derive from ``term_id`` by integer
multiplicative hashing (Knuth constants), so any engine that agrees
on the vocabulary numbering reproduces the vectors bit-for-bit. With
integer weights (use_idf=False) the whole chain — integer bucket
sums, exact float64 squares, correctly-rounded sqrt/divide, float32
cast — is bit-identical cross-engine, the same argument as the
embed_hook oracle row.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative-hash constants (public domain, TAOCP vol 3).
_BUCKET_MULT = 2654435761
_SIGN_MULT = 40503


def hashed_doc_vectors(
    tokens: DataFrame,
    vocab: DataFrame,
    dim: int = 256,
    use_idf: bool = False,
    n_docs: int | None = None,
) -> DataFrame:
    """tokens(doc_id, pos, term) + vocab(term, term_id, df) ->
    (vec_id, embedding: array<float>), L2-normalized hashed
    term-frequency vectors:

        bucket(t) = (term_id * 2654435761) % dim
        sign(t)   = 2 * ((term_id * 40503) % 2) - 1
        v[bucket] = sum over terms of sign * weight

    ``weight`` is the integer per-doc tf by default; with
    ``use_idf=True`` it is tf * ln(n_docs / df) (requires ``n_docs``),
    the classical smooth-free idf. Out-of-vocabulary tokens (below the
    vocab min_count) drop out, mirroring the reference's vocab-bounded
    embeddings. Documents with no in-vocab token are ABSENT from the
    output (no zero vector exists on the unit sphere).
    """
    if use_idf and n_docs is None:
        raise ValueError("use_idf=True requires n_docs")
    # Occurrence-level weights: summing sign (resp. sign*idf) once per
    # token occurrence equals sign*tf (resp. sign*tf*idf) — so no
    # per-(doc, term) tf pre-aggregation shuffle is needed. The plan
    # is: broadcast vocab join (narrow) -> groupBy(doc_id, bucket)
    # with map-side combine (shuffle carries <= dim rows per doc per
    # partition) -> groupBy(doc_id) assembly (<= dim rows per doc
    # globally). At corpus scale the raw token stream never shuffles.
    w = tokens.join(
        F.broadcast(vocab.select("term", "term_id", "df")), "term"
    )
    if use_idf:
        weight = F.ln(F.lit(float(n_docs)) / F.col("df"))
    else:
        weight = F.lit(1.0)
    bucket = (F.col("term_id") * F.lit(_BUCKET_MULT)) % F.lit(dim)
    sign = (
        (F.col("term_id") * F.lit(_SIGN_MULT)) % F.lit(2)
    ) * F.lit(2) - F.lit(1)
    sums = (
        w.select(
            "doc_id",
            bucket.cast("int").alias("bucket"),
            (sign.cast("double") * weight).alias("wv"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("wv").alias("val"))
    )
    dense = sums.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "val"))
        ).alias("m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at("m", i.cast("int")), F.lit(0.0)
        ),
    )
    nrm = F.sqrt(
        F.aggregate(
            "v", F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return (
        dense.select(F.col("doc_id").alias("vec_id"), arr.alias("v"))
        .filter(F.size(F.filter("v", lambda x: x != 0)) > 0)
        .select(
            "vec_id",
            F.transform("v", lambda x: x / nrm)
            .cast("array<float>")
            .alias("embedding"),
        )
    )


def hashed_vector_py(
    term_ids_tfs: list[tuple[int, int]], dim: int
) -> list[float]:
    """Pure-Python mirror of hashed_doc_vectors (use_idf=False) for
    tests: the exact bucket/sign/normalize arithmetic on one doc."""
    v = [0.0] * dim
    for term_id, tf in term_ids_tfs:
        b = (term_id * _BUCKET_MULT) % dim
        s = 2 * ((term_id * _SIGN_MULT) % 2) - 1
        v[b] += s * tf
    n = math.sqrt(sum(x * x for x in v))
    if n == 0:
        return []
    return [x / n for x in v]
