"""Similarity search over embedding columns (array<float>).

This re-expresses the reference's dense-vector retrieval surface
(brute top-k `_search_vectors_by_vector`, top2vec/top2vec.py:1276-1282
K1; opt-in hnswlib ANN, top2vec.py:1710-1825 K2) for the engine's
`embeddings` table (vec_id, embedding, label):

- ``cosine_topk``           exact brute force (the oracle / baseline)
- ``ivf_build/ivf_topk``    IVF-style bucketed ANN: k-means-lite
                            centroids driver-side on a sample, cells
                            pruned by centroid distance at query time
                            — the scale path (probes only n_probe
                            cells instead of the full table)
- ``centroids`` / ``assign_nearest`` re-express SURVEY.md A3/K5
  (topic centroid + argmax assignment) as DataFrame ops.

All hot paths are numpy over Arrow batches (mapInPandas) or pure
column expressions — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack(col.to_numpy())


def cosine_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: per-partition numpy matmul + local heap,
    merged by TakeOrderedAndProject (ORDER BY LIMIT). Mirrors the
    reference contract incl. tie-break (score DESC, id ASC)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    def batch(pdfs):
        for pdf in pdfs:
            m = _as_matrix(pdf[vec_col]).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            scores = (m @ qn) / norms
            # local prune to k to keep the merge tiny
            if scores.size > k:
                keep = np.argpartition(-scores, k)[:k]
            else:
                keep = np.arange(scores.size)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy()[keep], "score": scores[keep]}
            )

    out = embeddings.select(id_col, vec_col).mapInPandas(
        batch, "vec_id long, score double"
    )
    return out.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(k)


def cosine_topk_sql(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Pure column-expression variant (F.aggregate/F.zip_with dot
    product) — zero Python; used as the DuckDB-oracle-matched entry.
    ``round_digits`` rounds BEFORE ordering so the LIMIT boundary is
    deterministic across engines (oracle-compare mode)."""
    q = [float(x) for x in query]
    qn = float(np.linalg.norm(q)) or 1.0
    qcol = F.array(*[F.lit(x) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col).cast("array<double>"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    score = dot / (norm * F.lit(qn))
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-style bucketed ANN (the 100 TB path)
# ---------------------------------------------------------------------------
def ivf_build(
    embeddings: DataFrame,
    n_cells: int = 64,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Train cell centroids on a driver-side sample (k-means on unit
    vectors), assign every vector to its nearest cell (one mapInPandas
    pass). Returns (assigned DataFrame with `cell` column, centroids).

    At 10^12 rows the assigned table is written partitioned by cell so
    queries prune to n_probe cells (partition pruning, like postings
    buckets)."""
    # uniform .sample(), NOT .limit(): limit takes the first partitions
    # only, which biases the centroids on sorted/clustered data
    n_total = embeddings.count()
    frac = min(1.0, (sample * 1.25) / max(n_total, 1))
    samp_df = (
        embeddings.select(vec_col).sample(fraction=frac, seed=seed).limit(sample)
    )
    samp = np.vstack([r[vec_col] for r in samp_df.collect()]).astype(np.float64)
    samp /= np.maximum(np.linalg.norm(samp, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = samp[rng.choice(samp.shape[0], size=min(n_cells, samp.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(samp @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            m = samp[assign == c]
            if m.shape[0]:
                v = m.mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) or 1.0)

    bc = embeddings.sparkSession.sparkContext.broadcast(cents)

    def assign_batch(pdfs):
        c = bc.value
        for pdf in pdfs:
            m = _as_matrix(pdf[vec_col]).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(m @ c.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "embedding": pdf[vec_col],
                    "cell": cell,
                }
            )

    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign_batch, f"vec_id long, embedding array<float>, cell int"
    )
    return assigned, cents


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query: Sequence[float],
    k: int,
    n_probe: int = 8,
) -> DataFrame:
    """Probe the n_probe nearest cells only, exact cosine within them.
    Recall is tunable via n_probe (n_probe = n_cells -> exact)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    cells = np.argsort(-(centroids @ qn))[:n_probe].tolist()
    pruned = assigned.filter(F.col("cell").isin([int(c) for c in cells]))
    return cosine_topk(pruned, query, k)


def ivf_write(assigned: DataFrame, centroids: np.ndarray, path: str) -> None:
    """Persist the IVF index in the 10^12-row serving layout: vectors
    PARTITIONED BY cell (a query's `cell IN (...)` becomes directory-
    level partition pruning — only the n_probe probed cells are read,
    like postings buckets) + the centroid table alongside."""
    spark = assigned.sparkSession
    assigned.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_load(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Load an ivf_write index: (cell-partitioned vectors, centroids)."""
    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["cell"],
    )
    cents = np.vstack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    return spark.read.parquet(f"{path}/cells"), cents


def ivf_topk_path(
    spark,
    path: str,
    query: Sequence[float],
    k: int,
    n_probe: int = 8,
) -> DataFrame:
    """ANN top-k over a persisted ivf_write index. The cell filter is
    a PARTITION filter on the parquet scan (directory pruning): the
    job reads only the n_probe probed cells regardless of corpus
    size — the plan-pinned scale path (tests/test_similarity.py)."""
    assigned, cents = ivf_load(spark, path)
    return ivf_topk(assigned, cents, query, k, n_probe=n_probe)


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate detection (training-data pipeline)
# ---------------------------------------------------------------------------
def embedding_near_duplicates_exact(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — EXACT, O(n^2)
    column expressions (zip_with dot product on the self-join). This
    is the small-scale oracle / verifier; the scale path is the LSH
    variant below. Returns (vec_id_a, vec_id_b, cosine).
    ``round_digits`` rounds BEFORE thresholding so the boundary is
    deterministic across engines (oracle-compare mode)."""
    normed = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: x
            / F.sqrt(
                F.aggregate(
                    F.transform(F.col(vec_col).cast("array<double>"), lambda a: a * a),
                    F.lit(0.0),
                    lambda s, v: s + v,
                )
            ),
        ).alias("v"),
    )
    a = normed.select(F.col("id").alias("vec_id_a"), F.col("v").alias("va"))
    b = normed.select(F.col("id").alias("vec_id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    cosine = F.round(dot, round_digits) if round_digits is not None else dot
    return (
        a.crossJoin(b)
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def embedding_near_duplicates_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 8,
    bits: int = 16,
    bucket_cap: int = 512,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: random-hyperplane LSH (signed projections ->
    ``bits``-bit bucket key per table), candidates generated inside
    buckets only, verified by EXACT cosine (numpy matmul per bucket).
    Shuffle volume is O(n * n_tables) key-pairs — never all-pairs.
    Buckets above ``bucket_cap`` degrade to star pairs vs the bucket
    minimum (same policy as MinHash/SimHash caps). Recall is tunable
    via n_tables/bits (pytest pins recall vs the exact operator)."""
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, bits, dim))
    bc = embeddings.sparkSession.sparkContext.broadcast(planes)

    def bucketize(pdfs):
        pl = bc.value
        pw = 1 << np.arange(bits, dtype=np.int64)
        for pdf in pdfs:
            m = _as_matrix(pdf["v"]).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            vids = pdf["_id"].to_numpy()
            out_id, out_tbl, out_bkt = [], [], []
            for t in range(pl.shape[0]):
                signs = (m @ pl[t].T) > 0  # (rows, bits)
                out_id.append(vids)
                out_tbl.append(np.full(vids.size, t, dtype=np.int32))
                out_bkt.append((signs.astype(np.int64) * pw).sum(axis=1))
            yield pd.DataFrame(
                {
                    "_id": np.concatenate(out_id),
                    "tbl": np.concatenate(out_tbl),
                    "bucket": np.concatenate(out_bkt),
                    "v": list(pdf["v"]) * pl.shape[0],
                }
            )

    banded = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).mapInPandas(bucketize, "_id long, tbl int, bucket long, v array<double>")

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = _as_matrix(pdf["v"].iloc[order]).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        if ids.size < 2:
            return pd.DataFrame(
                {"vec_id_a": [], "vec_id_b": [], "cosine": []}
            ).astype({"vec_id_a": "int64", "vec_id_b": "int64", "cosine": "float64"})
        if ids.size > bucket_cap:  # star-pair degrade
            ii = np.zeros(ids.size - 1, dtype=np.int64)
            jj = np.arange(1, ids.size)
            cos = (m[jj] * m[0]).sum(axis=1)
        else:
            ii, jj = np.triu_indices(ids.size, k=1)
            cos = (m @ m.T)[ii, jj]
        keep = cos >= threshold
        return pd.DataFrame(
            {"vec_id_a": ids[ii][keep], "vec_id_b": ids[jj][keep], "cosine": cos[keep]}
        )

    return (
        banded.groupBy("tbl", "bucket")
        .applyInPandas(pairs, "vec_id_a long, vec_id_b long, cosine double")
        .groupBy("vec_id_a", "vec_id_b")
        .agg(F.max("cosine").alias("cosine"))
    )


# ---------------------------------------------------------------------------
# centroid / nearest-centroid (SURVEY.md A3 / K5 over `embeddings`)
# ---------------------------------------------------------------------------
def label_centroids(
    embeddings: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean vector, L2-normalized (reference topic centroid,
    top2vec.py:1056-1062) — pure aggregate: explode by position, avg,
    re-collect. Position explode keeps it all-JVM."""
    dim = len(embeddings.select(vec_col).first()[vec_col])
    by_pos = embeddings.select(
        label_col,
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    means = (
        by_pos.groupBy(label_col, "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        )
        .select(
            label_col,
            F.transform("pm", lambda x: x["m"]).alias("mean_vec"),
        )
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("mean_vec", lambda a: a * a), F.lit(0.0), lambda s, x: s + x
        )
    )
    return means.select(
        label_col,
        F.transform("mean_vec", lambda a: a / norm).alias("centroid"),
    )


def assign_nearest(
    embeddings: DataFrame,
    centroids: DataFrame,
    label_col: str = "label",
) -> DataFrame:
    """argmax-inner-product assignment of each vector to a centroid
    (reference K5, top2vec.py:1129-1176): broadcast the (tiny)
    centroid table, numpy matmul per Arrow batch."""
    # sort by label: np.argmax takes the FIRST max on ties, so sorted
    # labels give the deterministic (score DESC, label ASC) contract
    cent_rows = sorted(centroids.collect(), key=lambda r: r[label_col])
    labels = np.array([r[label_col] for r in cent_rows], dtype=np.int64)
    mat = np.vstack([r["centroid"] for r in cent_rows]).astype(np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast((labels, mat))

    def batch(pdfs):
        lb, m = bc.value
        for pdf in pdfs:
            v = _as_matrix(pdf["embedding"]).astype(np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ m.T
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "assigned_label": lb[best],
                    "score": sims[np.arange(best.size), best],
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        batch, "vec_id long, assigned_label long, score double"
    )


def assign_tokens_nearest(
    tokens: DataFrame,
    centroids: DataFrame,
    label_col: str = "label",
) -> DataFrame:
    """Token-level argmax-inner-product topic assignment — the
    distributed form of the reference's `_calculate_documents_topic`
    (top2vec.py:1081-1146) applied to STACKED contextual token
    embeddings (the `stacked_document_embeddings` argument of
    calculate_documents_topic_distributions, top2vec.py:805-812):
    raw ``np.inner`` scores (NO row normalization — the reference
    feeds already-encoded vectors verbatim), first-max tie-break
    (np.argmax → after the label sort, score DESC then label ASC).

    Input is the long token table ``(doc_id, pos, vec)`` from
    embed_document_tokens; output one row per token:
    ``(doc_id, pos, topic_id, score)``. Same scale shape as
    assign_nearest: broadcast the tiny centroid matrix, one numpy
    matmul per Arrow batch, zero shuffles."""
    cent_rows = sorted(centroids.collect(), key=lambda r: r[label_col])
    if not cent_rows:
        raise ValueError("assign_tokens_nearest: centroid table is empty")
    labels = np.array([r[label_col] for r in cent_rows], dtype=np.int64)
    mat = np.vstack([r["centroid"] for r in cent_rows]).astype(np.float64)
    bc = tokens.sparkSession.sparkContext.broadcast((labels, mat))

    def batch(pdfs):
        lb, m = bc.value
        for pdf in pdfs:
            v = _as_matrix(pdf["vec"]).astype(np.float64)
            sims = v @ m.T
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pos": pdf["pos"].astype("int64"),
                    "topic_id": lb[best],
                    "score": sims[np.arange(best.size), best],
                }
            )

    return tokens.select("doc_id", "pos", "vec").mapInPandas(
        batch, "doc_id long, pos long, topic_id long, score double"
    )


def assign_topn(
    embeddings: DataFrame,
    centroids: DataFrame,
    n: int,
    label_col: str = "label",
) -> DataFrame:
    """Per-vector top-N nearest centroids (W4; reference
    get_documents_topics num_topics>1, top2vec.py:1873-1958):
    broadcast centroid matrix, numpy matmul per Arrow batch, argsort
    top-N, exploded to (vec_id, rank, label, score) — rank 1 = best,
    ties broken label ASC (lexsort)."""
    cent_rows = sorted(centroids.collect(), key=lambda r: r[label_col])
    labels = np.array([r[label_col] for r in cent_rows], dtype=np.int64)
    mat = np.vstack([r["centroid"] for r in cent_rows]).astype(np.float64)
    n = min(n, labels.size)
    bc = embeddings.sparkSession.sparkContext.broadcast((labels, mat))

    def batch(pdfs):
        lb, m = bc.value
        idx_lb = np.arange(lb.size)
        for pdf in pdfs:
            v = _as_matrix(pdf["embedding"]).astype(np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ m.T
            # top-n per row: score DESC, label ASC (labels pre-sorted,
            # stable argsort keeps the contract)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
            rows = np.repeat(pdf["vec_id"].to_numpy(), n)
            ranks = np.tile(np.arange(1, n + 1), len(pdf))
            flat = order.ravel()
            yield pd.DataFrame(
                {
                    "vec_id": rows,
                    "rank": ranks.astype(np.int32),
                    "label": lb[flat],
                    "score": sims[np.repeat(np.arange(len(pdf)), n), flat],
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        batch, "vec_id long, rank int, label long, score double"
    )
