"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's capability surface (Top2Vec has no dedup), but
core to a 100 TB webtext engine: exact duplicates, MinHash+LSH
near-duplicates, SimHash, and n-gram Jaccard verification — all pure
DataFrame aggregations/joins plus numpy-vectorized hashing inside
Arrow pandas UDFs (no per-row Python).

Scale notes (10^12 docs):
- exact dedup: one hash-groupBy; Catalyst two-phase agg, the shuffle
  key is a 64-bit content hash -> uniform, no skew.
- MinHash LSH: shingle -> K minhashes -> B bands of R rows; the
  band-bucket join shuffles only (band_id, bucket_hash) pairs — K, B,
  R constant per doc, so shuffle volume is O(docs), not O(tokens).
  Identical-content clusters CAN skew a bucket; the group kernel only
  keeps pairs within a bucket cap (documented) — web-scale pipelines
  cap identical buckets the same way.
- SimHash: 64-bit fingerprint; near-dup candidates via k rotated
  prefix buckets (Charikar-style), verified by Hamming distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def _content_keys(docs: DataFrame, text_col: str):
    """Grouping keys for exact dedup: two INDEPENDENT xxhash64 values
    (different seed tuples) plus the byte length. A single 64-bit hash
    collides w.h.p. at ~2^32 distinct texts (guaranteed at the module's
    stated 10^12-doc scale); the combined ~128-bit + length key drives
    the collision probability below 10^-18 while every key stays a
    fixed-width JVM codegen expression — no full-text shuffle."""
    return [
        F.xxhash64(F.col(text_col)).alias("h1"),
        F.xxhash64(F.col(text_col), F.lit(0x5F3759DF)).alias("h2"),
        F.length(F.col(text_col)).alias("ln"),
    ]


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (content_hash, n_dups, doc_ids,
    keep_doc_id). xxhash64 is a Spark built-in (JVM, codegen)."""
    return (
        docs.select("doc_id", *_content_keys(docs, text_col))
        .groupBy("h1", "h2", "ln")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
        .select(
            F.col("h1").alias("content_hash"), "n_dups", "doc_ids", "keep_doc_id"
        )
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the smallest doc_id per identical text. Window-free:
    min(doc_id) per content key then semi-join — scales without a
    global sort."""
    keep = (
        docs.select("doc_id", *_content_keys(docs, text_col))
        .groupBy("h1", "h2", "ln")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
_M61 = (1 << 61) - 1  # Mersenne prime for universal hashing


def _minhash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _M61, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def token_hashes(
    tokens_arr: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, tokens array<string>) -> (doc_id, thash array<long>):
    per-token xxhash64 computed JVM-SIDE (codegen, runs at scan
    speed). Every downstream signature kernel consumes int64 arrays
    only — string bytes never reach Python. This is what keeps
    MinHash/SimHash viable at 100 TB: the Python side does pure numpy
    folds over fixed-width ints."""
    return tokens_arr.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(tokens_col), lambda t: F.xxhash64(t)).alias("thash"),
    )


def _shingles(th: np.ndarray, n: int) -> np.ndarray:
    """Unique n-gram shingle hashes from per-token hashes — vectorized
    rolling multiply-add fold (no per-byte / per-char Python). Docs
    shorter than n degrade to their unique token hashes (same
    contract as round-1's FNV fold)."""
    th = th.astype(np.uint64, copy=False)
    if th.size < n:
        return np.unique(th) if th.size else th
    mult = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        acc = th[: th.size - n + 1].copy()
        for j in range(1, n):
            acc = acc * mult + th[j : th.size - n + 1 + j]
    return np.unique(acc)


def minhash_signatures(
    tokens_arr: DataFrame,
    num_hashes: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, tokens array) -> (doc_id, sig array<long>).

    Deterministic: tokens are hashed JVM-side with xxhash64 (Python's
    str hash is per-process randomized and never used); the Python
    kernel sees only int64 arrays and runs a numpy shingle fold +
    universal-hash min — no per-row/per-byte Python anywhere.
    """
    a, b = _minhash_params(num_hashes, seed)

    def batch(pdfs):
        for pdf in pdfs:
            sigs = []
            for th in pdf["thash"]:
                sh = _shingles(np.asarray(th, dtype=np.int64), shingle_n)
                if sh.size == 0:
                    sigs.append(np.full(num_hashes, -1, dtype=np.int64))
                    continue
                # universal hash h_i(x) = (a_i * x + b_i) mod M61, min over x
                with np.errstate(over="ignore"):
                    prod = (sh[None, :] * a[:, None] + b[:, None]) % np.uint64(
                        _M61
                    )
                sigs.append(prod.min(axis=1).astype(np.int64))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sig": [s.tolist() for s in sigs]}
            )

    return token_hashes(tokens_arr).mapInPandas(
        batch, "doc_id long, sig array<long>"
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, bucket_cap: int = 64
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate pairs
    (doc_a < doc_b). Shuffle key = (band, bucket-hash) — uniform
    unless a bucket holds an identical-content cluster; buckets above
    ``bucket_cap`` emit only the pairs linking each doc to the bucket
    minimum (still connects the cluster for dedup, O(n) not O(n^2))."""
    n_hashes = len(signatures.select("sig").first()["sig"])
    rows = n_hashes // bands
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), i * rows + 1, rows), i
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(pdf["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        if ids.size > bucket_cap:
            a = np.full(ids.size - 1, ids[0])
            return pd.DataFrame({"doc_a": a, "doc_b": ids[1:]})
        ii, jj = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]})

    return (
        banded.groupBy("band", "bucket")
        .applyInPandas(pairs, "doc_a long, doc_b long")
        .distinct()
    )


def minhash_near_duplicates(
    tokens_arr: DataFrame,
    num_hashes: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Full pipeline: signatures -> LSH candidates -> verify estimated
    Jaccard (signature agreement) >= threshold. Returns
    (doc_a, doc_b, est_jaccard)."""
    sigs = minhash_signatures(tokens_arr, num_hashes, shingle_n, seed).cache()
    cands = lsh_candidate_pairs(sigs, bands)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    return (
        joined.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def dedup_near(
    docs: DataFrame,
    tokens_arr: DataFrame,
    num_hashes: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """End-to-end near-duplicate dedup: MinHash pairs -> connected
    components (transitive closure, operators/graph.py) -> keep ONE
    document (the min doc_id) per duplicate cluster. Returns ``docs``
    filtered to the keepers via a left-semi join — the corpus itself
    never shuffles by content; only the pair graph (a tiny fraction of
    the corpus) runs the star rounds."""
    from top2vec_spark.operators.graph import duplicate_clusters

    pairs = minhash_near_duplicates(
        tokens_arr, num_hashes, bands, shingle_n, threshold, seed
    )
    keepers = (
        duplicate_clusters(docs, pairs.select("doc_a", "doc_b"))
        .filter(F.col("is_keeper"))
        .select("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification / small-scale oracle)
# ---------------------------------------------------------------------------
def ngram_jaccard(
    tokens_arr: DataFrame, pairs: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Exact Jaccard over word-n-gram shingle sets for given
    (doc_a, doc_b) pairs — the verifier behind MinHash estimates."""

    def batch(pdfs):
        for pdf in pdfs:
            da = pdf["doc_a"].to_numpy()
            db = pdf["doc_b"].to_numpy()
            ja = np.empty(da.size, dtype=np.float64)
            for i in range(da.size):  # per candidate PAIR (not per row
                # of data): numpy set ops over pre-hashed int arrays
                sa = _shingles(np.asarray(pdf["th_a"].iloc[i], np.int64), shingle_n)
                sb = _shingles(np.asarray(pdf["th_b"].iloc[i], np.int64), shingle_n)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                ja[i] = inter / (union or 1)
            yield pd.DataFrame({"doc_a": da, "doc_b": db, "jaccard": ja})

    th = token_hashes(tokens_arr)
    a = th.select(F.col("doc_id").alias("doc_a"), F.col("thash").alias("th_a"))
    b = th.select(F.col("doc_id").alias("doc_b"), F.col("thash").alias("th_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .mapInPandas(batch, "doc_a long, doc_b long, jaccard double")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_fingerprints(tokens_arr: DataFrame, seed: int = 42) -> DataFrame:
    """64-bit Charikar SimHash over the doc's UNIQUE token hashes
    (set semantics) — JVM-side xxhash64 per token, numpy bit-vote
    accumulation per Arrow batch; no per-byte Python."""

    def batch(pdfs):
        for pdf in pdfs:
            fps = []
            for th_raw in pdf["thash"]:
                th = _shingles(np.asarray(th_raw, dtype=np.int64), 1)
                if th.size == 0:
                    fps.append(0)
                    continue
                bits = (th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                fp = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                fps.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": fps})

    return token_hashes(tokens_arr).mapInPandas(batch, "doc_id long, simhash long")


def simhash_near_duplicates(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    n_tables: int = 4,
    bucket_cap: int = 256,
) -> DataFrame:
    """Candidate generation by 16-bit prefix of n_tables rotations,
    verified by exact Hamming distance (<= max_hamming). Buckets above
    ``bucket_cap`` degrade to O(n) candidate pairs: a STAR against the
    bucket's min doc_id PLUS adjacency in sorted-fingerprint order.
    Identical-fingerprint clusters — the usual cause of an over-cap
    bucket — stay fully connected through the hamming-0 adjacency
    chain. Limitation (deliberate O(n) trade): a member of an over-cap
    bucket whose only near-neighbors are neither the min doc nor
    fingerprint-adjacent can lose pairs the O(n^2) path would have
    found."""
    rot = fingerprints
    parts = []
    for t in range(n_tables):
        shift = t * 16
        key = F.shiftrightunsigned(
            F.col("simhash").bitwiseXOR(F.lit(0)), shift
        ).bitwiseAND(F.lit(0xFFFF))
        parts.append(rot.select("doc_id", "simhash", key.alias("bucket"), F.lit(t).alias("tbl")))
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["doc_id"].to_numpy()
        fps = pdf["simhash"].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ids, fps = ids[order], fps[order]
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(
                {"doc_a": "int64", "doc_b": "int64", "hamming": "int32"}
            )
        if ids.size > bucket_cap:
            # O(n) degrade: star to the min doc_id + adjacency in
            # sorted-fingerprint order (identical fingerprints become
            # hamming-0 chains, keeping dup clusters connected)
            forder = np.argsort(fps, kind="stable")
            ii = np.concatenate(
                (np.zeros(ids.size - 1, dtype=np.int64), forder[:-1])
            )
            jj = np.concatenate((np.arange(1, ids.size), forder[1:]))
        else:
            ii, jj = np.triu_indices(ids.size, k=1)
        x = np.bitwise_xor(fps[ii], fps[jj]).astype(np.uint64)
        ham = np.zeros(x.shape, dtype=np.int32)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int32)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        a = np.minimum(ids[ii][keep], ids[jj][keep])
        b = np.maximum(ids[ii][keep], ids[jj][keep])
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": ham[keep]})

    return (
        banded.groupBy("tbl", "bucket")
        .applyInPandas(pairs, "doc_a long, doc_b long, hamming int")
        .groupBy("doc_a", "doc_b")
        .agg(F.min("hamming").alias("hamming"))
    )
