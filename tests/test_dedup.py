"""Dedup operators vs python oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard,
    simhash_fingerprints,
    simhash_near_duplicates,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    other = "completely different content about spark inverted indexes"
    rows = [
        (0, base),
        (1, base),           # exact dup of 0
        (2, near),           # near dup of 0
        (3, other),
        (4, base),           # exact dup of 0
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def tokens_arr(spark, dup_docs):
    return dup_docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("tokens")
    ).cache()


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 1, 4]
    assert groups[0]["keep_doc_id"] == 0
    kept = sorted(r["doc_id"] for r in dedup_exact(dup_docs).collect())
    assert kept == [0, 2, 3, 5]


def test_minhash_estimates_jaccard(spark, tokens_arr):
    sigs = {r["doc_id"]: np.array(r["sig"]) for r in minhash_signatures(tokens_arr).collect()}
    # exact dups -> identical signatures
    assert (sigs[0] == sigs[1]).all() and (sigs[0] == sigs[4]).all()
    # near dup -> high but not perfect agreement
    agree = (sigs[0] == sigs[2]).mean()
    # hash-free oracle: Jaccard over raw string 3-gram shingle SETS is
    # identical to Jaccard over (injective w.h.p.) hashed shingles
    toks = {r["doc_id"]: list(r["tokens"]) for r in tokens_arr.collect()}

    def str_shingles(ts):
        return {tuple(ts[i : i + 3]) for i in range(len(ts) - 2)}

    sa, sb = str_shingles(toks[0]), str_shingles(toks[2])
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(agree - true_j) < 0.2
    # unrelated docs -> low agreement
    assert (sigs[0] == sigs[3]).mean() < 0.2


def test_lsh_pipeline_finds_near_dups(spark, tokens_arr):
    # 32 bands x 4 rows -> LSH s-curve threshold (1/32)^(1/4) ~= 0.42.
    # verify threshold 0.45: the near-dup pair's true Jaccard is 0.54
    # and the 128-hash estimate has sigma ~= 0.044, so 0.45 accepts it
    # with >2 sigma margin while unrelated pairs (< 0.2) stay excluded
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_near_duplicates(
            tokens_arr, bands=32, threshold=0.45
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 4) in pairs and (1, 4) in pairs
    assert (0, 2) in pairs  # near dup found
    assert not any(3 in p for p in pairs)  # unrelated never paired


def test_ngram_jaccard_exact(spark, tokens_arr):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard(tokens_arr, pairs).collect()}
    assert got[(0, 1)] == 1.0
    assert 0.3 < got[(0, 2)] < 1.0
    assert got[(0, 3)] == 0.0


def test_simhash(spark, tokens_arr):
    fps = simhash_fingerprints(tokens_arr).cache()
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert vals[0] == vals[1] == vals[4]
    # hamming(near dup) small, hamming(unrelated) large
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(vals[0], vals[2]) <= 16
    assert ham(vals[0], vals[3]) > 16
    nd = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(fps, max_hamming=16).collect()
    }
    assert nd.get((0, 1)) == 0
    assert (0, 2) in nd


def test_simhash_overcap_bucket_stays_connected(spark):
    """Over-cap buckets degrade to O(n) pairs (star + fingerprint-
    adjacency): a cluster of identical documents larger than bucket_cap
    must still come out fully connected via hamming-0 edges."""
    rows = [(i, "identical content words repeated here") for i in range(40)]
    rows += [(100 + i, f"totally different text number {i} unique") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("tokens")
    )
    fps = simhash_fingerprints(toks)
    pairs = simhash_near_duplicates(fps, max_hamming=0, bucket_cap=8).collect()
    # union-find over the emitted edges: all 40 identical docs connect
    parent = {i: i for i in range(40)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        if a < 40 and b < 40:
            parent[find(a)] = find(b)
    assert len({find(i) for i in range(40)}) == 1
