"""HNSW recall/latency study at meaningful scale — the graph-index
counterpart to tools/ivf_recall_bench.py (same corpus, same queries,
same ground truth) so the two ANN paths publish one side-by-side
table: recall@10 and warm per-query latency vs ef, plus build cost.

Reference contract: hnswlib's ef/recall trade (reference
top2vec.py:1710, 2627-2640). The engine's true graph path is
operators/hnsw.py (sharded from-scratch HNSW); its knob is ef.

Corpus: identical generator to ivf_recall_bench.py — N deterministic
64-dim unit vectors, 256 planted clusters + sin-hash noise, queries =
corpus vectors re-noised. Ground truth: exact brute cosine top-10.

Usage: python tools/hnsw_recall_bench.py [N_VECS] [out.json]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from top2vec_spark.operators.hnsw import (
    hnsw_build,
    hnsw_serving,
    hnsw_topk,
    hnsw_topk_many,
    hnsw_write,
)
from top2vec_spark.operators.similarity import cosine_topk
from top2vec_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hnsw_recall_r5.json"
DIM = 64
N_CLUSTERS = 256
NOISE = 0.35
K = 10
N_QUERIES = 20
EFS = [8, 16, 32, 64, 128]
M = 16
EF_CONSTRUCTION = 100
N_SHARDS = max(8, N // 12_500)  # ~12.5k vectors per shard graph
IDX_PATH = f"/tmp/hnsw_idx_{N}"


def centers() -> np.ndarray:
    rng = np.random.default_rng(7)
    c = rng.normal(size=(N_CLUSTERS, DIM))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


_PRIMES = np.linspace(0.61803, 2.41421, DIM)


def make_vectors(vec_ids: np.ndarray, cents: np.ndarray) -> np.ndarray:
    base = cents[vec_ids % N_CLUSTERS]
    phase = vec_ids[:, None] * _PRIMES[None, :] + np.arange(DIM)[None, :]
    v = base + NOISE * np.sin(phase)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def main():
    spark = get_spark(parallelism=32, app_name="hnsw_recall")
    sc = spark.sparkContext
    cents = centers()
    bc = sc.broadcast(cents)

    def gen(pdfs):
        for pdf in pdfs:
            ids = pdf["id"].to_numpy().astype(np.int64)
            m = make_vectors(ids, bc.value).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(map(list, m))})

    emb = (
        spark.range(N)
        .repartition(64)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )

    if os.path.exists(IDX_PATH):
        t_build = -1.0
        print(f"reusing existing index at {IDX_PATH}", flush=True)
    else:
        t0 = time.time()
        hnsw_write(
            hnsw_build(emb, n_shards=N_SHARDS, M=M, ef_construction=EF_CONSTRUCTION),
            IDX_PATH,
        )
        t_build = time.time() - t0
        print(
            f"hnsw build+write {N} vecs / {N_SHARDS} shards: {t_build:.1f}s "
            f"({N/t_build:.0f} vecs/s)",
            flush=True,
        )

    qids = np.arange(N_QUERIES) * (N // N_QUERIES) + 13
    qbase = make_vectors(qids, cents)
    rng = np.random.default_rng(99)
    qs = qbase + 0.1 * rng.normal(size=qbase.shape)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    # exact ground truth on the cached raw corpus
    emb_cached = emb.persist()
    emb_cached.count()
    exact: dict[int, list[int]] = {}
    t_ex = []
    for i, q in enumerate(qs):
        t0 = time.time()
        rows = cosine_topk(emb_cached, q.tolist(), K).collect()
        t_ex.append(time.time() - t0)
        exact[i] = [r["vec_id"] for r in rows]
    brute_p50 = statistics.median(t_ex)
    print(f"brute exact p50 {brute_p50:.3f}s", flush=True)
    emb_cached.unpersist()

    # serving pattern: pin blobs once (one task per shard), query many
    index = hnsw_serving(spark, IDX_PATH, num_tasks=min(N_SHARDS, 128))
    results = {}
    for ef in EFS:
        recs, lats = [], []
        hnsw_topk(index, qs[0].tolist(), K, ef=ef).collect()  # warmup
        for i, q in enumerate(qs):
            t0 = time.time()
            rows = hnsw_topk(index, q.tolist(), K, ef=ef).collect()
            lats.append(time.time() - t0)
            got = [r["vec_id"] for r in rows]
            recs.append(len(set(got) & set(exact[i])) / K)
        # batched serving: ALL queries in ONE job (the wand_topk_many twin)
        qdict = {f"q{i}": q.tolist() for i, q in enumerate(qs)}
        t0 = time.time()
        brows = hnsw_topk_many(index, qdict, K, ef=ef).collect()
        t_batch = time.time() - t0
        bgot: dict[int, set] = {}
        for r in brows:
            bgot.setdefault(int(r["query_id"][1:]), set()).add(r["vec_id"])
        brecall = sum(
            len(bgot.get(i, set()) & set(exact[i])) / K for i in range(len(qs))
        ) / len(qs)
        results[ef] = {
            "recall_at_10": round(sum(recs) / len(recs), 4),
            "p50_sec": round(statistics.median(lats), 4),
            "mean_sec": round(sum(lats) / len(lats), 4),
            "qps": round(1.0 / statistics.median(lats), 2),
            "batched_per_query_sec": round(t_batch / len(qs), 4),
            "batched_recall_at_10": round(brecall, 4),
        }
        print(f"ef={ef:4d}: {results[ef]}", flush=True)

    out = {
        "n_vecs": N,
        "dim": DIM,
        "n_shards": N_SHARDS,
        "M": M,
        "ef_construction": EF_CONSTRUCTION,
        "k": K,
        "n_queries": N_QUERIES,
        "build_write_sec": round(t_build, 1),
        "brute_exact_p50_sec": round(brute_p50, 4),
        "efs": results,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
