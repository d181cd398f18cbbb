"""IVF ANN recall/latency study at meaningful scale (round-5 verdict
item 4): 1.6M deterministic 64-dim vectors, recall@10 vs n_probe
against the exact brute-force result, plus warm per-query latency.

Reference contract being substituted: hnswlib ef/recall trade
(reference top2vec.py:1710, 2627-2640) — the engine's documented ANN
substitute is IVF cell pruning (operators/similarity.py ivf_*), whose
knob is n_probe. This publishes the table a user picks n_probe from.

Corpus: vec_id 0..N-1, 256 planted clusters. center[c] = seeded unit
gaussian (driver-side, one rng); vector = center[vec_id % 256] +
quasi-random noise sin(vec_id*p_j + j) * NOISE — fully deterministic
per (vec_id, dim), independent of partitioning. Queries are corpus
vectors re-noised (near-but-not-identical), the realistic ANN query.

Usage: python tools/ivf_recall_bench.py [N_VECS] [out.json]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from top2vec_spark.operators.similarity import (
    cosine_topk,
    ivf_build,
    ivf_load,
    ivf_topk,
    ivf_write,
)
from top2vec_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ivf_recall_r5.json"
DIM = 64
N_CLUSTERS = 256
N_CELLS = 1024
NOISE = 0.35
K = 10
N_QUERIES = 20
PROBES = [1, 2, 4, 8, 16, 32]
IDX_PATH = f"/tmp/ivf_idx_{N}"


def centers() -> np.ndarray:
    rng = np.random.default_rng(7)
    c = rng.normal(size=(N_CLUSTERS, DIM))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


_PRIMES = None


def make_vectors(vec_ids: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Deterministic per-(vec_id, dim): center + sin-hash noise."""
    global _PRIMES
    if _PRIMES is None:
        _PRIMES = np.linspace(0.61803, 2.41421, DIM)  # irrational-ish
    base = cents[vec_ids % N_CLUSTERS]
    phase = vec_ids[:, None] * _PRIMES[None, :] + np.arange(DIM)[None, :]
    v = base + NOISE * np.sin(phase)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def main():
    spark = get_spark(parallelism=32, app_name="ivf_recall")
    sc = spark.sparkContext
    cents = centers()
    bc = sc.broadcast(cents)

    def gen(pdfs):
        for pdf in pdfs:
            ids = pdf["id"].to_numpy().astype(np.int64)
            m = make_vectors(ids, bc.value).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(map(list, m))}
            )

    emb = (
        spark.range(N)
        .repartition(64)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )

    import os as _os

    if _os.path.exists(f"{IDX_PATH}/centroids"):
        # deterministic corpus: reuse the on-disk index from a prior
        # run of this script (delete IDX_PATH to force a rebuild)
        t_build = -1.0
        print(f"reusing existing index at {IDX_PATH}", flush=True)
    else:
        t0 = time.time()
        assigned, ivf_cents = ivf_build(
            emb, n_cells=N_CELLS, sample=50_000, iters=10, seed=42
        )
        ivf_write(assigned, ivf_cents, IDX_PATH)
        t_build = time.time() - t0
        print(f"ivf build+write {N} vecs: {t_build:.1f}s", flush=True)

    # queries: corpus vectors re-noised (vec_id + large offset phase)
    qids = np.arange(N_QUERIES) * (N // N_QUERIES) + 13
    qbase = make_vectors(qids, cents)
    rng = np.random.default_rng(99)
    qs = qbase + 0.1 * rng.normal(size=qbase.shape)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    emb_cached = spark.read.parquet(f"{IDX_PATH}/cells").persist()
    emb_cached.count()

    exact: dict[int, list[int]] = {}
    t_ex = []
    for i, q in enumerate(qs):
        t0 = time.time()
        rows = cosine_topk(emb_cached, q.tolist(), K).collect()
        t_ex.append(time.time() - t0)
        exact[i] = [r["vec_id"] for r in rows]
    print(
        f"brute exact p50 {statistics.median(t_ex):.3f}s "
        f"mean {sum(t_ex)/len(t_ex):.3f}s",
        flush=True,
    )

    # disk-resident brute (the fair baseline for the scale story:
    # when the corpus doesn't fit executor memory, brute re-reads ALL
    # cells per query while IVF reads n_probe of them)
    emb_disk = spark.read.parquet(f"{IDX_PATH}/cells")
    cosine_topk(emb_disk, qs[0].tolist(), K).collect()  # warm catalog
    t_bd = []
    for q in qs[:5]:
        t0 = time.time()
        cosine_topk(emb_disk, q.tolist(), K).collect()
        t_bd.append(time.time() - t0)
    brute_disk_p50 = statistics.median(t_bd)
    print(f"brute-from-disk p50 {brute_disk_p50:.3f}s", flush=True)

    # serving pattern: load ONCE (centroid collect + one partition
    # discovery of the cell directory tree), then per-query ivf_topk
    # on the kept DataFrame — the per-query job reads only the
    # n_probe probed cell partitions from DISK (no corpus cache; the
    # 10^12-vector story is exactly "corpus >> memory, read only the
    # probed cells"). ivf_topk_path (reload per call) is the cold-
    # start API, not the serving loop.
    assigned, ivf_cents_loaded = ivf_load(spark, IDX_PATH)
    results = {}
    for np_ in PROBES:
        recs, lats = [], []
        # one warmup
        ivf_topk(assigned, ivf_cents_loaded, qs[0].tolist(), K, n_probe=np_).collect()
        for i, q in enumerate(qs):
            t0 = time.time()
            rows = ivf_topk(
                assigned, ivf_cents_loaded, q.tolist(), K, n_probe=np_
            ).collect()
            lats.append(time.time() - t0)
            got = [r["vec_id"] for r in rows]
            recs.append(len(set(got) & set(exact[i])) / K)
        results[np_] = {
            "recall_at_10": round(sum(recs) / len(recs), 4),
            "p50_sec": round(statistics.median(lats), 4),
            "mean_sec": round(sum(lats) / len(lats), 4),
            "qps": round(1.0 / statistics.median(lats), 2),
        }
        print(f"n_probe={np_:3d}: {results[np_]}", flush=True)

    out = {
        "n_vecs": N,
        "dim": DIM,
        "n_cells": N_CELLS,
        "k": K,
        "n_queries": N_QUERIES,
        "build_write_sec": round(t_build, 1),
        "brute_exact_p50_sec": round(statistics.median(t_ex), 4),
        "brute_disk_p50_sec": round(brute_disk_p50, 4),
        "probes": results,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
