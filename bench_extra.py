"""Round-6 optimization instrumentation (bench.py stays FROZEN).

Decomposes the frozen bench's timed region per guide §1:
- per-stage build timings (tf / vocab / doc_stats / globals /
  postings / manifest) via the IndexBuilder stage markers;
- register_bucketed;
- warm single-query WAND and batched WAND timed exactly like bench.py.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
Prints one JSON line with the stage decomposition.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from top2vec_spark.operators.bm25 import resolve_query_terms
from top2vec_spark.operators.wand import wand_topk, wand_topk_many
from top2vec_spark.plans.build import IndexBuilder
from top2vec_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))

QUERIES = [
    ("kw_head2", ["table", "spark"], []),
    ("kw_head_neg", ["table", "spark"], ["slow"]),
    ("kw_mixed3", ["query", "window", "data"], []),
    ("kw_single", ["vector"], []),
    ("kw_many5", ["join", "group", "order", "sort", "hash"], []),
]
K = 10


def main() -> None:
    spark = get_spark(parallelism=CPUS, app_name="bench_extra")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    idx_dir = tempfile.mkdtemp(prefix="bench_extra_idx_")
    out: dict = {"sf_dir": SF_DIR, "n_docs": n_docs, "reps": []}
    try:
        for rep in range(REPS):
            shutil.rmtree(idx_dir, ignore_errors=True)
            builder = IndexBuilder(
                spark, idx_dir, docs_per_shard=max(4096, n_docs // 32)
            )
            # vocab/doc_stats/globals run CONCURRENTLY since r06 —
            # record each stage's completion offset from build start
            # (monotone per dependency chain, not additive)
            stage_done_at: dict[str, float] = {}
            orig_mark = builder._mark
            t0 = time.time()

            def mark(stage, **metrics):
                stage_done_at[stage] = round(time.time() - t0, 3)
                return orig_mark(stage, **metrics)

            builder._mark = mark
            index = builder.build_from_docs(docs, resume=False)
            total = round(time.time() - t0, 3)
            out["reps"].append(
                {"build_total": total, "stage_done_at": stage_done_at}
            )

        index.cache()
        vmap = {
            r["term"]: (r["term_id"], r["df"]) for r in index.vocab.collect()
        }
        g = index.globs
        wand_topk(
            spark, index, resolve_query_terms(vmap, ["the"], []), g, K
        ).collect()

        qlat = {}
        for name, pos, neg in QUERIES:
            tq = time.time()
            q = resolve_query_terms(vmap, pos, neg)
            wand_topk(spark, index, q, g, K).collect()
            qlat[f"q_{name}"] = round(time.time() - tq, 3)
        out["queries_cached_unbucketed"] = qlat

        q = resolve_query_terms(vmap, ["table", "spark"], [])
        reps = []
        for _ in range(7):
            tq = time.time()
            wand_topk(spark, index, q, g, K).collect()
            reps.append(time.time() - tq)
        out["p50_cached"] = round(statistics.median(reps), 4)

        t0b = time.time()
        index.register_bucketed(shard_buckets=CPUS, cache=True)
        out["register_bucketed"] = round(time.time() - t0b, 3)
        reps_b = []
        for _ in range(7):
            tq = time.time()
            wand_topk(spark, index, q, g, K).collect()
            reps_b.append(time.time() - tq)
        out["p50_bucketed"] = round(statistics.median(reps_b), 4)

        qmap = {
            name: resolve_query_terms(vmap, pos, neg)
            for name, pos, neg in QUERIES
        }
        reps_m = []
        for _ in range(7):
            tq = time.time()
            wand_topk_many(spark, index, qmap, g, K).collect()
            reps_m.append((time.time() - tq) / len(qmap))
        out["batched_per_query"] = round(statistics.median(reps_m), 4)

        print(json.dumps(out))
    finally:
        if getattr(index, "bucketed_table", None):
            spark.sql(f"DROP TABLE IF EXISTS {index.bucketed_table}")
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
