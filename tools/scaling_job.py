"""One scaling-study run: build the full index over a pages parquet at
local[N], run the fixture queries, print one JSON line. Invoked as a
subprocess by tools/scaling_bench.py (each run gets its own JVM)."""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, sys.path[0].rsplit("/tools", 1)[0] if "/tools" in sys.path[0] else ".")

from top2vec_spark.operators.bm25 import resolve_query_terms
from top2vec_spark.operators.wand import wand_topk
from top2vec_spark.plans.build import IndexBuilder
from top2vec_spark.session import get_spark

QUERIES = [(["wa", "wb"], []), (["wc"], []), (["wa", "wd"], ["wb"])]


def main() -> None:
    input_path, cpus = sys.argv[1], int(sys.argv[2])
    spark = get_spark(parallelism=cpus, app_name=f"scaling_{cpus}")
    docs = spark.read.parquet(input_path)  # doc_id, url, text
    n_docs = docs.count()

    import os

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{cpus}_", dir=scratch)
    try:
        # Warm the Python UDF workers + shuffle machinery BEFORE the
        # timed build: worker fork costs seconds of wall-clock that
        # are identical at any parallelism (it happens once per
        # worker, in parallel) — a pure fixed cost that would bias
        # the N-vs-4N ratio toward 1. The study measures steady-state
        # build throughput, not session cold-start.
        from top2vec_spark.operators.tokens import doc_term_counts_packed

        doc_term_counts_packed(
            docs.limit(cpus * 32).repartition(cpus)
        ).groupBy().count().collect()

        t0 = time.time()
        index = IndexBuilder(
            spark, idx_dir, docs_per_shard=max(4096, n_docs // 32)
        ).build_from_docs(docs, resume=False)
        t_build = time.time() - t0

        # per-stage breakdown from the build's own stage markers
        # (completed_at timestamps): attributes scaling loss to stages
        stages = {}
        prev = t0
        for st in ("tf", "vocab", "doc_stats", "globals", "postings", "manifest"):
            try:
                with open(f"{idx_dir}/_stages/{st}.json") as f:
                    done_at = json.load(f)["completed_at"]
                stages[st] = round(done_at - prev, 3)
                prev = done_at
            except Exception:
                pass

        index.cache()
        vmap = {
            r["term"]: (r["term_id"], r["df"]) for r in index.vocab.collect()
        }
        lats = []
        for pos, neg in QUERIES * 3:
            tq = time.time()
            q = resolve_query_terms(vmap, pos, neg)
            wand_topk(spark, index, q, index.globs, 10).collect()
            lats.append(time.time() - tq)
        print(
            json.dumps(
                {
                    "cpus": cpus,
                    "n_docs": n_docs,
                    "build_sec": round(t_build, 3),
                    "docs_per_sec": round(n_docs / t_build, 1),
                    "query_p50_sec": round(statistics.median(lats), 4),
                    "stages": stages,
                }
            )
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
