"""Large-corpus query-latency study (round-1 verdict follow-up): p50 of
warm BM25 WAND top-10 at 1.6M docs on local[32], across the three
serving paths — directory scan (cached), bucketed table (Exchange-free,
cached), and batched multi-query (one job, many queries). Writes one
JSON line."""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from top2vec_spark.operators.bm25 import resolve_query_terms
from top2vec_spark.operators.wand import wand_topk, wand_topk_many
from top2vec_spark.plans.build import IndexBuilder
from top2vec_spark.session import get_spark

N_DOCS = int(os.environ.get("LAT_N_DOCS", "1600000"))
DPS = int(os.environ.get("LAT_DOCS_PER_SHARD", "131072"))
REPS = 7
QUERIES = [(["wa", "wb"], []), (["wc"], []), (["wa", "wd"], ["wb"]),
           (["wb", "wc"], []), (["wd"], ["wa"])]


def p50(fn, reps=REPS):
    xs = []
    for _ in range(reps):
        t0 = time.time(); fn(); xs.append(time.time() - t0)
    return round(statistics.median(xs), 4)


def main():
    spark = get_spark(parallelism=32, app_name="latency_bench")
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.sources.pages import generate_pages

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="lat_", dir=scratch)
    try:
        docs = assign_doc_ids(generate_pages(spark, N_DOCS)).select(
            "doc_id", "url", "text"
        )
        t0 = time.time()
        index = IndexBuilder(
            spark, f"{work}/idx", docs_per_shard=DPS, n_buckets=64
        ).build_from_docs(docs, resume=False)
        t_build = time.time() - t0

        vmap = {r["term"]: (r["term_id"], r["df"]) for r in index.vocab.collect()}
        q0 = resolve_query_terms(vmap, ["wa", "wb"], [])

        index.cache()
        wand_topk(spark, index, q0, index.globs, 10).collect()  # warm
        p_dir = p50(lambda: wand_topk(spark, index, q0, index.globs, 10).collect())

        index.register_bucketed("lat_bucketed", shard_buckets=32, cache=True)
        wand_topk(spark, index, q0, index.globs, 10).collect()  # warm
        p_bkt = p50(lambda: wand_topk(spark, index, q0, index.globs, 10).collect())

        batch = {}
        for i in range(20):
            pos, neg = QUERIES[i % len(QUERIES)]
            batch[f"q{i}"] = resolve_query_terms(vmap, pos, neg)
        wand_topk_many(spark, index, batch, index.globs, 10).collect()  # warm
        t0 = time.time()
        n_runs = 3
        for _ in range(n_runs):
            rows = wand_topk_many(spark, index, batch, index.globs, 10).collect()
        t_batch = (time.time() - t0) / n_runs
        per_query_batched = t_batch / len(batch)

        print(json.dumps({
            "n_docs": N_DOCS,
            "docs_per_shard": DPS,
            "build_sec": round(t_build, 1),
            "docs_per_sec": round(N_DOCS / t_build, 0),
            "p50_directory_cached": p_dir,
            "p50_bucketed_cached": p_bkt,
            "batch20_one_job_sec": round(t_batch, 3),
            "batch_per_query_sec": round(per_query_batched, 4),
            "batch_rows": len(rows),
        }))
        spark.sql("DROP TABLE IF EXISTS lat_bucketed")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
