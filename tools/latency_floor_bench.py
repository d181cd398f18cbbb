"""Single-query latency-floor breakdown at 1.6M docs (round-4 verdict
item 7): bucketed+cached serving p50 has a ~1 s floor — decompose it
into (a) bare Spark job-scheduling floor, (b) JVM scan+filter of the
cached bucketed table, (c) the groupBy→applyInPandas Python/Arrow
round-trip with an identity kernel, (d) in-kernel WAND time measured
inside the real kernel, (e) the full wand_topk p50. Whatever (e)-(d)
leaves over (a)-(c) is engine overhead a change could remove; what sits
in (a)-(c) is Spark's own serving floor (then the batched contract
stands as the answer, wand_topk_many amortizes exactly these).

Writes one JSON line; run in a quiet window (pair with tools/cpu_probe).

Usage: python tools/latency_floor_bench.py [N_DOCS] [out.json]
"""
from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from top2vec_spark.operators.bm25 import resolve_query_terms
from top2vec_spark.operators.wand import (
    make_shard_kernel,
    tomb_fingerprint,
    wand_topk,
    wand_topk_many,
)
from top2vec_spark.plans.build import IndexBuilder
from top2vec_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/latency_floor_r5.json"
DPS = int(os.environ.get("LAT_DOCS_PER_SHARD", "131072"))
REPS = 9


def p50(fn, reps=REPS):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 4), [round(x, 4) for x in xs]


def main():
    spark = get_spark(parallelism=32, app_name="latency_floor")
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.sources.pages import generate_pages

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="latfloor_", dir=scratch)
    out = {"n_docs": N_DOCS, "docs_per_shard": DPS, "reps": REPS}
    try:
        docs = assign_doc_ids(generate_pages(spark, N_DOCS)).select(
            "doc_id", "url", "text"
        )
        t0 = time.perf_counter()
        index = IndexBuilder(
            spark, f"{work}/idx", docs_per_shard=DPS, n_buckets=64
        ).build_from_docs(docs, resume=False)
        out["build_sec"] = round(time.perf_counter() - t0, 1)

        vmap = {r["term"]: (r["term_id"], r["df"]) for r in index.vocab.collect()}
        q0 = resolve_query_terms(vmap, ["wa", "wb"], [])
        index.register_bucketed("latfloor_bucketed", shard_buckets=32, cache=True)

        globs = index.globs
        qinfo = {
            int(tid): (
                float(sign),
                math.log(1.0 + (globs.n_docs - df + 0.5) / (df + 0.5)),
            )
            for _, tid, df, sign in q0
        }
        term_ids = sorted(qinfo)
        buckets = sorted({t % index.n_buckets for t in term_ids})
        src = spark.table(index.bucketed_table)
        blocks = src.filter(
            F.col("bucket").isin(buckets) & F.col("term_id").isin(term_ids)
        )
        blocks.count()  # warm the cache + catalog

        # (a) bare scheduler floor: trivial 32-task JVM-only job
        trivial = spark.range(0, 32, 1, 32)
        trivial.count()
        out["a_sched_floor_32task"], out["a_runs"] = p50(lambda: trivial.count())

        # (b) JVM-only scan+filter of the cached bucketed table
        out["b_scan_filter_count"], out["b_runs"] = p50(lambda: blocks.count())
        out["n_block_rows"] = blocks.count()

        # (c) identity pandas kernel over the same groupBy (Python
        # worker dispatch + Arrow both ways, zero kernel work)
        def ident(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"doc_id": [0], "score": [float(len(pdf))]})

        ident_df = blocks.groupBy("shard").applyInPandas(
            ident, "doc_id long, score double"
        )
        ident_df.collect()
        out["c_identity_kernel"], out["c_runs"] = p50(lambda: ident_df.collect())

        # (d) in-kernel WAND time, measured inside the real kernel
        kernel = make_shard_kernel(
            qinfo, 10, 1.2, 0.75, globs.avgdl, frozenset(),
            index.doc_stats_path,
            fresh_stats=getattr(index, "stats_fresh", True),
            build_id=getattr(index, "build_id", ""),
            tomb_path=getattr(index, "tombstones_path", None),
            tomb_version=tomb_fingerprint(getattr(index, "tombstones_path", None)),
        )

        def timed_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0]) if len(pdf) else -1
            t0 = time.perf_counter()
            res = kernel(pdf)
            res["t_kernel"] = time.perf_counter() - t0
            res["k_shard"] = shard
            return res

        timed_df = blocks.groupBy("shard").applyInPandas(
            timed_kernel, "doc_id long, score double, t_kernel double, k_shard long"
        )
        timed_df.collect()  # warm (side-read caches fill here)

        def in_kernel():
            rows = timed_df.collect()
            ts = {r["k_shard"]: r["t_kernel"] for r in rows}
            return sum(ts.values()), max(ts.values())

        sums, maxs, wall = [], [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            s, m = in_kernel()
            wall.append(time.perf_counter() - t0)
            sums.append(s)
            maxs.append(m)
        out["d_kernel_cpu_sum"] = round(statistics.median(sums), 4)
        out["d_kernel_max_task"] = round(statistics.median(maxs), 4)
        out["d_wall_with_timing"] = round(statistics.median(wall), 4)

        # (e) the real full path
        wand_topk(spark, index, q0, globs, 10).collect()
        out["e_full_wand_p50"], out["e_runs"] = p50(
            lambda: wand_topk(spark, index, q0, globs, 10).collect()
        )

        # (f) batched 20-query amortization for comparison
        batch = {}
        qs = [(["wa", "wb"], []), (["wc"], []), (["wa", "wd"], ["wb"]),
              (["wb", "wc"], []), (["wd"], ["wa"])]
        for i in range(20):
            pos, neg = qs[i % len(qs)]
            batch[f"q{i}"] = resolve_query_terms(vmap, pos, neg)
        wand_topk_many(spark, index, batch, globs, 10).collect()
        t0 = time.perf_counter()
        wand_topk_many(spark, index, batch, globs, 10).collect()
        out["f_batch20_per_query"] = round((time.perf_counter() - t0) / 20, 4)

        out["derived"] = {
            "sched_pct_of_full": round(
                100 * out["a_sched_floor_32task"] / out["e_full_wand_p50"], 1
            ),
            "scan_pct_of_full": round(
                100 * out["b_scan_filter_count"] / out["e_full_wand_p50"], 1
            ),
            "python_arrow_overhead": round(
                out["c_identity_kernel"] - out["b_scan_filter_count"], 4
            ),
            "kernel_share": round(
                out["d_kernel_max_task"] / out["e_full_wand_p50"], 3
            ),
        }
        spark.sql("DROP TABLE IF EXISTS latfloor_bucketed")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
