"""Compaction scale study: a realistically FRAGMENTED index (base
build + many streaming-append epochs + deletes) vs compact_index vs a
full rebuild over the survivors.

What it evidences (BENCH/COMPACT_r5.md):
  1. compact cost vs full-rebuild cost — compaction reads the stored
     packed tf instead of re-reading + re-tokenizing raw text, so the
     text-scan share of the rebuild disappears;
  2. serving effect of fragmentation — BM25/WAND p50 over a
     many-epoch postings layout (one parquet dir per append epoch per
     bucket) vs the single-epoch compacted layout;
  3. correctness at scale — post-compact globals equal the fresh
     rebuild's, tombstones gone, single epoch.

Usage: python tools/compact_bench.py [n_docs] [n_appends] [cpus]
Defaults: 400_000 docs, 16 append epochs, 32 cpus. One JSON line at
the end; human-readable timings as it goes.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from top2vec_spark.operators.bm25 import resolve_query_terms
from top2vec_spark.operators.wand import wand_topk
from top2vec_spark.plans.build import IndexBuilder, PostingsIndex
from top2vec_spark.session import get_spark
from top2vec_spark.sources.pages import generate_pages

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
N_APPENDS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
DPS = 49_152  # the serving-favoring shard size (BENCH/LATENCY_FLOOR_r5.md)
QUERIES = [["wa", "wb"], ["wc"], ["wb", "wd", "we"], ["wf"], ["wa", "wh"]]


def p50_queries(spark, idx, reps=3):
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in idx.vocab.collect()}
    times = []
    for _ in range(reps):
        for pos in QUERIES:
            q = resolve_query_terms(vmap, pos, [])
            t0 = time.time()
            wand_topk(spark, idx, q, idx.globs, 10).collect()
            times.append(time.time() - t0)
    return statistics.median(times)


def main() -> None:
    spark = get_spark(parallelism=CPUS, app_name="compact_bench")
    work = f"/tmp/compact_bench_{N_DOCS}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    t = {}

    base_n = N_DOCS // 2
    app_n = (N_DOCS - base_n) // N_APPENDS
    print(f"corpus: {base_n} base + {N_APPENDS} x {app_n} appended, local[{CPUS}]")

    from top2vec_spark.operators.tokens import assign_doc_ids

    pages = generate_pages(spark, N_DOCS).withColumn(
        "text", F.decode("html", "utf-8")
    )
    docs = (
        assign_doc_ids(pages.select("url", "text"))
        .select("doc_id", "text")
        .repartition(CPUS * 2)
        .persist()
    )
    docs.count()

    base = docs.filter(F.col("doc_id") < base_n)
    t0 = time.time()
    idx = IndexBuilder(
        spark, f"{work}/idx", docs_per_shard=DPS, n_buckets=8
    ).build_from_docs(base, resume=False)
    t["base_build_sec"] = round(time.time() - t0, 2)
    print(f"base build ({base_n}): {t['base_build_sec']}s")

    t0 = time.time()
    for a in range(N_APPENDS):
        lo = idx.next_doc_id()
        chunk = (
            docs.filter(
                (F.col("doc_id") >= base_n + a * app_n)
                & (F.col("doc_id") < base_n + (a + 1) * app_n)
            )
            .withColumn(
                "doc_id",
                (F.col("doc_id") - (base_n + a * app_n) + F.lit(lo)).cast(
                    "long"
                ),
            )
        )
        idx = idx.append_documents(chunk, epoch_id=f"bench_ep{a}")
    t["appends_sec_total"] = round(time.time() - t0, 2)
    print(f"{N_APPENDS} appends: {t['appends_sec_total']}s")

    # delete 2% of the corpus, spread across base + appended ranges
    hi = idx.next_doc_id()
    victims = list(range(0, hi, 50))
    t0 = time.time()
    idx = idx.delete_documents(victims)
    t["delete_sec"] = round(time.time() - t0, 2)

    n_epochs = len(
        [d for d in os.listdir(f"{work}/idx/postings/bucket=0") if d.startswith("epoch=")]
    )
    t["epochs_before"] = n_epochs
    t["p50_fragmented_sec"] = round(p50_queries(spark, idx), 4)
    print(
        f"fragmented: {n_epochs} epochs/bucket, p50 {t['p50_fragmented_sec']}s"
    )

    t0 = time.time()
    cidx = idx.compact()
    t["compact_sec"] = round(time.time() - t0, 2)
    t["compact_stages"] = stage_breakdown(f"{work}/idx", t0)
    t["p50_compacted_sec"] = round(p50_queries(spark, cidx), 4)
    print(
        f"compact: {t['compact_sec']}s {t['compact_stages']}, "
        f"p50 after {t['p50_compacted_sec']}s"
    )

    # full rebuild oracle: re-tokenize the surviving docs
    surv_docs = docs_with_appended_ids(
        spark, docs, base_n, app_n, N_APPENDS, DPS, victims
    )
    t0 = time.time()
    fresh = IndexBuilder(
        spark, f"{work}/fresh", docs_per_shard=DPS, n_buckets=8
    ).build_from_docs(surv_docs, resume=False)
    t["full_rebuild_sec"] = round(time.time() - t0, 2)
    t["rebuild_stages"] = stage_breakdown(f"{work}/fresh", t0)
    print(
        f"full rebuild over survivors: {t['full_rebuild_sec']}s "
        f"{t['rebuild_stages']}"
    )

    assert fresh.globs == cidx.globs, (fresh.globs, cidx.globs)
    t["globals_match"] = True
    t["speedup_vs_rebuild"] = round(
        t["full_rebuild_sec"] / t["compact_sec"], 2
    )
    t["n_docs"] = N_DOCS
    t["cpus"] = CPUS
    print(json.dumps(t))
    shutil.rmtree(work, ignore_errors=True)


def stage_breakdown(idx_path: str, start_ts: float) -> dict:
    """Per-stage wall seconds from the builder's marker timestamps
    (each stage writes completed_at after its table lands): stage N's
    duration = its completed_at minus the previous stage's (the first
    stage diffs against the build start)."""
    import glob

    marks = []
    for m in glob.glob(f"{idx_path}/_stages/*.json"):
        with open(m) as f:
            j = json.load(f)
        marks.append((j["completed_at"], j["stage"]))
    marks.sort()
    out, prev = {}, start_ts
    for ts, stage in marks:
        out[stage] = round(ts - prev, 2)
        prev = ts
    return out


def docs_with_appended_ids(spark, docs, base_n, app_n, n_appends, dps, victims):
    """Reconstruct the corpus under the POST-APPEND doc_id space (each
    append re-bases its chunk at the next shard boundary), minus the
    victims — the exact surviving corpus the compacted index holds."""
    parts = [docs.filter(F.col("doc_id") < base_n)]
    next_id = ((base_n + dps - 1) // dps) * dps
    for a in range(n_appends):
        lo, hi = base_n + a * app_n, base_n + (a + 1) * app_n
        parts.append(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .withColumn(
                "doc_id", (F.col("doc_id") - lo + F.lit(next_id)).cast("long")
            )
        )
        next_id = ((next_id + app_n + dps - 1) // dps) * dps
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    vdf = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    return out.join(F.broadcast(vdf), "doc_id", "left_anti")


if __name__ == "__main__":
    main()
