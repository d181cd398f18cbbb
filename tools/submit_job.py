"""spark-submit entry point (north rule: "ships as spark-submit
--py-files on a multi-executor cluster").

Package and run:

    (cd /path/to/repo && zip -qr /tmp/top2vec_spark.zip top2vec_spark)
    spark-submit --py-files /tmp/top2vec_spark.zip tools/submit_job.py \
        build --input /data/pages_parquet --index /data/idx
    spark-submit --py-files /tmp/top2vec_spark.zip tools/submit_job.py \
        query --index /data/idx --keywords table spark --neg slow -k 10
    spark-submit --py-files /tmp/top2vec_spark.zip tools/submit_job.py \
        append --input /data/new_pages --index /data/idx --epoch 42

No master/parallelism is set here — the cluster manager supplies it;
the same code runs unchanged on local[N] (tests) and a real cluster.
`build` is checkpoint-resumable: rerunning after a failure reuses
completed stages (resume markers carry an input fingerprint, so a
changed input rebuilds instead of silently serving stale data).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark():
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName("top2vec_spark_job").getOrCreate()


def cmd_build(args) -> None:
    from pyspark.sql import functions as F

    from top2vec_spark.plans.build import IndexBuilder
    from top2vec_spark.operators.tokens import assign_doc_ids, doc_term_counts_packed

    spark = _spark()
    pages = spark.read.parquet(args.input)
    docs = assign_doc_ids(pages)
    if "html" in pages.columns:
        docs = docs.withColumn(
            "text", F.coalesce(F.col("text"), F.decode(F.col("html"), "utf-8"))
        )
    fp_row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(url, text))").alias("h"),
    ).collect()[0]
    t0 = time.time()
    index = IndexBuilder(
        spark,
        args.index,
        docs_per_shard=args.docs_per_shard,
        n_buckets=args.n_buckets,
        input_fingerprint=f"{fp_row['n']}:{fp_row['h']}",
    ).build_from_docs(docs.select("doc_id", "text"), resume=not args.no_resume)
    print(
        json.dumps(
            {
                "op": "build",
                "n_docs": index.globs.n_docs,
                "avgdl": index.globs.avgdl,
                "build_sec": round(time.time() - t0, 1),
                "index": args.index,
            }
        )
    )


def cmd_query(args) -> None:
    from top2vec_spark.operators.bm25 import resolve_query_terms
    from top2vec_spark.operators.wand import wand_topk
    from top2vec_spark.plans.build import PostingsIndex

    spark = _spark()
    index = PostingsIndex.load(spark, args.index)
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in index.vocab.collect()}
    q = resolve_query_terms(vmap, args.keywords, args.neg or [])
    for r in wand_topk(spark, index, q, index.globs, args.k).collect():
        print(json.dumps({"doc_id": r["doc_id"], "score": round(r["score"], 6)}))


def cmd_append(args) -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from top2vec_spark.plans.build import PostingsIndex

    spark = _spark()
    index = PostingsIndex.load(spark, args.index)
    pages = spark.read.parquet(args.input)
    lo = index.epoch_base_doc_id(args.epoch) if args.epoch else index.next_doc_id()
    order_col = "url" if "url" in pages.columns else "text"
    docs = pages.withColumn(
        "doc_id",
        (F.row_number().over(W.orderBy(order_col)) - 1 + F.lit(lo)).cast("long"),
    ).select("doc_id", "text")
    idx2 = index.append_documents(docs, epoch_id=args.epoch)
    print(
        json.dumps(
            {"op": "append", "n_docs": idx2.globs.n_docs, "epoch": args.epoch}
        )
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="submit_job")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--docs-per-shard", type=int, default=131_072)
    b.add_argument("--n-buckets", type=int, default=64)
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--keywords", nargs="+", required=True)
    q.add_argument("--neg", nargs="*", default=[])
    q.add_argument("-k", type=int, default=10)
    q.set_defaults(fn=cmd_query)

    a = sub.add_parser("append")
    a.add_argument("--input", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--epoch", default=None)
    a.set_defaults(fn=cmd_append)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
