"""Scaling study for the round-5 query-language additions (north
rule: two-cluster-size criterion evidenced at two local[N] levels):
over the SAME deterministic synthetic corpus, at local[LOW] vs
local[HIGH] (fresh JVM subprocess per level), time

  span_near — span_near_tf (sloppy-phrase kernel): term-filtered scan
              + window-bucket equi-join + two-level agg (count
              DISTINCT tid per start, then tf per doc)
  slop_q    — the full mixed executor on '"wb wc"~2 wd': span-near
              pseudo-term + a bag-of-words term, unioned, summed,
              top-10 (TakeOrderedAndProject)
  facet     — facet shape: full match set of 'wb wd' (range-filtered
              on synthetic metadata) joined to metadata and bucketed
              (ES terms-aggregation)

and report per-stage wall plus

    efficiency = (T_low / T_high) / (cpus_high / cpus_low).

Cross-level result equality is asserted with counts and
bit_xor(xxhash64) checksums over every output row.

Usage: python tools/querylang_scaling.py
Env: QL_N_DOCS (default 400000), QL_LOW (2), QL_HIGH (8), QL_REPS (2),
QL_OUT (markdown report path, default BENCH/QUERYLANG_SCALING_r5.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("QL_N_DOCS", "400000"))
LOW = int(os.environ.get("QL_LOW", "2"))
HIGH = int(os.environ.get("QL_HIGH", "8"))
REPS = int(os.environ.get("QL_REPS", "2"))
OUT = os.environ.get("QL_OUT", "BENCH/QUERYLANG_SCALING_r5.md")

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from top2vec_spark.functions.querylang import parse_query
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats, build_vocab, compute_globals,
)
from top2vec_spark.operators.positional import (
    mixed_query_scores, mixed_query_topk, span_near_tf,
)
from top2vec_spark.operators.tokens import assign_doc_ids, tokenize_docs
from top2vec_spark.session import get_spark
from top2vec_spark.sources.pages import generate_pages

N, CPUS = %(n)d, %(cpus)d

spark = get_spark(parallelism=CPUS, app_name=f"querylang_scale_{CPUS}")
pages = assign_doc_ids(generate_pages(spark, N)).withColumn(
    "text", F.decode("html", "utf-8")
)
# synthetic metadata columns (deterministic from doc_id/text):
# lang in l0..l6, n_chars = rendered length
meta = pages.select(
    "doc_id",
    F.concat(F.lit("l"), (F.col("doc_id") %% 7).cast("string")).alias("lang"),
    F.length("text").alias("n_chars"),
).persist()
meta.count()
tokens = tokenize_docs(pages, ascii_fast_path=True).persist()
tokens.count()  # materialize OUTSIDE the timed sections
ds = build_doc_stats(tokens).persist()
ds.count()
g = compute_globals(ds)
vocab = build_vocab(tokens).persist()
vocab.count()

t0 = time.time()
near = span_near_tf(tokens, ["wb", "wc"], 2)
nagg = near.agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.bit_xor(F.xxhash64("doc_id", "tf")).alias("chk"),
).first()
t_near = time.time() - t0

t0 = time.time()
top = mixed_query_topk(
    spark, tokens, ds, g, vocab, parse_query('"wb wc"~2 wd'), 10
)
rows = top.collect()
t_slop = time.time() - t0
slop_chk = hash(tuple((r["doc_id"], round(r["score"], 9)) for r in rows)) & 0xFFFFFFFF

t0 = time.time()
scored = mixed_query_scores(
    spark, tokens, ds, g, vocab,
    parse_query("wb wd lang:[l1 TO l4]"), doc_meta=meta,
)
facets = (
    scored.join(meta.select("doc_id", "lang"), "doc_id")
    .groupBy(F.col("lang").alias("key"))
    .agg(F.count(F.lit(1)).alias("doc_count"))
)
fagg = facets.agg(
    F.count(F.lit(1)).alias("n_keys"),
    F.bit_xor(F.xxhash64("key", "doc_count")).alias("chk"),
).first()
t_facet = time.time() - t0

wall = t_near + t_slop + t_facet
print(json.dumps({
    "cpus": CPUS, "n": N,
    "span_near_sec": round(t_near, 2), "slop_q_sec": round(t_slop, 2),
    "facet_sec": round(t_facet, 2), "wall_sec": round(wall, 2),
    "docs_per_sec": round(N / wall, 1),
    "near_n": nagg["n_docs"], "near_chk": nagg["chk"],
    "slop_chk": slop_chk,
    "facet_n": fagg["n_keys"], "facet_chk": fagg["chk"],
}))
spark.stop()
"""


def run(cpus: int) -> dict:
    code = CHILD % {"repo": REPO, "n": N, "cpus": cpus}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=5400,
        cwd=REPO,
        env={**os.environ, "PYTHONHASHSEED": "0"},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"child at local[{cpus}] produced no result")
    return json.loads(lines[-1])


def main() -> None:
    results = {"n_docs": N, "low": LOW, "high": HIGH, "reps": []}
    best = None
    stage_best = {}
    for rep in range(REPS):
        # order-alternate so a drifting co-tenant load cannot
        # systematically favor one level
        first, second = (LOW, HIGH) if rep % 2 == 0 else (HIGH, LOW)
        a = run(first)
        b = run(second)
        lo, hi = (a, b) if first == LOW else (b, a)
        for k in ("near_n", "near_chk", "slop_chk", "facet_n", "facet_chk"):
            assert lo[k] == hi[k], (
                f"{k} differs across parallelism: {lo[k]} vs {hi[k]}"
            )
        eff = (lo["wall_sec"] / hi["wall_sec"]) / (HIGH / LOW)
        row = {"rep": rep, "low": lo, "high": hi, "efficiency": round(eff, 3)}
        for st in ("span_near", "slop_q", "facet"):
            se = (lo[f"{st}_sec"] / hi[f"{st}_sec"]) / (HIGH / LOW)
            row[f"eff_{st}"] = round(se, 3)
            stage_best[st] = max(stage_best.get(st, 0.0), se)
        results["reps"].append(row)
        print(json.dumps(row), flush=True)
        if best is None or eff > best:
            best = eff
    results["best_efficiency"] = round(best, 3)
    results["stage_best"] = {k: round(v, 3) for k, v in stage_best.items()}
    print(json.dumps(results))
    with open(os.path.join(REPO, OUT), "a") as f:
        f.write(
            f"\n## querylang scaling {N} docs local[{LOW}] vs "
            f"local[{HIGH}] ({REPS} reps, order-alternated)\n\n```json\n"
            + json.dumps(results, indent=1)
            + "\n```\n"
        )


if __name__ == "__main__":
    main()
