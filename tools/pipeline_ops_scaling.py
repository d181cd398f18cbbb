"""Scaling study for the session-5 pipeline operators (north rule:
two-cluster-size criterion evidenced at two local[N] levels): run
connected components, bigram-LM scoring, and the domain quota over
the SAME deterministic 400k-page corpus at local[LOW] and local[HIGH]
(fresh JVM subprocess each) and report per-stage wall + efficiency

    efficiency = (T_low / T_high) / (cpus_high / cpus_low)

Stage inventory and why each should scale:
  cc     — alternating large-star/small-star rounds over an O(n) edge
           set (chains + long-range links derived from doc ids, the
           driver row's topology at 800x the size); driver tail
           DISABLED (cap=0) so every round is distributed
  lm     — two hash-agg counts + distinct-bigram join + per-doc agg
  quota  — two window passes (salted then final) over per-host quality

Usage: python tools/pipeline_ops_scaling.py
Env: PIPE_N_DOCS (default 400000), PIPE_LOW (2), PIPE_HIGH (8),
PIPE_REPS (2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("PIPE_N_DOCS", "400000"))
LOW = int(os.environ.get("PIPE_LOW", "2"))
HIGH = int(os.environ.get("PIPE_HIGH", "8"))
REPS = int(os.environ.get("PIPE_REPS", "2"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from top2vec_spark.functions.tokenizer import sql_tokens_expr
from top2vec_spark.operators.graph import connected_components
from top2vec_spark.operators.lm import bigram_lm_scores
from top2vec_spark.operators.ranking import domain_quota
from top2vec_spark.operators.tokens import assign_doc_ids
from top2vec_spark.session import get_spark
from top2vec_spark.sources.pages import generate_pages

N, CPUS = %(n)d, %(cpus)d
spark = get_spark(parallelism=CPUS, app_name=f"pipe_scale_{CPUS}")
pages = assign_doc_ids(generate_pages(spark, N)).withColumn(
    "text", F.decode("html", "utf-8")
).persist()
pages.count()  # materialize OUTSIDE the timed sections

d = pages.select("doc_id")
chain = d.filter((F.col("doc_id") %% 10) != 9).select(
    F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
)
longr = d.filter((F.col("doc_id") %% 40) == 0).select(
    F.col("doc_id").alias("doc_a"),
    F.floor(F.col("doc_id") / 2).cast("long").alias("doc_b"),
)
edges = chain.unionByName(longr)

t0 = time.time()
cc = connected_components(edges, driver_edge_cap=0)
n_comp = cc.select("component").distinct().count()
t_cc = time.time() - t0

toks = pages.select("doc_id", sql_tokens_expr("text").alias("tokens"))
t0 = time.time()
lm = bigram_lm_scores(toks, k=0.5)
n_lm = lm.filter(F.col("perplexity").isNotNull()).count()
t_lm = time.time() - t0

t0 = time.time()
kept = domain_quota(pages, per_host=1000)
n_kept = kept.count()
t_quota = time.time() - t0

wall = t_cc + t_lm + t_quota
print(json.dumps({
    "cpus": CPUS, "n": N,
    "cc_sec": round(t_cc, 2), "lm_sec": round(t_lm, 2),
    "quota_sec": round(t_quota, 2), "wall_sec": round(wall, 2),
    "docs_per_sec": round(N / wall, 1),
    "n_components": n_comp, "n_lm_scored": n_lm, "n_quota_kept": n_kept,
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
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"child at local[{cpus}] produced no result")
    return json.loads(lines[-1])


def main() -> None:
    results = {"n_docs": N, "low": LOW, "high": HIGH, "reps": []}
    best = None
    for rep in range(REPS):
        lo = run(LOW)
        hi = run(HIGH)
        for k in ("n_components", "n_lm_scored", "n_quota_kept"):
            assert lo[k] == hi[k], f"{k} differs across parallelism: {lo[k]} vs {hi[k]}"
        eff = (lo["wall_sec"] / hi["wall_sec"]) / (HIGH / LOW)
        row = {"rep": rep, "low": lo, "high": hi, "efficiency": round(eff, 3)}
        results["reps"].append(row)
        print(json.dumps(row), flush=True)
        if best is None or eff > best:
            best = eff
    results["best_efficiency"] = round(best, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
