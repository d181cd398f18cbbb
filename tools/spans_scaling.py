"""Scaling study for the exact-substring (duplicate-span) dedup
operator (north rule: two-cluster-size criterion evidenced at two
local[N] levels): run duplicate_spans and scrub_duplicate_spans over
the SAME deterministic corpus (N synthetic pages + a shifted copy of
every 5th page, the driver row's shape at scale) at local[LOW] and
local[HIGH] (fresh JVM subprocess each) and report per-stage wall +

    efficiency = (T_low / T_high) / (cpus_high / cpus_low)

Stage inventory and why each should scale:
  dup   — JVM token hashing + O(n) rolling-hash Arrow kernel (narrow)
          + ONE (h1,h2) Exchange feeding the occurrence count agg and
          the join-back through a ReusedExchange
  scrub — the same span detection plus an O(marked) groupBy(doc_id)
          + one doc_id join + per-doc interval-union Arrow kernel

Cross-level result equality is asserted by occurrence counts and
bit_xor(xxhash64) checksums over every output row.

Usage: python tools/spans_scaling.py
Env: SPAN_N_DOCS (default 400000), SPAN_W (8), SPAN_LOW (2),
SPAN_HIGH (8), SPAN_REPS (2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPAN_N_DOCS", "400000"))
W = int(os.environ.get("SPAN_W", "8"))
LOW = int(os.environ.get("SPAN_LOW", "2"))
HIGH = int(os.environ.get("SPAN_HIGH", "8"))
REPS = int(os.environ.get("SPAN_REPS", "2"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from top2vec_spark.functions.tokenizer import sql_tokens_expr
from top2vec_spark.operators.spans import duplicate_spans, scrub_duplicate_spans
from top2vec_spark.operators.tokens import assign_doc_ids
from top2vec_spark.session import get_spark
from top2vec_spark.sources.pages import generate_pages

N, W, CPUS = %(n)d, %(w)d, %(cpus)d
spark = get_spark(parallelism=CPUS, app_name=f"spans_scale_{CPUS}")
pages = assign_doc_ids(generate_pages(spark, N)).withColumn(
    "text", F.decode("html", "utf-8")
)
docs = pages.select("doc_id", "text").unionByName(
    pages.filter(F.col("doc_id") %% 5 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
)
ta = docs.select("doc_id", sql_tokens_expr("text").alias("tokens")).persist()
ta.count()  # materialize OUTSIDE the timed sections
# warm the Python workers so worker-fork cost doesn't bill stage 1
duplicate_spans(ta.limit(64), W).count()

t0 = time.time()
spans = duplicate_spans(ta, W)
agg = spans.agg(
    F.count(F.lit(1)).alias("n_occ_rows"),
    F.sum(F.col("is_keeper").cast("long")).alias("n_keepers"),
    F.bit_xor(F.xxhash64("doc_id", "pos", "n_occ", "is_keeper")).alias("chk"),
).first()
t_dup = time.time() - t0

t0 = time.time()
scrubbed = scrub_duplicate_spans(ta, W, keep="first")
sagg = scrubbed.agg(
    F.count(F.lit(1)).alias("n_docs_out"),
    F.sum("n_removed").alias("removed_total"),
    F.bit_xor(
        F.xxhash64("doc_id", F.array_join("tokens", " "), "n_removed")
    ).alias("chk"),
).first()
t_scrub = time.time() - t0

wall = t_dup + t_scrub
print(json.dumps({
    "cpus": CPUS, "n": N, "w": W,
    "dup_sec": round(t_dup, 2), "scrub_sec": round(t_scrub, 2),
    "wall_sec": round(wall, 2),
    "docs_per_sec": round(N * 1.2 / wall, 1),
    "n_occ_rows": agg["n_occ_rows"], "n_keepers": agg["n_keepers"],
    "dup_chk": agg["chk"],
    "n_docs_out": sagg["n_docs_out"],
    "removed_total": int(sagg["removed_total"] or 0),
    "scrub_chk": sagg["chk"],
}))
spark.stop()
"""


def run(cpus: int) -> dict:
    code = CHILD % {"repo": REPO, "n": N, "w": W, "cpus": cpus}
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
    results = {"n_docs": N, "w": W, "low": LOW, "high": HIGH, "reps": []}
    best = None
    for rep in range(REPS):
        # order-alternate so a drifting co-tenant load cannot
        # systematically favor one level
        first, second = (LOW, HIGH) if rep % 2 == 0 else (HIGH, LOW)
        a = run(first)
        b = run(second)
        lo, hi = (a, b) if first == LOW else (b, a)
        for k in (
            "n_occ_rows", "n_keepers", "dup_chk",
            "n_docs_out", "removed_total", "scrub_chk",
        ):
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
