"""Scaling study for the positional fulltext family (north rule:
two-cluster-size criterion evidenced at two local[N] levels): over the
SAME deterministic synthetic corpus, at local[LOW] vs local[HIGH]
(fresh JVM subprocess per level), time

  build   — build_position_index: the corpus-scale (term, doc_id)
            groupBy + bucket-partitioned write (ONE Exchange + the
            repartition to bucket dirs)
  phrase  — indexed exact-phrase occurrences + per-doc counts from the
            directory-pruned sidecar read (broadcast join chain)
  span    — min_cover_span over pruned postings (one groupBy(doc_id)
            into the two-pointer Arrow kernel)
  snippet — best_snippet over raw tokens (hit self-join + window rank
            + token join-back; the most join-heavy member)

and report per-stage wall plus

    efficiency = (T_low / T_high) / (cpus_high / cpus_low).

Cross-level result equality is asserted with counts and
bit_xor(xxhash64) checksums over every output row.

Usage: python tools/positional_scaling.py
Env: POSN_N_DOCS (default 400000), POSN_LOW (2), POSN_HIGH (8),
POSN_REPS (2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("POSN_N_DOCS", "400000"))
LOW = int(os.environ.get("POSN_LOW", "2"))
HIGH = int(os.environ.get("POSN_HIGH", "8"))
REPS = int(os.environ.get("POSN_REPS", "2"))

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from top2vec_spark.operators.positional import (
    best_snippet,
    build_position_index,
    load_position_postings,
    min_cover_span,
    phrase_occurrences,
)
from top2vec_spark.operators.tokens import assign_doc_ids, tokenize_docs
from top2vec_spark.session import get_spark
from top2vec_spark.sources.pages import generate_pages

N, CPUS = %(n)d, %(cpus)d
PHRASE = ["wb", "wc"]
SPAN_TERMS = ["wm", "wn", "wo"]
SNIP_TERMS = ["wb", "wh"]

spark = get_spark(parallelism=CPUS, app_name=f"positional_scale_{CPUS}")
pages = assign_doc_ids(generate_pages(spark, N)).withColumn(
    "text", F.decode("html", "utf-8")
)
# JVM tokenizer: tokenize cost is not the subject of this study and
# sits OUTSIDE the timed sections; both levels use the identical path
tokens = tokenize_docs(pages, ascii_fast_path=True).persist()
tokens.count()  # materialize OUTSIDE the timed sections
idx_dir = tempfile.mkdtemp(prefix="posidx_scale_")

t0 = time.time()
build_position_index(tokens, idx_dir, n_buckets=64)
t_build = time.time() - t0

t0 = time.time()
pruned = load_position_postings(spark, idx_dir, PHRASE)
occ = phrase_occurrences(pruned, PHRASE)
pagg = occ.agg(
    F.count(F.lit(1)).alias("n_occ"),
    F.bit_xor(F.xxhash64("doc_id", "start")).alias("chk"),
).first()
t_phrase = time.time() - t0

t0 = time.time()
spans = min_cover_span(
    load_position_postings(spark, idx_dir, SPAN_TERMS), SPAN_TERMS
)
sagg = spans.agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.bit_xor(F.xxhash64("doc_id", "span")).alias("chk"),
).first()
t_span = time.time() - t0

t0 = time.time()
snip = best_snippet(tokens, SNIP_TERMS, width=8)
nagg = snip.agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.bit_xor(F.xxhash64("doc_id", "start", "hits", "snippet")).alias("chk"),
).first()
t_snip = time.time() - t0

wall = t_build + t_phrase + t_span + t_snip
print(json.dumps({
    "cpus": CPUS, "n": N,
    "build_sec": round(t_build, 2), "phrase_sec": round(t_phrase, 2),
    "span_sec": round(t_span, 2), "snippet_sec": round(t_snip, 2),
    "wall_sec": round(wall, 2),
    "docs_per_sec": round(N / wall, 1),
    "phrase_n": pagg["n_occ"], "phrase_chk": pagg["chk"],
    "span_n": sagg["n_docs"], "span_chk": sagg["chk"],
    "snip_n": nagg["n_docs"], "snip_chk": nagg["chk"],
}))
shutil.rmtree(idx_dir, ignore_errors=True)
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
    stage_best = {}
    for rep in range(REPS):
        # order-alternate so a drifting co-tenant load cannot
        # systematically favor one level
        first, second = (LOW, HIGH) if rep % 2 == 0 else (HIGH, LOW)
        a = run(first)
        b = run(second)
        lo, hi = (a, b) if first == LOW else (b, a)
        for k in (
            "phrase_n", "phrase_chk", "span_n", "span_chk",
            "snip_n", "snip_chk",
        ):
            assert lo[k] == hi[k], f"{k} differs across parallelism: {lo[k]} vs {hi[k]}"
        eff = (lo["wall_sec"] / hi["wall_sec"]) / (HIGH / LOW)
        row = {"rep": rep, "low": lo, "high": hi, "efficiency": round(eff, 3)}
        for st in ("build", "phrase", "span", "snippet"):
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


if __name__ == "__main__":
    main()