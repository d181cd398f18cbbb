"""Scaling study for the export-tail operators (north rule:
two-cluster-size criterion evidenced at two local[N] levels): run
sequence packing, the per-sequence array fold, and the deterministic
corpus split over the SAME deterministic corpus at local[LOW] and
local[HIGH] (fresh JVM subprocess each) and report per-stage wall +
efficiency

    efficiency = (T_low / T_high) / (cpus_high / cpus_low)

Stage inventory and why each should scale:
  pack  — two-phase prefix sum over O(docs) lengths (tiny) + ONE
          corpus-sized doc_id hash join + codegen arithmetic; the
          join dominates and is embarrassingly partition-parallel
  fold  — one map-side-combined groupBy(seq_id) collect_list over
          exactly-seq_len groups (skew-impossible)
  split — one codegen projection + a 3-group count (near-fixed cost;
          included to show it never becomes a bottleneck)

Cross-level RESULT EQUALITY is asserted (total slots, sequence count,
bit_xor(xxhash64(slot)) layout checksum, per-split counts) — the
two-phase scan must place every token identically at any parallelism.

Usage: python tools/packing_scaling.py
Env: PACK_N_DOCS (default 400000), PACK_SEQ_LEN (2048), PACK_LOW (2),
PACK_HIGH (8), PACK_REPS (2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("PACK_N_DOCS", "400000"))
SEQ_LEN = int(os.environ.get("PACK_SEQ_LEN", "2048"))
LOW = int(os.environ.get("PACK_LOW", "2"))
HIGH = int(os.environ.get("PACK_HIGH", "8"))
REPS = int(os.environ.get("PACK_REPS", "2"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark import StorageLevel
from pyspark.sql import functions as F
from top2vec_spark.functions.tokenizer import sql_tokens_expr
from top2vec_spark.operators.packing import (
    pack_sequences, packed_sequence_arrays,
)
from top2vec_spark.operators.sampling import split_corpus
from top2vec_spark.operators.tokens import assign_doc_ids
from top2vec_spark.session import get_spark
from top2vec_spark.sources.pages import generate_pages

N, CPUS, SEQ_LEN = %(n)d, %(cpus)d, %(seq_len)d
spark = get_spark(parallelism=CPUS, app_name=f"pack_scale_{CPUS}")
pages = assign_doc_ids(generate_pages(spark, N)).withColumn(
    "text", F.decode("html", "utf-8")
)
toks = pages.select(
    "doc_id", F.posexplode(sql_tokens_expr("text")).alias("pos", "term")
).persist(StorageLevel.MEMORY_AND_DISK)
n_tokens = toks.count()  # materialize OUTSIDE the timed sections

t0 = time.time()
packed = pack_sequences(toks, seq_len=SEQ_LEN).persist(
    StorageLevel.MEMORY_AND_DISK
)
n_slots = packed.count()
t_pack = time.time() - t0

checksum = packed.agg(
    F.expr("bit_xor(xxhash64(seq_id, pos, doc_id, term))").alias("c")
).collect()[0]["c"]

t0 = time.time()
n_seqs = packed_sequence_arrays(packed).count()
t_fold = time.time() - t0

t0 = time.time()
splits = {
    r["split"]: r["count"]
    for r in split_corpus(pages).groupBy("split").count().collect()
}
t_split = time.time() - t0

wall = t_pack + t_fold + t_split
print(json.dumps({
    "cpus": CPUS, "n": N, "seq_len": SEQ_LEN, "n_tokens": n_tokens,
    "pack_sec": round(t_pack, 2), "fold_sec": round(t_fold, 2),
    "split_sec": round(t_split, 2), "wall_sec": round(wall, 2),
    "slots_per_sec": round(n_slots / wall, 1),
    "n_slots": n_slots, "n_seqs": n_seqs, "checksum": checksum,
    "splits": splits,
}))
spark.stop()
"""


def run(cpus: int) -> dict:
    code = CHILD % {"repo": REPO, "n": N, "cpus": cpus, "seq_len": SEQ_LEN}
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
    results = {"n_docs": N, "seq_len": SEQ_LEN, "low": LOW, "high": HIGH,
               "reps": []}
    best = None
    for rep in range(REPS):
        lo = run(LOW)
        hi = run(HIGH)
        for k in ("n_slots", "n_seqs", "checksum", "splits", "n_tokens"):
            assert lo[k] == hi[k], (
                f"{k} differs across parallelism: {lo[k]} vs {hi[k]}"
            )
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
