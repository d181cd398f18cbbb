"""Two-cluster-size scaling study (driver instruction / BASELINE.md):
the same index build + query job on the same input at local[8] and
local[32], each in its own JVM subprocess. Writes BENCH/BASELINE.md
with throughput at both parallelism levels and the scaling efficiency

    efficiency = (T_low / T_high) / (cpus_high / cpus_low)

(= 1.0 for perfect linear scaling; north rule target >= 0.8).
Honest-methodology note: both runs share one machine's memory
bandwidth, so this is the sandbox proxy for N -> 4N executors.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "50000"))
LOW = int(os.environ.get("SCALING_LOW", "8"))
HIGH = int(os.environ.get("SCALING_HIGH", "32"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_input(path: str) -> None:
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.session import get_spark
    from top2vec_spark.sources.pages import generate_pages

    spark = get_spark(parallelism=HIGH, app_name="scaling_gen")
    pages = generate_pages(spark, N_DOCS)
    docs = assign_doc_ids(pages).select("doc_id", "url", "text")
    docs.write.mode("overwrite").parquet(path)
    spark.stop()


def run(cpus: int, input_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, f"{REPO}/tools/scaling_job.py", input_path, str(cpus)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="scaling_input_", dir=scratch)
    input_path = f"{workdir}/pages_docs.parquet"
    print(f"generating {N_DOCS} synthetic pages...", file=sys.stderr)
    gen_input(input_path)

    reps = int(os.environ.get("SCALING_REPS", "3"))
    runs: dict[int, list] = {LOW: [], HIGH: []}
    for i in range(reps):
        # alternate order per rep so host co-tenant noise (identical
        # runs vary up to 2x on this VM) doesn't bias one level
        order = (LOW, HIGH) if i % 2 == 0 else (HIGH, LOW)
        for cpus in order:
            print(f"rep {i + 1}/{reps} local[{cpus}]...", file=sys.stderr)
            r = run(cpus, input_path)
            runs[cpus].append(r)
            print(r, file=sys.stderr)

    # per-rep efficiency + best pair (min time at each level: the
    # least-noise-contaminated estimate on a shared box)
    per_rep_eff = [
        round(
            (runs[LOW][i]["build_sec"] / runs[HIGH][i]["build_sec"]) / (HIGH / LOW),
            3,
        )
        for i in range(reps)
    ]
    t_low = min(r["build_sec"] for r in runs[LOW])
    t_high = min(r["build_sec"] for r in runs[HIGH])
    results = {
        LOW: min(runs[LOW], key=lambda r: r["build_sec"]),
        HIGH: min(runs[HIGH], key=lambda r: r["build_sec"]),
    }
    speedup = t_low / t_high
    efficiency = speedup / (HIGH / LOW)

    def stage_rows() -> str:
        st_low = results[LOW].get("stages", {})
        st_high = results[HIGH].get("stages", {})
        lines = ["", "Per-stage seconds (best run each level):", "",
                 f"| stage | local[{LOW}] | local[{HIGH}] | speedup |",
                 "|---|---|---|---|"]
        for st in ("tf", "vocab", "doc_stats", "globals", "postings", "manifest"):
            a, b = st_low.get(st), st_high.get(st)
            if a is None or b is None or b == 0:
                continue
            lines.append(f"| {st} | {a} | {b} | {a / b:.2f}x |")
        return "\n".join(lines)
    report = f"""# BENCH/BASELINE — measured numbers

Generated {datetime.datetime.now(datetime.timezone.utc).isoformat()} by
`python tools/scaling_bench.py` (methodology: BASELINE.md — sandbox
two-cluster-size proxy, same job + same input at local[{LOW}] and
local[{HIGH}] in separate JVMs on one machine; shared memory bandwidth
understates true multi-node scaling).

## Index build (full path: unicode pandas-UDF tokenize -> stats ->
compressed postings + manifest), {N_DOCS} synthetic Common-Crawl-style
pages (FIXTURES.md §1)

| parallelism | build sec (best of {reps}) | docs/sec | query p50 (BM25 top-10, WAND) |
|---|---|---|---|
| local[{LOW}]  | {t_low} | {results[LOW]["docs_per_sec"]} | {results[LOW]["query_p50_sec"]}s |
| local[{HIGH}] | {t_high} | {results[HIGH]["docs_per_sec"]} | {results[HIGH]["query_p50_sec"]}s |

- speedup {LOW}->{HIGH} cores: **{speedup:.2f}x** (ideal {HIGH//LOW}.0x)
- scaling efficiency (best pair): **{efficiency:.3f}** (north-rule target >= 0.8)
- per-repetition efficiency (order-alternated): {per_rep_eff}
{stage_rows()}

All repetitions (build sec): local[{LOW}] {[r["build_sec"] for r in runs[LOW]]},
local[{HIGH}] {[r["build_sec"] for r in runs[HIGH]]}.

Raw JSON (best runs):

```json
{json.dumps(results, indent=2)}
```
"""
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    out_path = os.environ.get("SCALING_OUT", f"{REPO}/BENCH/BASELINE.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
