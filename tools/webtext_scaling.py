"""Two-cluster-size scaling study for the webtext corpus operators
(repetition/quality filter + URL analytics), mirroring
tools/scaling_bench.py's methodology: same job + same input at
local[LOW] and local[HIGH] in separate JVMs, order-alternated reps,
best-pair efficiency. Writes BENCH/SCALING_WEBTEXT_r{N}.md.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "400000"))
LOW = int(os.environ.get("SCALING_LOW", "8"))
HIGH = int(os.environ.get("SCALING_HIGH", "32"))
REPS = int(os.environ.get("SCALING_REPS", "2"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_input(path: str) -> None:
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.session import get_spark
    from top2vec_spark.sources.pages import generate_pages

    spark = get_spark(parallelism=HIGH, app_name="webtext_scaling_gen")
    pages = generate_pages(spark, N_DOCS)
    docs = assign_doc_ids(pages).select("doc_id", "url", "text", "lang")
    docs.write.mode("overwrite").parquet(path)
    spark.stop()


def run(cpus: int, input_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, f"{REPO}/tools/webtext_scaling_job.py", input_path, str(cpus)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"job at local[{cpus}] produced no JSON")
    return json.loads(lines[-1])


def main() -> None:
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="webtext_scaling_", dir=scratch)
    input_path = f"{workdir}/pages_docs.parquet"
    print(f"generating {N_DOCS} synthetic pages...", file=sys.stderr)
    gen_input(input_path)

    runs: dict[int, list] = {LOW: [], HIGH: []}
    for i in range(REPS):
        order = (LOW, HIGH) if i % 2 == 0 else (HIGH, LOW)
        for cpus in order:
            print(f"rep {i + 1}/{REPS} local[{cpus}]...", file=sys.stderr)
            r = run(cpus, input_path)
            runs[cpus].append(r)
            print(r, file=sys.stderr)

    best = {c: min(rs, key=lambda r: r["total_sec"]) for c, rs in runs.items()}
    # sanity: identical answers at both parallelism levels
    for key in ("keep_counts", "pipe_keep_counts", "n_hosts", "n_canon_urls"):
        assert best[LOW][key] == best[HIGH][key], (key, best)
    t_low, t_high = best[LOW]["total_sec"], best[HIGH]["total_sec"]
    speedup = t_low / t_high
    efficiency = speedup / (HIGH / LOW)
    per_rep_eff = [
        round(
            (runs[LOW][i]["total_sec"] / runs[HIGH][i]["total_sec"]) / (HIGH / LOW), 3
        )
        for i in range(REPS)
    ]

    stage_lines = [
        f"| stage | local[{LOW}] | local[{HIGH}] | speedup |",
        "|---|---|---|---|",
    ]
    for st in ("quality_sec", "url_sec", "pipeline_sec", "total_sec"):
        a, b = best[LOW][st], best[HIGH][st]
        stage_lines.append(f"| {st[:-4]} | {a} | {b} | {a / b:.2f}x |")

    report = f"""# Webtext corpus-operator scaling study

Generated {datetime.datetime.now(datetime.timezone.utc).isoformat()} by
`python tools/webtext_scaling.py` (methodology identical to
BENCH/BASELINE.md: same job + same input at local[{LOW}] and
local[{HIGH}], separate JVMs, order-alternated reps, best pair; one
shared machine's memory bandwidth, so a sandbox proxy for N -> 4N
executors).

Job: `corpus_filter` (Gopher-style repetition stats as a
ZERO-SHUFFLE narrow Arrow kernel — one Counter pass per doc — with
the codegen'd alpha-ratio rule carried through as a passthrough
column; no exchange anywhere in the plan) + `domain_stats` host
rollup + `url_dedup` canonical-URL agg + the full `clean_corpus`
hygiene pipeline (exact dedup -> line dedup -> PII scrub -> quality
filter: the corpus-global shuffle path), over {N_DOCS} synthetic
Common-Crawl-style pages. Python workers warmed before timing.

| parallelism | total sec (best of {REPS}) | docs/sec | quality sec | url sec | pipeline sec | pipeline docs/sec |
|---|---|---|---|---|---|---|
| local[{LOW}]  | {t_low} | {best[LOW]["docs_per_sec"]} | {best[LOW]["quality_sec"]} | {best[LOW]["url_sec"]} | {best[LOW]["pipeline_sec"]} | {best[LOW]["pipeline_docs_per_sec"]} |
| local[{HIGH}] | {t_high} | {best[HIGH]["docs_per_sec"]} | {best[HIGH]["quality_sec"]} | {best[HIGH]["url_sec"]} | {best[HIGH]["pipeline_sec"]} | {best[HIGH]["pipeline_docs_per_sec"]} |

- speedup {LOW}->{HIGH} cores: **{speedup:.2f}x** (ideal {HIGH // LOW}.0x)
- scaling efficiency (best pair): **{efficiency:.3f}**
- per-repetition efficiency (order-alternated): {per_rep_eff}
- answers identical at both levels: keep_counts
  {best[LOW]["keep_counts"]}, {best[LOW]["n_hosts"]} hosts,
  {best[LOW]["n_canon_urls"]} canonical urls

{chr(10).join(stage_lines)}

All repetitions (total sec): local[{LOW}] {[r["total_sec"] for r in runs[LOW]]},
local[{HIGH}] {[r["total_sec"] for r in runs[HIGH]]}.
"""
    out_path = os.environ.get("SCALING_OUT", f"{REPO}/BENCH/SCALING_WEBTEXT_r5.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
