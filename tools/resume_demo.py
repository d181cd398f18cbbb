"""Real-crash checkpoint-resume demonstration at scale (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

The pytest resume suite fabricates crashes by raising inside the
builder; this demo kills the actual PROCESS (SIGKILL — no cleanup, no
atexit) mid-build and proves the file-based stage markers carry the
build across real process death:

1. cold reference build over N_DOCS synthetic pages (subprocess)
2. crash run: an identical build subprocess is SIGKILLed the moment
   ``_stages/<kill_after>.json`` appears on disk
3. resume run: a fresh subprocess with resume=True — every stage
   completed before the kill must be skipped (verified by marker
   mtimes, which must predate the resume process start)
4. parity: the resumed index answers the headline WAND query
   rank- and score-identical to the cold-built index

Writes BENCH/RESUME_r5.md. Child invocation (internal):
    python tools/resume_demo.py child <input_parquet> <index_dir> <resume01>
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("RESUME_N_DOCS", "400000"))
CPUS = int(os.environ.get("RESUME_CPUS", "8"))
KILL_AFTER = os.environ.get("RESUME_KILL_AFTER", "postings")


def child(input_path: str, index_dir: str, resume: bool) -> None:
    from top2vec_spark.plans.build import IndexBuilder
    from top2vec_spark.session import get_spark

    spark = get_spark(parallelism=CPUS, app_name="resume_demo_child")
    docs = spark.read.parquet(input_path).select("doc_id", "text")
    t0 = time.time()
    IndexBuilder(
        spark, index_dir, docs_per_shard=max(4096, N_DOCS // 32)
    ).build_from_docs(docs, resume=resume)
    print(json.dumps({"build_sec": round(time.time() - t0, 3)}))
    spark.stop()


def run_child(input_path: str, index_dir: str, resume: bool,
              kill_marker: str | None = None) -> dict:
    cmd = [
        sys.executable, os.path.abspath(__file__), "child",
        input_path, index_dir, "1" if resume else "0",
    ]
    t0 = time.time()
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    if kill_marker is not None:
        target = f"{index_dir}/_stages/{kill_marker}.json"
        while proc.poll() is None:
            if os.path.exists(target):
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()
                return {
                    "killed": True,
                    "sec_until_kill": round(time.time() - t0, 3),
                }
            time.sleep(0.2)
        raise RuntimeError(
            f"child exited (rc={proc.returncode}) before marker {target}"
        )
    out, _ = proc.communicate(timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}")
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    d["wall_sec"] = round(time.time() - t0, 3)
    return d


def stage_mtimes(index_dir: str) -> dict[str, float]:
    return {
        os.path.basename(p)[:-5]: os.path.getmtime(p)
        for p in glob.glob(f"{index_dir}/_stages/*.json")
    }


def query_rows(input_path: str, index_dir: str) -> list:
    from top2vec_spark.operators.bm25 import resolve_query_terms
    from top2vec_spark.operators.wand import wand_topk
    from top2vec_spark.plans.build import PostingsIndex
    from top2vec_spark.session import get_spark

    spark = get_spark(parallelism=CPUS, app_name="resume_demo_check")
    idx = PostingsIndex.load(spark, index_dir)
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in idx.vocab.collect()}
    # synthetic-pages vocabulary: query the 2 head terms + 1 mid term
    # negative, picked deterministically by (df desc, term)
    by_df = sorted(vmap, key=lambda t: (-vmap[t][1], t))
    q = resolve_query_terms(
        vmap, by_df[:2], [by_df[len(by_df) // 2]]
    )
    rows = [
        (r["doc_id"], round(r["score"], 9))
        for r in wand_topk(spark, idx, q, idx.globs, 10).collect()
    ]
    spark.stop()
    return rows


def main() -> None:
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="resume_demo_", dir=scratch)
    input_path = f"{workdir}/docs.parquet"
    cold_dir = f"{workdir}/idx_cold"
    demo_dir = f"{workdir}/idx_demo"

    print(f"generating {N_DOCS} pages...", file=sys.stderr)
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.session import get_spark
    from top2vec_spark.sources.pages import generate_pages

    from pyspark.sql import functions as F

    spark = get_spark(parallelism=CPUS, app_name="resume_demo_gen")
    pages = generate_pages(spark, N_DOCS)
    assign_doc_ids(pages).withColumn(
        "text", F.decode("html", "utf-8")
    ).select("doc_id", "text").write.mode("overwrite").parquet(input_path)
    spark.stop()

    print("cold build...", file=sys.stderr)
    cold = run_child(input_path, cold_dir, resume=False)

    print(f"crash run (SIGKILL after {KILL_AFTER})...", file=sys.stderr)
    crash = run_child(
        input_path, demo_dir, resume=False, kill_marker=KILL_AFTER
    )
    pre_kill = stage_mtimes(demo_dir)

    print("resume run...", file=sys.stderr)
    resume_start = time.time()
    res = run_child(input_path, demo_dir, resume=True)
    post = stage_mtimes(demo_dir)
    skipped = sorted(
        s for s, m in post.items()
        if s in pre_kill and m < resume_start
    )
    redone = sorted(s for s, m in post.items() if m >= resume_start)

    print("parity check...", file=sys.stderr)
    rows_cold = query_rows(input_path, cold_dir)
    rows_res = query_rows(input_path, demo_dir)
    identical = rows_cold == rows_res

    report = f"""# Real-crash checkpoint-resume demonstration

Generated {datetime.datetime.now(datetime.timezone.utc).isoformat()} by
`python tools/resume_demo.py` — {N_DOCS} synthetic pages, local[{CPUS}].
Unlike the pytest resume suite (which raises inside the builder), this
kills the build PROCESS with SIGKILL the moment the
`_stages/{KILL_AFTER}.json` marker lands, then resumes in a fresh
process.

| run | wall sec |
|---|---|
| cold build (reference) | {cold["build_sec"]} |
| crash run (killed after `{KILL_AFTER}`) | {crash["sec_until_kill"]} |
| resume run | {res["build_sec"]} |

- resume skipped (marker mtime predates the resume process):
  {", ".join(skipped) or "none"}
- resume redid: {", ".join(redone) or "none"}
- resume saved **{round(100 * (1 - res["build_sec"] / cold["build_sec"]))}%**
  of the cold build
- WAND top-10 parity (doc_ids + scores, 9 digits) between the
  cold-built and crash-resumed index: **{"IDENTICAL" if identical else "MISMATCH"}**

The markers carry a build fingerprint (config + input), so a resume
against different input or settings re-runs everything rather than
serving a stale index (plans/build.py:_done).
"""
    out = os.environ.get("RESUME_OUT", f"{REPO}/BENCH/RESUME_r5.md")
    with open(out, "w") as f:
        f.write(report)
    print(report)
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], sys.argv[3], sys.argv[4] == "1")
    else:
        main()
