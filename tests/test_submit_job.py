"""spark-submit entry point (tools/submit_job.py): build + query +
append subcommands run in-process against the pytest session (the
actual spark-submit --py-files invocation is demonstrated in the
module docstring and was exercised manually; the logic is identical —
_spark() is getOrCreate)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo/tools")


def test_submit_build_query_append(spark, tmp_path, capsys):
    import submit_job

    from top2vec_spark.sources.pages import generate_pages

    src = str(tmp_path / "pages")
    generate_pages(spark, 400).write.mode("overwrite").parquet(src)
    idx = str(tmp_path / "idx")

    submit_job.main(["build", "--input", src, "--index", idx,
                     "--docs-per-shard", "128", "--n-buckets", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 400

    submit_job.main(["query", "--index", idx, "--keywords", "wa", "-k", "5"])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    scores = [l["score"] for l in lines]
    assert scores == sorted(scores, reverse=True)

    src2 = str(tmp_path / "pages2")
    generate_pages(spark, 100, seed=9).write.mode("overwrite").parquet(src2)
    submit_job.main(["append", "--input", src2, "--index", idx,
                     "--epoch", "e1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 500
