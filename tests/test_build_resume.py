"""Checkpoint-resume: kill after a stage, restart, identical index
(north rule 'resumable from checkpoint'; SURVEY.md §7.2 step 6)."""

from __future__ import annotations

import json
import os

import pytest

from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
)
from top2vec_spark.operators.tokens import assign_doc_ids, tokenize_docs
from top2vec_spark.plans.build import IndexBuilder, PostingsIndex
from top2vec_spark.sources.pages import generate_pages_pdf


@pytest.fixture(scope="module")
def parts(spark):
    pdf = generate_pages_pdf(250, seed=21)
    docs = assign_doc_ids(spark.createDataFrame(pdf[["url", "text"]]))
    tokens = tokenize_docs(docs).cache()
    vocab = build_vocab(tokens).cache()
    ds = build_doc_stats(tokens).cache()
    return tokens, vocab, ds


def _postings_snapshot(spark, path):
    rows = (
        spark.read.parquet(f"{path}/postings")
        .orderBy("term_id", "shard", "block_id")
        .collect()
    )
    return [
        (
            r["term_id"],
            r["shard"],
            r["block_id"],
            bytes(r["doc_ids"]),
            bytes(r["tfs"]),
            r["block_max_score"],
        )
        for r in rows
    ]


class KillAfter(Exception):
    pass


class KillableBuilder(IndexBuilder):
    """Simulates a mid-build crash: raises right after `kill_after`
    stage's marker is written."""

    kill_after: str | None = None

    def _mark(self, stage, **metrics):
        super()._mark(stage, **metrics)
        if stage == self.kill_after:
            raise KillAfter(stage)


@pytest.mark.parametrize("kill_stage", ["vocab", "doc_stats", "globals"])
def test_kill_and_resume_identical(spark, parts, tmp_path, kill_stage):
    tokens, vocab, ds = parts
    kw = dict(docs_per_shard=64, n_buckets=4, block_size=16)

    ref_path = str(tmp_path / "ref")
    IndexBuilder(spark, ref_path, **kw).build(tokens, vocab, ds, resume=False)
    expected = _postings_snapshot(spark, ref_path)

    # crash mid-build
    path = str(tmp_path / "idx")
    b1 = KillableBuilder(spark, path, **kw)
    b1.kill_after = kill_stage
    with pytest.raises(KillAfter):
        b1.build(tokens, vocab, ds, resume=True)
    assert not os.path.exists(f"{path}/_stages/postings.json")

    # restart: completed stages must be skipped (mtime unchanged)
    marker = f"{path}/_stages/{kill_stage}.json"
    before = os.path.getmtime(marker)
    idx = IndexBuilder(spark, path, **kw).build(tokens, vocab, ds, resume=True)
    assert os.path.getmtime(marker) == before, "completed stage re-ran"
    assert _postings_snapshot(spark, path) == expected
    assert idx.manifest.count() > 0


def test_changed_params_invalidate_markers(spark, parts, tmp_path):
    tokens, vocab, ds = parts
    path = str(tmp_path / "idx")
    IndexBuilder(spark, path, docs_per_shard=64, n_buckets=4, block_size=16).build(
        tokens, vocab, ds
    )
    # different block_size -> fingerprints mismatch -> stages re-run
    idx2 = IndexBuilder(
        spark, path, docs_per_shard=64, n_buckets=4, block_size=8
    ).build(tokens, vocab, ds, resume=True)
    with open(f"{path}/_stages/postings.json") as f:
        assert json.load(f)["fingerprint"]["block_size"] == 8
    assert idx2.postings.agg({"n": "max"}).collect()[0][0] <= 8


def test_load_roundtrip(spark, parts, tmp_path):
    tokens, vocab, ds = parts
    path = str(tmp_path / "idx")
    built = IndexBuilder(spark, path, docs_per_shard=64, n_buckets=4).build(
        tokens, vocab, ds
    )
    loaded = PostingsIndex.load(spark, path)
    assert loaded.globs == built.globs
    assert loaded.docs_per_shard == built.docs_per_shard
    assert loaded.n_buckets == built.n_buckets
    assert loaded.postings.count() == built.postings.count()
