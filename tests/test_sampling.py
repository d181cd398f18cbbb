"""Deterministic corpus splitting (operators/sampling.py): the hash
chain replayed in plain Python, realized fractions, boundary-only
movement when weights change, and validation errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.sampling import split_bucket, split_corpus


def _bucket_py(doc_id: int, seed: int = 17) -> int:
    d0 = doc_id % 2147483648
    h1 = (d0 * 2654435761) % 4294967296
    h2 = ((h1 + seed) * 40503) % 4294967296
    return h2 % 10000


def _ids_df(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_matches_python_replay(spark):
    docs = _ids_df(spark, 2000)
    got = {
        r["doc_id"]: r["split"]
        for r in split_corpus(
            docs, {"train": 0.9, "val": 0.05, "test": 0.05}
        ).collect()
    }
    for i in range(2000):
        b = _bucket_py(i)
        exp = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert got[i] == exp, (i, b)


def test_realized_fractions(spark):
    out = split_corpus(_ids_df(spark, 20000)).groupBy("split").count()
    counts = {r["split"]: r["count"] for r in out.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 20000 == pytest.approx(0.98, abs=0.01)
    assert counts["val"] / 20000 == pytest.approx(0.01, abs=0.005)
    assert counts["test"] / 20000 == pytest.approx(0.01, abs=0.005)


def test_boundary_monotone(spark):
    """Growing the first split only ADDS documents to it — existing
    members never churn (the stable-split property)."""
    docs = _ids_df(spark, 3000)
    small = {
        r["doc_id"]
        for r in split_corpus(docs, {"train": 0.8, "test": 0.2}).collect()
        if r["split"] == "train"
    }
    big = {
        r["doc_id"]
        for r in split_corpus(docs, {"train": 0.9, "test": 0.1}).collect()
        if r["split"] == "train"
    }
    assert small < big


def test_seed_changes_assignment(spark):
    docs = _ids_df(spark, 1000)
    a = {r["doc_id"]: r["split"] for r in split_corpus(docs, seed=17).collect()}
    b = {r["doc_id"]: r["split"] for r in split_corpus(docs, seed=18).collect()}
    assert a != b
    # deterministic per seed
    a2 = {r["doc_id"]: r["split"] for r in split_corpus(docs, seed=17).collect()}
    assert a == a2


def test_bucket_range(spark):
    rows = _ids_df(spark, 500).select(
        split_bucket(F.col("doc_id")).alias("b")
    ).collect()
    assert all(0 <= r["b"] < 10000 for r in rows)


def test_validation_errors(spark):
    docs = _ids_df(spark, 10)
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(docs, {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError, match="at least one"):
        split_corpus(docs, {})
    with pytest.raises(ValueError, match="negative weight"):
        split_corpus(docs, {"train": 1.5, "test": -0.5})


def test_zero_shuffle_plan(spark):
    """The assignment is one codegen projection — no Exchange."""
    plan = split_corpus(_ids_df(spark, 100))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
