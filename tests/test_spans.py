"""Exact-substring (duplicate-span) dedup — operators/spans.py.

Every numeric assertion is replayed by a plain-Python oracle that
counts window CONTENT (token tuples), so the Spark side's rolling
128-bit hashing is pinned against an implementation that never
hashes at all."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.spans import (
    duplicate_spans,
    scrub_duplicate_spans,
    window_hashes,
)


def _arr(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def _py_occurrences(rows, w):
    """(window tuple) -> sorted [(doc_id, pos), ...] occurrence list."""
    occ = {}
    for did, toks in rows:
        for i in range(len(toks) - w + 1):
            occ.setdefault(tuple(toks[i : i + w]), []).append((did, i))
    return {k: sorted(v) for k, v in occ.items()}


def _py_dup_spans(rows, w, min_count=2):
    """Oracle for duplicate_spans: [(doc_id, pos, n_occ, is_keeper)]."""
    out = []
    for _, places in _py_occurrences(rows, w).items():
        if len(places) < min_count:
            continue
        keeper = places[0]
        for p in places:
            out.append((p[0], p[1], len(places), p == keeper))
    return sorted(out)


def _py_scrub(rows, w, keep="first", min_count=2):
    """Oracle for scrub_duplicate_spans: {doc_id: (kept_tokens, n_removed)}."""
    spans = _py_dup_spans(rows, w, min_count)
    marked = [
        (d, p) for (d, p, _, isk) in spans if keep == "none" or not isk
    ]
    out = {}
    for did, toks in rows:
        covered = set()
        for d, p in marked:
            if d == did:
                covered.update(range(p, min(p + w, len(toks))))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[did] = (kept, len(covered))
    return out


ROWS = [
    (0, ["a", "b", "c", "d", "e", "f", "g", "h"]),  # shares abcde with doc 1
    (1, ["x", "a", "b", "c", "d", "e", "y", "z"]),
    (2, ["p", "q", "r", "s", "t"]),  # unique
    (3, ["m", "n", "m", "n", "m", "n", "m"]),  # within-doc repeats
    (4, ["a", "b"]),  # shorter than any tested w: never emits windows
    (5, []),  # empty token list
]


def test_window_hashes_match_content_equality(spark):
    """Windows hash-equal iff their token content is equal (w=3):
    the rolling 128-bit key must induce exactly the content classes
    the no-hash oracle builds."""
    w = 3
    got = window_hashes(_arr(spark, ROWS), w).collect()
    by_hash = {}
    for r in got:
        by_hash.setdefault((r.h1, r.h2), []).append((r.doc_id, r.pos))
    classes = {tuple(sorted(v)) for v in by_hash.values()}
    oracle = {
        tuple(v) for v in _py_occurrences(ROWS, w).values()
    }
    assert classes == oracle
    # row count: sum over docs of max(len - w + 1, 0)
    assert len(got) == sum(max(len(t) - w + 1, 0) for _, t in ROWS)


@pytest.mark.parametrize("w", [2, 3, 5])
def test_duplicate_spans_vs_python_oracle(spark, w):
    got = sorted(
        (r.doc_id, r.pos, r.n_occ, r.is_keeper)
        for r in duplicate_spans(_arr(spark, ROWS), w).collect()
    )
    assert got == _py_dup_spans(ROWS, w)


def test_within_doc_repeats_detected(spark):
    """doc 3 = m n m n m n m: every (m,n) window repeats within the
    single doc; ExactSubstr counts within-doc occurrences."""
    got = _py_dup_spans(ROWS, 2)
    spark_got = sorted(
        (r.doc_id, r.pos, r.n_occ, r.is_keeper)
        for r in duplicate_spans(_arr(spark, ROWS), 2).collect()
    )
    assert spark_got == got
    assert any(d == 3 for d, _, _, _ in got)


@pytest.mark.parametrize("keep", ["first", "none"])
def test_scrub_vs_python_oracle(spark, keep):
    got = {
        r.doc_id: (list(r.tokens), r.n_removed)
        for r in scrub_duplicate_spans(_arr(spark, ROWS), 3, keep=keep).collect()
    }
    assert got == _py_scrub(ROWS, 3, keep=keep)
    # every input doc present exactly once, including empty/short docs
    assert set(got) == {d for d, _ in ROWS}
    # doc 2 is unique content: untouched either way
    assert got[2] == (["p", "q", "r", "s", "t"], 0)
    # doc 4 shorter than w: untouched
    assert got[4] == (["a", "b"], 0)


def test_keep_first_preserves_one_occurrence(spark):
    """With keep='first' the globally-first occurrence of the shared
    run survives in doc 0 while doc 1's copy is cut."""
    out = _py_scrub(ROWS, 3, keep="first")
    assert "c" in out[0][0] and "c" not in out[1][0]
    got = {
        r.doc_id: list(r.tokens)
        for r in scrub_duplicate_spans(_arr(spark, ROWS), 3).collect()
    }
    assert got[0] == out[0][0] and got[1] == out[1][0]


def test_random_corpus_property(spark):
    """Small alphabet => organically duplicated windows everywhere;
    Spark must match the no-hash Python oracle on both operators."""
    rng = np.random.default_rng(7)
    rows = [
        (
            int(d),
            [f"t{v}" for v in rng.integers(0, 5, size=int(rng.integers(0, 30)))],
        )
        for d in range(40)
    ]
    w = 4
    got_spans = sorted(
        (r.doc_id, r.pos, r.n_occ, r.is_keeper)
        for r in duplicate_spans(_arr(spark, rows), w).collect()
    )
    assert got_spans == _py_dup_spans(rows, w)
    got_scrub = {
        r.doc_id: (list(r.tokens), r.n_removed)
        for r in scrub_duplicate_spans(_arr(spark, rows), w, keep="none").collect()
    }
    assert got_scrub == _py_scrub(rows, w, keep="none")


def test_partition_invariance(spark):
    base = _arr(spark, ROWS)
    a = sorted(
        (r.doc_id, r.pos, r.n_occ, r.is_keeper)
        for r in duplicate_spans(base.repartition(7), 3).collect()
    )
    b = sorted(
        (r.doc_id, r.pos, r.n_occ, r.is_keeper)
        for r in duplicate_spans(base.coalesce(1), 3).collect()
    )
    assert a == b


def test_invalid_args_raise(spark):
    with pytest.raises(ValueError, match="keep"):
        scrub_duplicate_spans(_arr(spark, ROWS), 3, keep="last")
    with pytest.raises(ValueError, match="window"):
        window_hashes(_arr(spark, ROWS), 0)


def test_null_tokens_raise_loudly(spark):
    """A NULL tokens cell (e.g. from an outer join upstream) must fail
    with the typed message, not an opaque numpy error — and never be
    silently treated as an empty doc."""
    rows = spark.createDataFrame(
        [(0, ["a", "b", "c"]), (1, None)], "doc_id long, tokens array<string>"
    )
    with pytest.raises(Exception, match="NULL"):
        duplicate_spans(rows, 2).collect()
    with pytest.raises(Exception, match="NULL"):
        scrub_duplicate_spans(rows, 2).collect()


def test_single_exchange_kernel_reuse(spark):
    """The repartition(h1, h2) before both consumers must make the
    agg branch and the join branch share ONE exchange — pinned by the
    ReusedExchange node in the executed adaptive plan. Without it the
    whole scan+rolling-hash subtree executes twice."""
    df = duplicate_spans(_arr(spark, ROWS), 3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_min_count_threshold(spark):
    """min_count=3 keeps only windows occurring >= 3 times."""
    rows = [
        (0, ["a", "b", "c"]),
        (1, ["a", "b", "c"]),
        (2, ["a", "b", "c"]),
        (3, ["d", "e", "f"]),
        (4, ["d", "e", "f"]),
    ]
    got = sorted(
        (r.doc_id, r.pos, r.n_occ)
        for r in duplicate_spans(_arr(spark, rows), 3, min_count=3).collect()
    )
    assert got == [(0, 0, 3), (1, 0, 3), (2, 0, 3)]
