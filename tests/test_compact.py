"""Compaction (plans/build.compact_index): fold append epochs and
tombstones into a fresh single-epoch base WITHOUT re-reading raw text.

Core invariant: the compacted index is byte-identical in postings and
rank/score-identical in queries to a FRESH build over the surviving
documents (same doc_ids), with statistics recomputed (stats_fresh back
to True) — i.e. compact ≡ rebuild, minus the tokenize cost. Plus the
crash-recovery state machine around the atomic directory swap."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.bm25 import resolve_query_terms
from top2vec_spark.operators.tokens import assign_doc_ids
from top2vec_spark.operators.wand import wand_topk
from top2vec_spark.plans.build import IndexBuilder, PostingsIndex, compact_index
from top2vec_spark.sources.pages import generate_pages_pdf

DPS, NB = 64, 4
QUERIES = [(["wa", "wb"], []), (["wc"], []), (["wa", "wd"], ["wb"])]


def _mk_docs(spark, n, seed, start=0):
    pdf = generate_pages_pdf(n, seed=seed, start=start)
    return (
        assign_doc_ids(spark.createDataFrame(pdf[["url", "text"]]))
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    """base build + one append epoch + deletes in BOTH doc ranges."""
    root = tmp_path_factory.mktemp("compact")
    base = _mk_docs(spark, 200, seed=41)
    new = _mk_docs(spark, 100, seed=42)
    path = str(root / "idx")
    idx = IndexBuilder(
        spark, path, docs_per_shard=DPS, n_buckets=NB
    ).build_from_docs(base, resume=False)
    lo = idx.next_doc_id()
    shifted = new.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(lo)).cast("long")
    ).cache()
    idx = idx.append_documents(shifted, epoch_id="ep1")
    deleted = [3, 57, 110, lo + 5, lo + 42]
    idx = idx.delete_documents(deleted)
    survivors = base.unionByName(shifted).filter(
        ~F.col("doc_id").isin(deleted)
    ).cache()
    return idx, path, survivors, deleted, root


def _query_rows(spark, idx, pos, neg, k=15):
    vmap = {r["term"]: (r["term_id"], r["df"]) for r in idx.vocab.collect()}
    q = resolve_query_terms(vmap, pos, neg)
    return [
        (r["doc_id"], r["score"])
        for r in wand_topk(spark, idx, q, idx.globs, k).collect()
    ]


def test_compact_equals_fresh_build(spark, fragmented):
    idx, path, survivors, deleted, root = fragmented
    assert idx.stats_fresh is False and len(idx.tombstones) == 5

    cidx = idx.compact()

    # layout: single base epoch, no tombstones, fresh stats
    with open(f"{path}/globals.json") as f:
        gj = json.load(f)
    assert gj.get("appends", []) == []
    assert gj.get("stats_fresh", True) is True  # implied True on fresh
    assert gj.get("vocab_dir", "vocab") == "vocab"
    epochs = {
        d
        for d in os.listdir(f"{path}/postings/bucket=0")
        if d.startswith("epoch=")
    }
    assert epochs == {"epoch=base"}
    assert cidx.tombstones == frozenset()
    assert cidx.stats_fresh is True
    assert cidx.globs.n_docs == survivors.count()

    # fresh-build oracle over the surviving docs (same doc_ids)
    fresh = IndexBuilder(
        spark, str(root / "fresh"), docs_per_shard=DPS, n_buckets=NB
    ).build_from_docs(survivors, resume=False)
    assert fresh.globs == cidx.globs

    # postings byte-identity (blocks are deterministic per (term, shard))
    def blocks(ix):
        return sorted(
            (
                r["term_id"],
                r["shard"],
                r["block_id"],
                bytes(r["doc_ids"]),
                bytes(r["tfs"]),
                r["n"],
            )
            for r in ix.postings.collect()
        )

    assert blocks(cidx) == blocks(fresh)
    # vocab renumbered like a fresh build (df desc, term asc over survivors)
    assert sorted(map(tuple, cidx.vocab.collect())) == sorted(
        map(tuple, fresh.vocab.collect())
    )

    # rank/score identity on the query set; deleted docs gone
    for pos, neg in QUERIES:
        got = _query_rows(spark, cidx, pos, neg)
        exp = _query_rows(spark, fresh, pos, neg)
        assert [d for d, _ in got] == [d for d, _ in exp], (pos, neg)
        for (d1, s1), (d2, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, abs=1e-12)
        assert not set(d for d, _ in got) & set(deleted)

    # compacting an already-compact index is a no-op in content
    c2 = cidx.compact()
    assert blocks(c2) == blocks(fresh) and c2.globs == fresh.globs


def test_compact_crash_recovery(spark, tmp_path):
    """The swap state machine: (a) crash after the temp build completed
    but before any rename — recovery finishes the swap; (b) crash
    between the two renames (live dir missing) — recovery completes;
    (c) a source index that CHANGED after an interrupted attempt
    discards the stale temp instead of swapping it in."""
    import shutil

    import top2vec_spark.plans.build as B

    docs = _mk_docs(spark, 120, seed=43)
    path = str(tmp_path / "idx")
    idx = IndexBuilder(
        spark, path, docs_per_shard=DPS, n_buckets=NB
    ).build_from_docs(docs, resume=False)
    idx = idx.delete_documents([7, 11])
    n_surv = 118

    # (a) build the temp fully, then "crash" before the swap: simulate
    # by running compact with a sabotaged swap rename
    real_rename = os.rename
    calls = {"n": 0}

    def boom(src, dst):
        if src == path:  # the first swap rename (live -> aside)
            raise OSError("injected crash before swap")
        return real_rename(src, dst)

    os.rename = boom
    try:
        with pytest.raises(OSError, match="injected"):
            compact_index(spark, path)
    finally:
        os.rename = real_rename
    tmp_dir = f"{path}.__compact__"
    assert os.path.exists(f"{tmp_dir}/_COMPACT_COMPLETE.json")
    assert os.path.exists(f"{path}/globals.json")  # live index intact

    # recovery: marker + unchanged source -> finish the swap
    cidx = compact_index(spark, path)
    assert cidx.globs.n_docs == n_surv and cidx.tombstones == frozenset()
    assert not os.path.exists(tmp_dir)

    # (b) mid-swap crash: live dir renamed aside, temp complete
    idx2 = cidx.delete_documents([23])
    real_rename2 = os.rename

    def boom2(src, dst):
        real_rename2(src, dst)
        if src == path:  # after live -> aside, die before temp -> live
            raise OSError("injected mid-swap crash")

    os.rename = boom2
    try:
        with pytest.raises(OSError, match="mid-swap"):
            compact_index(spark, path)
    finally:
        os.rename = real_rename2
    assert not os.path.exists(f"{path}/globals.json")  # live dir gone
    cidx2 = compact_index(spark, path)  # completes the rename
    assert cidx2.globs.n_docs == n_surv - 1
    assert cidx2.tombstones == frozenset()

    # (c) stale temp: interrupt before swap again, then CHANGE the
    # source (a delete) — recovery must discard the temp and recompact
    os.rename = boom
    try:
        with pytest.raises(OSError, match="injected"):
            compact_index(spark, path)
    finally:
        os.rename = real_rename
    assert os.path.exists(f"{tmp_dir}/_COMPACT_COMPLETE.json")
    cidx2 = PostingsIndex.load(spark, path).delete_documents([31])
    cidx3 = compact_index(spark, path)
    assert cidx3.globs.n_docs == n_surv - 2  # includes the late delete
    assert cidx3.tombstones == frozenset()


def test_api_compact_hook(spark, tmp_path):
    """Facade path: engine.compact_index() after deletes serves
    queries identical to a fresh engine over the survivors, under the
    engine's own min_count."""
    from top2vec_spark.api import Top2VecSpark

    docs = _mk_docs(spark, 150, seed=44)
    eng = Top2VecSpark(spark, docs, min_count=0)
    with pytest.raises(ValueError, match="build_index first"):
        eng.compact_index()
    eng.build_index(str(tmp_path / "api_idx"), resume=False,
                    docs_per_shard=DPS, n_buckets=NB)
    victims = [
        r["doc_id"]
        for r in eng.search_documents_by_keywords(
            ["wa"], 2, return_documents=False
        ).collect()
    ]
    eng._index.delete_documents(victims)
    eng.compact_index()
    assert eng._index.stats_fresh and eng._index.tombstones == frozenset()

    survivors = docs.filter(~F.col("doc_id").isin(victims))
    ref = Top2VecSpark(spark, survivors, min_count=0)
    ref.build_index(str(tmp_path / "ref_idx"), resume=False,
                    docs_per_shard=DPS, n_buckets=NB)
    got = eng.search_documents_by_keywords(
        ["wa", "wb"], 10, return_documents=False
    ).collect()
    exp = ref.search_documents_by_keywords(
        ["wa", "wb"], 10, return_documents=False
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
    for a, b in zip(got, exp):
        assert a["score"] == pytest.approx(b["score"], abs=1e-9)
    assert not set(r["doc_id"] for r in got) & set(victims)
