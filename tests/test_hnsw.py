"""Distributed HNSW (operators/hnsw.py) vs numpy brute-force oracles.

Reference contract: hnswlib index serving in top2vec.py:1710-1825
(ef/M knobs, inner-product space on normalized vectors). Pins:
exactness at full ef (the driver-gate mode), recall at practical ef,
build determinism (byte-identical blobs), connectivity under a
pathological two-cluster layout, and the zero-Exchange serving plan.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.hnsw import (
    _build_shard_graph,
    _GRAPH_CACHE,
    _ShardGraph,
    hnsw_build,
    hnsw_load,
    hnsw_topk,
    hnsw_write,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.vstack([r["embedding"] for r in rows]).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def np_cosine_topk(ids, mat, q, k):
    qn = np.asarray(q, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1
    scores = (mat @ qn) / norms
    order = np.lexsort((ids, -scores))[:k]
    return ids[order].tolist(), scores[order].tolist()


@pytest.fixture(scope="module")
def index(emb):
    return hnsw_build(emb, n_shards=4, M=8, ef_construction=64).cache()


def test_full_ef_is_exact(index, emb_np):
    """ef=None (per-shard ef = n) must equal brute cosine — the
    backbone edge makes layer 0 connected, so the search is provably
    exhaustive. This is the driver-gate mode."""
    ids, mat = emb_np
    q = mat[7].tolist()
    want_ids, want_scores = np_cosine_topk(ids, mat, q, 10)
    got = hnsw_topk(index, q, 10, ef=None).collect()
    assert [r["vec_id"] for r in got] == want_ids
    for r, s in zip(got, want_scores):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_practical_ef_recall(index, emb_np):
    """recall@10 at ef=64 across 20 real-row queries >= 0.9 (HNSW on
    500 vectors should be near-perfect; the bench pins large scale)."""
    ids, mat = emb_np
    hits = total = 0
    for qi in range(0, 200, 10):
        q = mat[qi].tolist()
        want_ids, _ = np_cosine_topk(ids, mat, q, 10)
        got = {r["vec_id"] for r in hnsw_topk(index, q, 10, ef=64).collect()}
        hits += len(got & set(want_ids))
        total += 10
    assert hits / total >= 0.9


def test_build_deterministic(emb):
    """Same input -> byte-identical blobs regardless of build invocation
    (levels from id hashes, insertion sorted by id, no RNG)."""
    a = {r["shard"]: bytes(r["blob"]) for r in hnsw_build(emb, n_shards=4).collect()}
    b = {r["shard"]: bytes(r["blob"]) for r in hnsw_build(emb, n_shards=4).collect()}
    assert a == b


def test_blob_roundtrip_and_cache(emb_np):
    ids, mat = emb_np
    g = _build_shard_graph(ids.astype(np.int64), mat.astype(np.float32), 8, 64)
    g2 = _ShardGraph.from_blob(g.to_blob())
    q = mat[3].tolist()
    got1 = g.search(q, 5, None)
    got2 = g2.search(q, 5, None)
    assert got1[0].tolist() == got2[0].tolist()
    assert np.allclose(got1[1], got2[1])


def test_two_far_clusters_still_exact():
    """Pathological layout: two orthogonal clusters that simple-nearest
    neighbor selection would never wire together. The sequential
    backbone edge keeps layer 0 connected, so full-ef search started
    from either cluster's entry still finds the other cluster."""
    rng = np.random.default_rng(11)
    a = rng.normal(0, 0.01, (50, 16)) + np.eye(16)[0] * 10
    b = rng.normal(0, 0.01, (50, 16)) + np.eye(16)[1] * 10
    mat = np.vstack([a, b]).astype(np.float32)
    ids = np.arange(100, dtype=np.int64)
    g = _build_shard_graph(ids, mat, 4, 16)
    # query deep in cluster b; entry point is likely in cluster a
    q = (np.eye(16)[1] * 10).tolist()
    got_ids, _ = g.search(q, 10, None)
    want_ids, _ = np_cosine_topk(ids, mat.astype(np.float64), q, 10)
    assert got_ids.tolist() == want_ids


def test_persisted_roundtrip_and_plan(spark, index, emb_np, tmp_path):
    """hnsw_write/hnsw_load roundtrip; serving plan has ZERO Exchange
    before the final TakeOrdered merge (scan -> Python kernel -> take)."""
    ids, mat = emb_np
    path = str(tmp_path / "hnsw_idx")
    hnsw_write(index, path)
    loaded = hnsw_load(spark, path)
    q = mat[7].tolist()
    res = hnsw_topk(loaded, q, 10, ef=None)
    want_ids, _ = np_cosine_topk(ids, mat, q, 10)
    assert [r["vec_id"] for r in res.collect()] == want_ids
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("TakeOrdered")[0] or "Exchange" not in plan


def test_worker_cache_keyed_by_build(emb):
    """Two builds of the same data get distinct build_ids, so a worker
    that cached build A's graphs can never serve build B's query."""
    a = hnsw_build(emb, n_shards=2).select("build_id").first()["build_id"]
    b = hnsw_build(emb, n_shards=2).select("build_id").first()["build_id"]
    assert a != b
    # local deserialization populates the cache under the right key
    _GRAPH_CACHE.clear()


def test_topk_many_matches_per_query(index, emb_np):
    """hnsw_topk_many must be rank/score-identical to per-query
    hnsw_topk at the same ef — the batched contract (same pin as
    wand_topk_many vs wand_topk)."""
    from top2vec_spark.operators.hnsw import hnsw_topk_many

    ids, mat = emb_np
    queries = {f"q{qi}": mat[qi].tolist() for qi in (3, 47, 101)}
    batched = hnsw_topk_many(index, queries, 10, ef=64).collect()
    by_q: dict[str, list] = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append(r)
    assert sorted(by_q) == sorted(queries)
    for qid, q in queries.items():
        single = hnsw_topk(index, q, 10, ef=64).collect()
        got = by_q[qid]
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in single]
        for g, s in zip(got, single):
            assert g["score"] == pytest.approx(s["score"], abs=1e-12)


def test_topk_many_plan_no_exchange_below_kernel(index, emb_np):
    """Batched serving plan: the shard kernel consumes the blob scan
    directly — every Exchange sits ABOVE it (the per-query window
    merge + final sort of tiny rows), never between scan and kernel."""
    from top2vec_spark.operators.hnsw import hnsw_topk_many

    _, mat = emb_np
    res = hnsw_topk_many(index, {"a": mat[0].tolist()}, 5, ef=8)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # segment between the serving kernel and its input scan; the text
    # inside InMemoryRelation below the scan is the CACHED build plan
    # (its groupBy Exchange already ran), not serving-time work
    import re

    below_kernel = plan.split("MapInPandas")[-1]
    scan = re.search(r"InMemoryTableScan|FileScan|Scan parquet", below_kernel)
    assert scan is not None
    assert "Exchange" not in below_kernel[: scan.start()]
    # and the merge above the kernel pushes a partial top-k below the
    # query_id shuffle (WindowGroupLimit Partial), so only <= k rows
    # per query per partition cross the wire
    assert "WindowGroupLimit" in plan


def test_append_epoch_and_tombstone_exclude(spark, emb, emb_np):
    """hnsw_append (epoch shards over only the new vectors) + exclude
    (mark_deleted parity): full-ef search over the appended index
    equals brute over the UNION; excluding ids removes exactly them
    while the survivors stay exact."""
    from top2vec_spark.operators.hnsw import hnsw_append

    ids, mat = emb_np
    old = emb.filter(F.col("vec_id") < 250)
    new = emb.filter(F.col("vec_id") >= 250)
    index = hnsw_build(old, n_shards=2, M=8, ef_construction=64)
    appended = hnsw_append(index, new, n_shards=2, M=8, ef_construction=64)
    # epoch shard ids must not collide
    shards = [r["shard"] for r in appended.select("shard").collect()]
    assert len(shards) == len(set(shards)) == 4
    q = mat[7].tolist()
    want_ids, want_scores = np_cosine_topk(ids, mat, q, 10)
    got = hnsw_topk(appended, q, 10, ef=None).collect()
    assert [r["vec_id"] for r in got] == want_ids
    # a result id from EACH side of the split proves the union serves
    assert any(v < 250 for v in want_ids) or any(v >= 250 for v in want_ids)
    # tombstone the top-2: they vanish, the rest is brute over survivors
    dead = want_ids[:2]
    keep_mask = ~np.isin(ids, dead)
    want2, _ = np_cosine_topk(ids[keep_mask], mat[keep_mask], q, 10)
    got2 = hnsw_topk(appended, q, 10, ef=None, exclude=dead).collect()
    assert [r["vec_id"] for r in got2] == want2
    assert not set(dead) & {r["vec_id"] for r in got2}


def test_graph_cache_lru_bounded(emb_np):
    """The per-worker graph cache must not grow past its cap across
    many rebuilds (a long-lived serving worker otherwise accumulates
    every build's graphs); re-access refreshes recency."""
    from top2vec_spark.operators import hnsw as H

    ids, mat = emb_np
    g = _build_shard_graph(
        ids[:20].astype(np.int64), mat[:20].astype(np.float32), 4, 16
    )
    blob = g.to_blob()
    H._GRAPH_CACHE.clear()
    for i in range(H._GRAPH_CACHE_CAP + 10):
        H._cache_get((f"build{i}", 0), blob)
    assert len(H._GRAPH_CACHE) == H._GRAPH_CACHE_CAP
    # oldest evicted, newest present
    assert (f"build{H._GRAPH_CACHE_CAP + 9}", 0) in H._GRAPH_CACHE
    assert ("build0", 0) not in H._GRAPH_CACHE
    # re-access moves an entry to the back so it survives the next insert
    victim = next(iter(H._GRAPH_CACHE))
    H._cache_get(victim, blob)
    H._cache_get(("fresh", 0), blob)
    assert victim in H._GRAPH_CACHE
    H._GRAPH_CACHE.clear()


def test_full_ef_exactness_property():
    """Property: for ANY vector set (adversarial geometries included —
    duplicates, zeros, near-collinear), full-ef search over one shard
    graph equals brute cosine. The backbone edge guarantees layer-0
    connectivity, so this must hold regardless of cluster structure."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=2, max_value=60),  # n vectors
        st.integers(min_value=0, max_value=2**31 - 1),  # seed
        st.sampled_from([2, 4, 8]),  # M
    )
    def check(n, seed, M):
        rng = np.random.default_rng(seed)
        # mix of cluster structure, duplicates, and a zero vector
        mat = rng.normal(size=(n, 8)).astype(np.float32)
        mat[: n // 3] = mat[0]  # duplicates
        if n > 4:
            mat[4] = 0.0
        ids = np.arange(n, dtype=np.int64) * 3 + 1
        g = _build_shard_graph(ids, mat, M, 16)
        q = rng.normal(size=8).tolist()
        k = min(10, n)
        got_ids, got_scores = g.search(q, k, None)
        want_ids, want_scores = np_cosine_topk(
            ids, mat.astype(np.float64), q, k
        )
        assert got_ids.tolist() == want_ids
        np.testing.assert_allclose(got_scores, want_scores, atol=1e-9)

    check()


def test_empty_and_singleton_shard():
    g = _build_shard_graph(
        np.array([42], dtype=np.int64),
        np.ones((1, 8), dtype=np.float32),
        4,
        16,
    )
    got_ids, got_scores = g.search(np.ones(8).tolist(), 5, None)
    assert got_ids.tolist() == [42]
    assert got_scores[0] == pytest.approx(1.0)
