"""Connected components (operators/graph.py): distributed large-star/
small-star vs a reference union-find, plus the duplicate_clusters
corpus contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.graph import (
    _union_find_min,
    connected_components,
    duplicate_clusters,
)


def _reference_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    edges = [(a, b) for a, b in edges if a != b]  # match _canon's node set
    if not edges:
        return {}
    u = np.array([a for a, _ in edges], dtype=np.int64)
    v = np.array([b for _, b in edges], dtype=np.int64)
    return dict(_union_find_min(u, v))


def _cc_dict(df) -> dict[int, int]:
    return {r["node"]: r["component"] for r in df.collect()}


def _random_graph(seed: int, n: int, m: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, size=m)
    b = rng.integers(0, n, size=m)
    return list(zip(a.tolist(), b.tolist()))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("cap", [0, 10_000])
def test_cc_matches_union_find_random(spark, seed, cap):
    """Distributed path (cap=0) and driver-tail path both equal the
    reference union-find labeling (component = min member id) on
    random multigraphs with self-loops and isolated regions."""
    edges = _random_graph(seed, n=300, m=400)
    edges += [(5, 5), (7, 7)]  # self-loops must not crash or link
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = _cc_dict(connected_components(df, driver_edge_cap=cap))
    assert got == _reference_labels(edges)


@pytest.mark.parametrize("cap", [0, 10_000])
def test_cc_deep_chain_and_ring(spark, cap):
    """A 200-node path plus a ring — worst-case diameter for naive
    min-propagation; star alternation must still converge inside
    max_rounds and label everything with the chain head."""
    chain = [(i, i + 1) for i in range(200)]
    ring = [(1000 + i, 1000 + (i + 1) % 50) for i in range(50)]
    df = spark.createDataFrame(chain + ring, "doc_a long, doc_b long")
    got = _cc_dict(connected_components(df, driver_edge_cap=cap))
    assert all(got[i] == 0 for i in range(201))
    assert all(got[1000 + i] == 1000 for i in range(50))


def test_cc_partition_invariant(spark):
    """The labeling is a pure function of the edge SET: shuffled,
    duplicated, reversed input rows give identical labels."""
    edges = _random_graph(9, n=120, m=150)
    df1 = spark.createDataFrame(edges, "doc_a long, doc_b long")
    df2 = (
        spark.createDataFrame(
            [(b, a) for a, b in edges] + edges, "doc_a long, doc_b long"
        )
        .repartition(7)
    )
    assert _cc_dict(connected_components(df1, driver_edge_cap=0)) == _cc_dict(
        connected_components(df2, driver_edge_cap=0)
    )


def test_duplicate_clusters_corpus_contract(spark):
    """Every corpus doc gets a row; docs in no pair are their own
    singleton cluster; cluster_id = component min; is_keeper marks
    exactly one doc per cluster (the min)."""
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(3, 1), (5, 3), (8, 9)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in duplicate_clusters(docs, pairs).collect()
    }
    assert len(rows) == 10
    assert rows[1] == (1, True)
    assert rows[3] == (1, False)
    assert rows[5] == (1, False)
    assert rows[8] == (8, True)
    assert rows[9] == (8, False)
    for d in (0, 2, 4, 6, 7):
        assert rows[d] == (d, True)


def test_duplicate_clusters_empty_pairs(spark):
    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = duplicate_clusters(docs, pairs)
    assert out.filter(~F.col("is_keeper")).count() == 0
    assert out.count() == 5


def test_dedup_near_end_to_end(spark, tiny_docs):
    """dedup_near keeps exactly one doc per transitive duplicate
    cluster: corpus + two shifted exact copies collapses back to the
    original doc count with the original (minimum) ids."""
    from top2vec_spark.functions.tokenizer import sql_tokens_expr
    from top2vec_spark.operators.dedup import dedup_near

    docs = tiny_docs
    for off in (100, 200):
        docs = docs.unionByName(
            tiny_docs.select(
                (F.col("doc_id") + off).alias("doc_id"), "text"
            )
        )
    toks = docs.select("doc_id", sql_tokens_expr("text").alias("tokens"))
    kept = dedup_near(docs, toks, threshold=1.0)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [
        r["doc_id"] for r in tiny_docs.select("doc_id").orderBy("doc_id").collect()
    ]


def test_non_convergence_raises(spark):
    """Exhausting max_rounds must fail loudly, never emit conflicting
    labels (detection needs one extra fixpoint-confirming round, so a
    3-node chain cannot be confirmed within a single round)."""
    df = spark.createDataFrame([(1, 0), (2, 1)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1, driver_edge_cap=0)


def test_cc_property_random_multigraphs(spark):
    """Property: for ANY edge multiset (self-loops, duplicates, deep
    chains, isolated cliques), the distributed star rounds (cap=0)
    equal the union-find min-labeling. Few examples — each runs a
    full distributed fixpoint loop — but hypothesis varies density
    and shape where the seeded tests cannot."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(st.integers(min_value=0, max_value=2**31 - 1))
    def check(seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(2, 50))
        m = int(rng.integers(1, 70))
        edges = [
            (int(a), int(b))
            for a, b in zip(
                rng.integers(0, n, size=m), rng.integers(0, n, size=m)
            )
        ]
        # splice in a chain so some component has large diameter
        edges += [(1000 + i, 1001 + i) for i in range(int(rng.integers(1, 12)))]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = _cc_dict(connected_components(df, driver_edge_cap=0))
        assert got == _reference_labels(edges)

    check()


def test_cc_mega_star_hub(spark):
    """A single 50k-leaf star (the hub-skew shape the module docstring
    claims survives: one join key holds the whole component) resolves
    to one component labeled by the hub, distributed path only."""
    edges = spark.range(1, 50_001).select(
        F.lit(0).cast("long").alias("doc_a"), F.col("id").alias("doc_b")
    )
    out = connected_components(edges, driver_edge_cap=0)
    assert out.count() == 50_001
    assert out.filter(F.col("component") != 0).count() == 0
