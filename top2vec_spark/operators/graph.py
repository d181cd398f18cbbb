"""Distributed connected components over duplicate-pair graphs.

The missing step between near-duplicate PAIR detection (dedup.py emits
verified (doc_a, doc_b) pairs) and actionable dedup at corpus scale:
pairs are transitive evidence, not clusters. Web-scale pipelines (the
"Deduplicating Training Data" / SlimPajama recipe) resolve the pair
graph into connected components and keep one document per component.
The reference has no dedup at all (SURVEY §2 notes dedup is a
beyond-reference pipeline requirement), so there is no top2vec.py
contract line to cite — the contract here is graph-theoretic: label
every node with the MINIMUM node id reachable from it.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014) — the same algorithm GraphFrames ships. Each
round is two edge-set rewrites; the edge set is always a subset of
(node -> strictly smaller node) after the first small-star, converges
to a star forest centered at component minima in O(log^2 n) rounds
(O(log n) observed), and NEVER materializes a component on one
machine — labels live in a DataFrame end to end, unlike the MST
operator's documented O(n)-driver-rows bound (hdbscan.boruvka_mst).

Scale notes (10^12 nodes):
- per star op: one partial-agg groupBy (map-side combined, skew-safe)
  plus one shuffle join of the adjacency against the per-node min map.
  A mega-component's hub node is a skewed join key — AQE skew-join
  splits it (the map side is (node, min): one row per node, uniform).
- the live edge set stays O(nodes in any pair) for the whole loop
  (every non-root keeps exactly one edge at fixpoint) — each round
  shuffles O(n), total O(n log n), the published bound.
- lineage is cut every round with an eager localCheckpoint; the
  convergence probe (count + order-independent xxhash64 XOR) rides
  the same materialization.
- optional driver tail (driver_edge_cap, default 500k rows of 16
  bytes): once the edge set fits, finish with a numpy union-find —
  duplicate graphs are usually a tiny fraction of the corpus, so the
  tail typically fires after round 1; cap=0 forces pure-distributed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as (u, v) with u > v, self-loops dropped."""
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    return (
        edges.select(
            F.greatest(a, b).alias("u"), F.least(a, b).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(Gamma(u) + {u}); emit (v, m) for every
    neighbor v > u. Input/output edges are (bigger, smaller)."""
    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = adj.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select(
        "u", F.least(F.col("mn"), F.col("u")).alias("m")
    )
    return (
        adj.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u over its smaller neighbors N (edges arrive
    canonical, u > v, so N is exactly the v column): m = min(N); emit
    (x, m) for x in N \\ {m} and (u, m)."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    joined = edges.join(mins, "u")
    leaves = joined.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return leaves.unionByName(centers).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(row count, order-independent hash sum) — one job, and the
    action that makes the round's localCheckpoint eager."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64("u", "v")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 64,
    driver_edge_cap: int = 500_000,
) -> DataFrame:
    """Label every node of an undirected edge DataFrame with the
    minimum node id in its connected component.

    Returns (node long, component long) covering every node that
    appears in any input edge (callers union isolated nodes — see
    :func:`duplicate_clusters`). Deterministic: the labeling is a pure
    function of the edge SET."""
    spark = edges.sparkSession
    e = _canon(edges, src, dst)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = e.localCheckpoint()
    prev = _fingerprint(e)
    converged = False
    for _ in range(max_rounds):
        if driver_edge_cap and prev[0] <= driver_edge_cap:
            pdf = e.toPandas()
            lab = _union_find_min(
                pdf["u"].to_numpy(np.int64), pdf["v"].to_numpy(np.int64)
            )
            # lab holds native-int tuples; keep them native (the
            # non-arrow createDataFrame fallback on older pyspark
            # rejects np.int64 values)
            labels = spark.createDataFrame(
                lab, "node long, component long"
            )
            return (
                nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce("component", F.col("node")).alias("component"),
                )
            )
        # materialize BETWEEN the stars: _small_star consumes its input
        # twice (per-node min + join probe) and Catalyst does not dedupe
        # common subtrees, so an unmaterialized large-star output would
        # be computed twice per round (verified in the plan audit,
        # BENCH/PLANS.md)
        e_ls = _large_star(e).localCheckpoint()
        e2 = _small_star(e_ls).localCheckpoint()
        cur = _fingerprint(e2)
        e = e2
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # exhausting max_rounds means e is NOT a star forest and the
        # projection below would emit conflicting labels — fail loudly
        # (convergence is O(log^2 n) rounds; 64 covers any real input)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    stars = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(stars, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )


def _union_find_min(u: np.ndarray, v: np.ndarray) -> list[tuple[int, int]]:
    """Driver-tail union-find; component label = min member id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(u.tolist(), v.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    seen = set(u.tolist()) | set(v.tolist())
    return [(n, find(n)) for n in seen]


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    driver_edge_cap: int = 500_000,
) -> DataFrame:
    """Resolve verified near-duplicate pairs into per-document cluster
    assignments over the WHOLE corpus: (doc_id, cluster_id, is_keeper)
    where cluster_id = min doc_id of the duplicate component (docs in
    no pair are their own singleton cluster) and is_keeper marks the
    one document per cluster a dedup pass retains — min id, the same
    keeper rule as dedup_exact/url_dedup. One broadcast-or-shuffle
    left join over the corpus; the corpus itself never shuffles by
    content."""
    labels = connected_components(
        pairs, src=src, dst=dst, driver_edge_cap=driver_edge_cap
    ).withColumnRenamed("node", id_col)
    return (
        docs.select(id_col)
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_keeper", (F.col(id_col) == F.col("cluster_id")))
    )
