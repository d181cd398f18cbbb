"""Distributed HDBSCAN — density-based topic discovery (SURVEY.md
§2.10; reference contract top2vec.py:1552-1567, ``hdbscan_args =
{'min_cluster_size': 15, 'metric': 'euclidean',
'cluster_selection_method': 'eom'}``).

From-scratch re-expression of Campello/Moulavi/Sander 2013 (the
algorithm the reference's ``hdbscan`` dependency implements) in the
standard scalable decomposition (the same one GPU/distributed
implementations use):

1. kNN graph (exact broadcast-brute, or IVF-bucketed at scale) —
   distributed, the only O(n * candidates) stage.
2. core distances = distance to the ``min_samples``-th nearest
   neighbor COUNTING THE POINT ITSELF (sklearn/hdbscan convention:
   ``kneighbors(X)[:, min_samples-1]`` where column 0 is self).
3. mutual-reachability weights max(core_a, core_b, d(a,b)) on the
   kNN edges — distributed joins.
4. minimum spanning tree via distributed Boruvka over the edge
   DataFrame — O(log n) rounds, each a pair of joins + a per-
   component min; the per-round merge decisions (<= #components,
   halving every round) are the only driver traffic besides the
   final n-1 MST edges.
5. single-linkage dendrogram -> condensed tree -> excess-of-mass
   cluster selection — driver-side numpy over the n-1 MST edges
   (O(n log n); the MST is 24 bytes/point, fine to ~10^8 points on a
   large driver; beyond that the condense step would need the
   distributed dendrogram of Santos et al., documented bound).

APPROXIMATION (documented, standard): the MST is built over the kNN
mutual-reachability graph, not the complete graph. With k = n-1 the
result is EXACT (pinned in tests against an independent quadratic
implementation); with small k it is the usual kNN-HDBSCAN
approximation (NVIDIA RAPIDS cuML makes the same trade). Disconnected
kNN components are joined with +inf edges, i.e. they can never be in
one cluster — exactly the semantics of "no density connection
observed".

Noise semantics match the reference's downstream use: label -1
(top2vec.py:1046-1062 treats -1 as noise when building topic
vectors); ``allow_single_cluster=False`` (the hdbscan default the
reference relies on), so the root is never selected.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack(col.to_numpy()).astype(np.float64)


#: finite stand-in for the infinite density of duplicate points
MAX_LAMBDA = 1e12


# ---------------------------------------------------------------------------
# 1. kNN graph
# ---------------------------------------------------------------------------
def knn_graph(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_cap: int = 2_000_000,
) -> DataFrame:
    """Exact euclidean kNN graph: (src, dst, dist, rank), rank 1..k
    over OTHER points, ties broken by (dist, dst).

    Scale shape: the full (id, matrix) pair is broadcast once; each
    Arrow batch computes one matmul against it — narrow, no shuffle.
    Broadcast holds to ~10^6-10^7 rows x small dim (float32); past
    ``broadcast_cap`` use :func:`knn_graph_ivf` (bucketed candidates,
    no broadcast of the corpus)."""
    n_total = embeddings.count()
    if n_total > broadcast_cap:
        raise ValueError(
            f"knn_graph: {n_total} rows exceeds broadcast_cap="
            f"{broadcast_cap}; use knn_graph_ivf for the bucketed "
            "scale path"
        )
    base = embeddings.select(id_col, vec_col).collect()
    ids = np.asarray([r[id_col] for r in base], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.vstack([base[i][vec_col] for i in order]).astype(np.float64)
    norms = (mat * mat).sum(axis=1)
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast((ids, mat, norms))
    kk = int(k)

    def batch(pdfs):
        ids_, mat_, norms_ = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            q = _as_matrix(pdf[vec_col])
            qid = pdf[id_col].to_numpy().astype(np.int64)
            d2 = (
                (q * q).sum(axis=1)[:, None]
                + norms_[None, :]
                - 2.0 * (q @ mat_.T)
            )
            np.maximum(d2, 0.0, out=d2)
            srcs, dsts, dists, ranks = [], [], [], []
            take = min(kk + 1, d2.shape[1])
            for i in range(d2.shape[0]):
                row = d2[i]
                cand = np.argpartition(row, take - 1)[:take]
                # order by (dist, dst id), drop self
                dist = np.sqrt(row[cand])
                o = np.lexsort((ids_[cand], dist))
                cand, dist = cand[o], dist[o]
                keep = ids_[cand] != qid[i]
                cand, dist = cand[keep][:kk], dist[keep][:kk]
                m = cand.shape[0]
                srcs.append(np.full(m, qid[i], dtype=np.int64))
                dsts.append(ids_[cand])
                dists.append(dist)
                ranks.append(np.arange(1, m + 1, dtype=np.int32))
            if not srcs:
                continue
            yield pd.DataFrame(
                {
                    "src": np.concatenate(srcs),
                    "dst": np.concatenate(dsts),
                    "dist": np.concatenate(dists),
                    "rank": np.concatenate(ranks),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        batch, "src long, dst long, dist double, rank int"
    )


def knn_graph_ivf(
    embeddings: DataFrame,
    k: int,
    n_cells: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN graph without broadcasting the corpus — the
    10^9-row path. Euclidean k-means cells (trained on a driver
    sample), each point probes its ``n_probe`` nearest cells; per
    cell, one numpy block computes probe-queries x members distances
    and emits local top-k; a groupBy(src) merge keeps the global
    top-k. Shuffle volume: n * n_probe candidate-row-groups, never
    all-pairs. Recall rises with n_probe (n_probe=n_cells -> exact);
    measured recall in tests/test_hdbscan.py."""
    spark = embeddings.sparkSession
    n_total = embeddings.count()
    frac = min(1.0, (sample * 1.25) / max(n_total, 1))
    samp_df = embeddings.select(vec_col).sample(fraction=frac, seed=seed).limit(sample)
    samp = np.vstack([r[vec_col] for r in samp_df.collect()]).astype(np.float64)
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, samp.shape[0])
    cents = samp[rng.choice(samp.shape[0], size=n_cells, replace=False)]
    for _ in range(iters):
        d2 = ((samp[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(n_cells):
            m = samp[assign == c]
            if m.shape[0]:
                cents[c] = m.mean(axis=0)
    bc = spark.sparkContext.broadcast(cents)
    n_probe = min(n_probe, n_cells)

    def assign_and_probe(pdfs):
        c = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            m = _as_matrix(pdf[vec_col])
            d2 = (
                (m * m).sum(axis=1)[:, None]
                + (c * c).sum(axis=1)[None, :]
                - 2.0 * (m @ c.T)
            )
            near = np.argsort(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cell": near[:, 0].astype(np.int32),
                    "probes": [r.astype(int).tolist() for r in near[:, :n_probe]],
                }
            )

    vt = "double" if "double" in str(
        embeddings.schema[vec_col].dataType
    ).lower() else "float"
    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign_and_probe,
        f"{id_col} long, {vec_col} array<{vt}>, cell int, probes array<int>",
    )
    members = assigned.select(id_col, vec_col, "cell")
    probes = assigned.select(
        id_col, vec_col, F.explode("probes").alias("cell")
    )
    kk = int(k)

    def local_topk(key, qpdf, mpdf):
        if not len(qpdf) or not len(mpdf):
            return pd.DataFrame(
                {"src": [], "dst": [], "dist": []}
            ).astype({"src": np.int64, "dst": np.int64, "dist": np.float64})
        q = _as_matrix(qpdf[vec_col])
        m = _as_matrix(mpdf[vec_col])
        qid = qpdf[id_col].to_numpy().astype(np.int64)
        mid = mpdf[id_col].to_numpy().astype(np.int64)
        d2 = (
            (q * q).sum(axis=1)[:, None]
            + (m * m).sum(axis=1)[None, :]
            - 2.0 * (q @ m.T)
        )
        np.maximum(d2, 0.0, out=d2)
        take = min(kk + 1, d2.shape[1])
        out_s, out_d, out_w = [], [], []
        for i in range(d2.shape[0]):
            cand = np.argpartition(d2[i], take - 1)[:take]
            keep = mid[cand] != qid[i]
            cand = cand[keep][:kk]
            out_s.append(np.full(cand.shape[0], qid[i], dtype=np.int64))
            out_d.append(mid[cand])
            out_w.append(np.sqrt(d2[i][cand]))
        return pd.DataFrame(
            {
                "src": np.concatenate(out_s),
                "dst": np.concatenate(out_d),
                "dist": np.concatenate(out_w),
            }
        )

    local = probes.groupBy("cell").cogroup(members.groupBy("cell")).applyInPandas(
        local_topk, "src long, dst long, dist double"
    )
    # global merge: the same (src, dst) may surface from several
    # probed cells — distinct, then rank by (dist, dst). Repartition
    # by src FIRST: HashPartitioning(src) satisfies both the (src,
    # dst) dedup's clustered distribution (subset rule) and the
    # window's partitionBy(src), so the whole merge is ONE Exchange
    # instead of two back-to-back shuffles of the candidate set
    # (plan pinned in tests/test_hdbscan.py).
    from pyspark.sql import Window as W

    merged = (
        local.repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("src").orderBy(
                    F.col("dist").asc(), F.col("dst").asc()
                )
            ),
        )
    )
    return merged.filter(F.col("rank") <= kk)


# ---------------------------------------------------------------------------
# 2-3. core distances and mutual reachability
# ---------------------------------------------------------------------------
def core_distances(knn: DataFrame, min_samples: int) -> DataFrame:
    """(vec_id, core_dist): distance to the ``min_samples``-th nearest
    neighbor counting self (= kNN rank ``min_samples - 1``), the
    sklearn/hdbscan convention. Requires min_samples >= 2 and the
    graph built with k >= min_samples - 1."""
    if min_samples < 2:
        raise ValueError("min_samples must be >= 2")
    return knn.filter(F.col("rank") == min_samples - 1).select(
        F.col("src").alias("vec_id"), F.col("dist").alias("core_dist")
    )


def mutual_reachability(knn: DataFrame, core: DataFrame) -> DataFrame:
    """Symmetrized kNN edges with mutual-reachability weights:
    (src, dst, w) with src < dst, w = max(d, core_src, core_dst).
    Two broadcast-size-irrelevant equi-joins (core is n rows but the
    join keys are the edge endpoints — plain shuffled hash joins that
    AQE handles); the dedupe after symmetrization is a groupBy on the
    edge key."""
    e = knn.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        "dist",
    ).groupBy("a", "b").agg(F.min("dist").alias("dist"))
    ca = core.select(F.col("vec_id").alias("a"), F.col("core_dist").alias("core_a"))
    cb = core.select(F.col("vec_id").alias("b"), F.col("core_dist").alias("core_b"))
    return (
        e.join(ca, "a")
        .join(cb, "b")
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            F.greatest("dist", "core_a", "core_b").alias("w"),
        )
    )


# ---------------------------------------------------------------------------
# 4. distributed Boruvka MST
# ---------------------------------------------------------------------------
def _boruvka_rounds_local(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    find,
    parent: dict,
    accepted: set,
    mst: list,
    max_rounds: int,
) -> None:
    """Numpy emulation of the distributed Boruvka round with EXACTLY
    the same semantics — per-component min over the struct order
    (w, src, dst, other_comp), then driver acceptance in (w, src, dst)
    order through the SAME union-find — so finishing locally yields a
    bit-identical forest to continuing distributed (pinned by test).
    Mutates parent/accepted/mst in place."""
    for _ in range(max_rounds):
        uniq = np.unique(np.concatenate([src, dst]))
        if not uniq.shape[0]:
            return
        roots = np.fromiter(
            (find(int(v)) for v in uniq), dtype=np.int64, count=uniq.shape[0]
        )
        csrc = roots[np.searchsorted(uniq, src)]
        cdst = roots[np.searchsorted(uniq, dst)]
        cross = csrc != cdst
        if not cross.any():
            return
        src, dst, w = src[cross], dst[cross], w[cross]
        csrc, cdst = csrc[cross], cdst[cross]
        # both directions, like the distributed union of (csrc, cdst)
        c = np.concatenate([csrc, cdst])
        ww = np.concatenate([w, w])
        ss = np.concatenate([src, src])
        dd = np.concatenate([dst, dst])
        oc = np.concatenate([cdst, csrc])
        # group by c, min struct (w, src, dst, oc) per group
        order = np.lexsort((oc, dd, ss, ww, c))
        c_sorted = c[order]
        first = np.ones(c_sorted.shape[0], dtype=bool)
        first[1:] = c_sorted[1:] != c_sorted[:-1]
        sel = order[first]
        mins = sorted(
            zip(
                ww[sel].tolist(),
                ss[sel].tolist(),
                dd[sel].tolist(),
                c[sel].tolist(),
                oc[sel].tolist(),
            )
        )
        for wv, sv, dv, cv, ocv in mins:
            ra, rb = find(int(cv)), find(int(ocv))
            if ra == rb:
                continue
            key = (int(sv), int(dv))
            if key not in accepted:
                accepted.add(key)
                mst.append((key[0], key[1], float(wv)))
            parent[max(ra, rb)] = min(ra, rb)


def boruvka_mst(
    edges: DataFrame,
    max_rounds: int = 64,
    driver_edge_cap: int = 500_000,
) -> np.ndarray:
    """Minimum spanning forest of an undirected weighted edge
    DataFrame (src, dst, w) via distributed Boruvka.

    Per round: join edges to the component map on both endpoints,
    drop intra-component edges, take each component's minimum
    incident edge (deterministic struct order (w, src, dst)), collect
    those <= #components rows, union-find them on the driver, and
    broadcast the merge map back. Components at least halve per
    round -> O(log n) rounds. Edge ties are safe: the cut property
    holds for ANY minimal crossing edge and the union-find acceptance
    can never close a cycle.

    Hybrid tail finish: the surviving crossing-edge set shrinks
    geometrically while every distributed round still costs a fixed
    ~3 Spark jobs — the classic iterative-algorithm tail. Once the
    live edge count fits under ``driver_edge_cap`` (rows of 24 bytes;
    the same O(n) driver bound the condense stage already accepts),
    the remaining rounds run as a numpy emulation with identical
    round semantics (:func:`_boruvka_rounds_local`), producing a
    bit-identical forest (pinned by test against cap=0). Set
    ``driver_edge_cap=0`` to force the pure-distributed path.

    Returns the forest as a (m, 3) float ndarray [src, dst, w] — the
    driver-side bound is the n-1 MST edges (documented in the module
    docstring)."""
    spark = edges.sparkSession
    edges = edges.select("src", "dst", "w").persist()
    comp = (
        edges.select(F.col("src").alias("vec_id"))
        .union(edges.select("dst"))
        .distinct()
        .select("vec_id", F.col("vec_id").alias("comp"))
        .localCheckpoint()
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    mst: list[tuple[int, int, float]] = []
    accepted: set[tuple[int, int]] = set()
    live = edges
    live_count = edges.count()
    for _ in range(max_rounds):
        if driver_edge_cap and live_count <= driver_edge_cap:
            pdf = live.select("src", "dst", "w").toPandas()
            _boruvka_rounds_local(
                pdf["src"].to_numpy(np.int64),
                pdf["dst"].to_numpy(np.int64),
                pdf["w"].to_numpy(np.float64),
                find,
                parent,
                accepted,
                mst,
                max_rounds,
            )
            break
        cs = comp.select(F.col("vec_id").alias("src"), F.col("comp").alias("csrc"))
        cd = comp.select(F.col("vec_id").alias("dst"), F.col("comp").alias("cdst"))
        e = (
            live.join(cs, "src")
            .join(cd, "dst")
            .filter(F.col("csrc") != F.col("cdst"))
            .persist()
        )
        inc = e.select(
            F.col("csrc").alias("c"),
            F.struct("w", "src", "dst", F.col("cdst").alias("oc")).alias("edge"),
        ).union(
            e.select(
                F.col("cdst").alias("c"),
                F.struct("w", "src", "dst", F.col("csrc").alias("oc")),
            )
        )
        mins = inc.groupBy("c").agg(F.min("edge").alias("m")).collect()
        if not mins:
            e.unpersist()
            break
        # deterministic processing order -> deterministic forest
        mins.sort(key=lambda r: (r["m"]["w"], r["m"]["src"], r["m"]["dst"]))
        changed: set[int] = set()
        for r in mins:
            m = r["m"]
            ra, rb = find(int(r["c"])), find(int(m["oc"]))
            if ra == rb:
                continue
            key = (int(m["src"]), int(m["dst"]))
            if key not in accepted:
                accepted.add(key)
                mst.append((key[0], key[1], float(m["w"])))
            parent[max(ra, rb)] = min(ra, rb)
            changed.add(ra)
            changed.add(rb)
        remap = [(int(c), int(find(c))) for c in changed]
        mdf = spark.createDataFrame(remap, "old long, new long")
        comp = (
            comp.join(
                F.broadcast(mdf), comp["comp"] == mdf["old"], "left"
            )
            .select("vec_id", F.coalesce("new", "comp").alias("comp"))
            .localCheckpoint()
        )
        # edges intra-component under the OLD map stay intra under the
        # new (components only merge) — e is a safe, shrinking carry
        nxt = e.select("src", "dst", "w").persist()
        live_count = nxt.count()
        live.unpersist()
        e.unpersist()
        live = nxt
    live.unpersist()
    edges.unpersist()
    if not mst:
        return np.empty((0, 3), dtype=np.float64)
    return np.asarray(mst, dtype=np.float64)


# ---------------------------------------------------------------------------
# 5. driver-side dendrogram -> condensed tree -> EOM labels
# ---------------------------------------------------------------------------
@dataclass
class CondensedTree:
    parent: np.ndarray      # int64
    child: np.ndarray       # int64 (cluster id >= n, or point id < n)
    lam: np.ndarray         # float64 lambda at which child leaves parent
    child_size: np.ndarray  # int64
    n_points: int


def _single_linkage(mst: np.ndarray, point_ids: np.ndarray) -> np.ndarray:
    """scipy-style linkage over the minimum spanning forest. Forest
    roots are joined with +inf merges (never density-connected).
    Returns (n-1, 4): [left_node, right_node, dist, size] with
    original points remapped to 0..n-1 in ``point_ids`` order."""
    n = point_ids.shape[0]
    idx = {int(p): i for i, p in enumerate(point_ids)}
    order = np.lexsort((mst[:, 1], mst[:, 0], mst[:, 2])) if len(mst) else []
    parent = list(range(2 * n - 1))
    node_of_root = list(range(n))  # current dendrogram node per uf root
    size = [1] * n + [0] * (n - 1)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    merges = np.zeros((n - 1, 4), dtype=np.float64)
    nxt = n
    for ei in order:
        a, b, w = int(mst[ei, 0]), int(mst[ei, 1]), float(mst[ei, 2])
        ra, rb = find(idx[a]), find(idx[b])
        if ra == rb:
            continue
        la, lb = node_of_root[ra], node_of_root[rb]
        merges[nxt - n] = (la, lb, w, size[la] + size[lb])
        size[nxt] = size[la] + size[lb]
        parent[ra] = rb
        node_of_root[rb] = nxt
        nxt += 1
    # join remaining forest roots at +inf
    roots = sorted({find(i) for i in range(n)})
    while len(roots) > 1:
        ra, rb = roots[0], roots[1]
        la, lb = node_of_root[ra], node_of_root[rb]
        merges[nxt - n] = (la, lb, math.inf, size[la] + size[lb])
        size[nxt] = size[la] + size[lb]
        parent[ra] = rb
        node_of_root[rb] = nxt
        nxt += 1
        roots = [rb] + roots[2:]
    return merges


def _condense(linkage: np.ndarray, n: int, min_cluster_size: int) -> CondensedTree:
    """Campello et al. condensed tree: clusters are the dendrogram
    branches that keep >= min_cluster_size points; smaller branches'
    points fall out at the lambda (=1/distance) of the split."""
    root = n + linkage.shape[0] - 1
    left = linkage[:, 0].astype(np.int64)
    right = linkage[:, 1].astype(np.int64)
    dist = linkage[:, 2]
    sz = linkage[:, 3].astype(np.int64)

    def node_size(x):
        return 1 if x < n else int(sz[x - n])

    def leaves(x):
        out, stack = [], [x]
        while stack:
            y = stack.pop()
            if y < n:
                out.append(y)
            else:
                stack.append(int(left[y - n]))
                stack.append(int(right[y - n]))
        return out

    P, C, L, S = [], [], [], []
    relabel = {root: n}
    next_label = n + 1
    stack = [root]
    while stack:
        node = stack.pop()
        if node < n:
            continue
        i = node - n
        # lambda = 1/distance; zero distances (duplicate points) are
        # clamped to a large finite density so stabilities stay
        # finite (documented convention); +inf distances are the
        # forest joins -> lambda 0 (never density-connected)
        if not math.isfinite(dist[i]):
            lam = 0.0
        elif dist[i] > 0:
            lam = 1.0 / dist[i]
        else:
            lam = MAX_LAMBDA
        l, r = int(left[i]), int(right[i])
        ls, rs = node_size(l), node_size(r)
        cl = relabel[node]
        if ls >= min_cluster_size and rs >= min_cluster_size:
            for ch, chs in ((l, ls), (r, rs)):
                relabel[ch] = next_label
                P.append(cl)
                C.append(next_label)
                L.append(lam)
                S.append(chs)
                next_label += 1
                stack.append(ch)
        elif ls < min_cluster_size and rs < min_cluster_size:
            for ch in (l, r):
                for p in leaves(ch):
                    P.append(cl)
                    C.append(p)
                    L.append(lam)
                    S.append(1)
        else:
            big, small = (l, r) if ls >= min_cluster_size else (r, l)
            relabel[big] = cl
            stack.append(big)
            for p in leaves(small):
                P.append(cl)
                C.append(p)
                L.append(lam)
                S.append(1)
    return CondensedTree(
        parent=np.asarray(P, dtype=np.int64),
        child=np.asarray(C, dtype=np.int64),
        lam=np.asarray(L, dtype=np.float64),
        child_size=np.asarray(S, dtype=np.int64),
        n_points=n,
    )


def _stability(tree: CondensedTree) -> dict[int, float]:
    """hdbscan compute_stability: sum over children of
    (lambda_child - lambda_birth(cluster)) * child_size, with
    lambda_birth(root) = 0."""
    birth: dict[int, float] = {int(tree.parent.min()): 0.0}
    for p, c, lam in zip(tree.parent, tree.child, tree.lam):
        if c >= tree.n_points:
            birth[int(c)] = float(lam)
    stab: dict[int, float] = {}
    for p, lam, s in zip(tree.parent, tree.lam, tree.child_size):
        p = int(p)
        stab[p] = stab.get(p, 0.0) + (float(lam) - birth[p]) * int(s)
    return stab


def _eom_select(tree: CondensedTree) -> set[int]:
    """Excess-of-mass selection, allow_single_cluster=False: process
    cluster nodes leaves-up; a cluster is selected when its own
    stability beats the sum of its subtree's selected stabilities.
    The root is never selectable."""
    stab = _stability(tree)
    children: dict[int, list[int]] = {}
    for p, c in zip(tree.parent, tree.child):
        if c >= tree.n_points:
            children.setdefault(int(p), []).append(int(c))
    root = int(tree.parent.min())
    clusters = sorted(stab.keys(), reverse=True)  # children have larger ids
    selected: set[int] = set()
    propagated: dict[int, float] = {}
    for c in clusters:
        sub = sum(propagated.get(ch, 0.0) for ch in children.get(c, []))
        if c == root:
            propagated[c] = sub
            continue
        if stab.get(c, 0.0) >= sub and children.get(c):
            # tie goes to the parent like hdbscan (>=); leaf clusters
            # (no child clusters) are always selected at this point
            selected.add(c)
            # deselect descendants
            stack = list(children.get(c, []))
            while stack:
                d = stack.pop()
                selected.discard(d)
                stack.extend(children.get(d, []))
            propagated[c] = stab.get(c, 0.0)
        elif not children.get(c):
            selected.add(c)
            propagated[c] = stab.get(c, 0.0)
        else:
            propagated[c] = sub
    return selected


def labels_from_condensed(tree: CondensedTree) -> tuple[np.ndarray, dict]:
    """Point labels per hdbscan do_labelling: a point belongs to the
    FIRST selected cluster on its fall-out parent chain, else noise
    (-1). Cluster ids are renumbered deterministically by
    (size desc, min point id) -> 0..C-1. Returns (labels array indexed
    by point 0..n-1, {condensed_cluster_id: final_label})."""
    selected = _eom_select(tree)
    cparent: dict[int, int] = {}
    for p, c in zip(tree.parent, tree.child):
        if c >= tree.n_points:
            cparent[int(c)] = int(p)
    labels = np.full(tree.n_points, -1, dtype=np.int64)
    owner: dict[int, int] = {}  # condensed cluster -> selected ancestor (or -1)

    def sel_anc(c: int) -> int:
        seen = []
        while True:
            if c in owner:
                a = owner[c]
                break
            if c in selected:
                a = c
                break
            if c not in cparent:
                a = -1
                break
            seen.append(c)
            c = cparent[c]
        for s in seen:
            owner[s] = a
        return a

    members: dict[int, list[int]] = {}
    for p, c in zip(tree.parent, tree.child):
        if c < tree.n_points:
            a = sel_anc(int(p))
            if a != -1:
                members.setdefault(a, []).append(int(c))
    ranked = sorted(
        members.items(), key=lambda kv: (-len(kv[1]), min(kv[1]))
    )
    mapping: dict[int, int] = {}
    for i, (cid, pts) in enumerate(ranked):
        mapping[cid] = i
        labels[np.asarray(pts, dtype=np.int64)] = i
    return labels, mapping


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------
def hdbscan_labels(
    embeddings: DataFrame,
    min_cluster_size: int = 15,
    min_samples: int | None = None,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    knn: DataFrame | None = None,
) -> DataFrame:
    """Full distributed HDBSCAN: (vec_id, label) with -1 noise.

    ``min_samples`` defaults to ``min_cluster_size`` (the hdbscan
    library default the reference inherits); ``k`` (kNN graph width)
    defaults to max(min_samples, 16). Pass a prebuilt ``knn`` edge
    table (e.g. from :func:`knn_graph_ivf`) to choose the scale path;
    default is the exact broadcast kernel."""
    if min_cluster_size < 2:
        raise ValueError("min_cluster_size must be >= 2")
    if min_samples is None:
        min_samples = min_cluster_size
    if k is None:
        k = max(min_samples, 16)
    if k < min_samples - 1:
        raise ValueError("k must be >= min_samples - 1")
    spark = embeddings.sparkSession
    if knn is None:
        knn = knn_graph(embeddings, k, id_col=id_col, vec_col=vec_col)
    knn = knn.persist()
    core = core_distances(knn, min_samples)
    edges = mutual_reachability(knn, core)
    mst = boruvka_mst(edges)
    knn.unpersist()
    point_ids = np.sort(
        np.asarray(
            [r[0] for r in embeddings.select(id_col).collect()], dtype=np.int64
        )
    )
    n = point_ids.shape[0]
    if n < 2 or n < 2 * min_cluster_size:
        return spark.createDataFrame(
            [(int(p), -1) for p in point_ids], f"{id_col} long, label int"
        )
    linkage = _single_linkage(mst, point_ids)
    tree = _condense(linkage, n, min_cluster_size)
    labels, _ = labels_from_condensed(tree)
    # native-typed payload + explicit schema: numpy-dtype columns ride
    # arrow fine here, but the non-arrow createDataFrame fallback on
    # older pyspark rejects np.generic values (the class of bug that
    # cost umap_cluster_recovery in r05)
    pdf = pd.DataFrame(
        {id_col: point_ids.tolist(), "label": labels.astype(np.int32).tolist()}
    )
    return spark.createDataFrame(pdf, f"{id_col} long, label int")
