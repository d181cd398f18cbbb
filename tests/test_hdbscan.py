"""Distributed HDBSCAN (operators/hdbscan.py).

The test oracle is an INDEPENDENT quadratic implementation of
Campello et al. 2013 written below from the definitions (complete
mutual-reachability matrix, Prim MST, recursive condense + EOM) —
structurally different code from the operator's union-find/iterative
version, so shared-bug risk is low. With k = n-1 the distributed
kNN-graph variant is exact and must match it label-for-label."""

from __future__ import annotations

import math

import numpy as np
import pytest

from top2vec_spark.operators.hdbscan import (
    MAX_LAMBDA,
    boruvka_mst,
    core_distances,
    hdbscan_labels,
    knn_graph,
    knn_graph_ivf,
    mutual_reachability,
)


# ---------------------------------------------------------------------------
# independent quadratic reference implementation
# ---------------------------------------------------------------------------
class _Node:
    __slots__ = ("members", "dist", "children")

    def __init__(self, members, dist=0.0, children=()):
        self.members = members
        self.dist = dist
        self.children = list(children)


def _exact_hdbscan(x: np.ndarray, min_cluster_size: int, min_samples: int):
    n = x.shape[0]
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    D = np.sqrt(np.maximum(d2, 0.0))
    # core = min_samples-th NN counting self (column 0 of sorted row)
    core = np.sort(D, axis=1)[:, min_samples - 1]
    MR = np.maximum(np.maximum(core[:, None], core[None, :]), D)

    # Prim MST over the complete mutual-reachability graph
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    best = MR[0].copy()
    src = np.zeros(n, dtype=np.int64)
    edges = []
    for _ in range(n - 1):
        cand = np.where(~in_tree)[0]
        j = cand[np.argmin(best[cand])]
        edges.append((int(src[j]), int(j), float(best[j])))
        in_tree[j] = True
        upd = MR[j] < best
        upd &= ~in_tree
        best[upd] = MR[j][upd]
        src[upd] = j

    # dendrogram bottom-up
    root_of = {i: _Node(frozenset([i])) for i in range(n)}
    point_root = list(range(n))

    def find(p):
        while point_root[p] != p:
            point_root[p] = point_root[point_root[p]]
            p = point_root[p]
        return p

    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        na, nb = root_of[ra], root_of[rb]
        merged = _Node(na.members | nb.members, w, (na, nb))
        point_root[ra] = rb
        root_of[rb] = merged
    root = root_of[find(0)]

    # recursive condense
    rows = []  # (parent_cluster, child: cluster-or-point, lam, size)
    label_counter = [n]

    def lam_of(dist):
        if not math.isfinite(dist):
            return 0.0
        return 1.0 / dist if dist > 0 else MAX_LAMBDA

    def walk(node, cluster):
        if not node.children:
            return
        lam = lam_of(node.dist)
        l, r = node.children
        ls, rs = len(l.members), len(r.members)
        if ls >= min_cluster_size and rs >= min_cluster_size:
            for ch in (l, r):
                label_counter[0] += 1
                lbl = label_counter[0]
                rows.append((cluster, ("c", lbl), lam, len(ch.members)))
                walk(ch, lbl)
        elif ls < min_cluster_size and rs < min_cluster_size:
            for ch in (l, r):
                for p in sorted(ch.members):
                    rows.append((cluster, ("p", p), lam, 1))
        else:
            big, small = (l, r) if ls >= min_cluster_size else (r, l)
            for p in sorted(small.members):
                rows.append((cluster, ("p", p), lam, 1))
            walk(big, cluster)

    root_label = n
    walk(root, root_label)

    # stabilities
    birth = {root_label: 0.0}
    for par, ch, lam, size in rows:
        if ch[0] == "c":
            birth[ch[1]] = lam
    stab = {}
    for par, ch, lam, size in rows:
        stab[par] = stab.get(par, 0.0) + (lam - birth[par]) * size
    kids = {}
    for par, ch, lam, size in rows:
        if ch[0] == "c":
            kids.setdefault(par, []).append(ch[1])

    # recursive EOM, root excluded
    def eom(c):
        sub = [eom(k) for k in kids.get(c, [])]
        sub_stab = sum(s for s, _ in sub)
        sub_sel = set().union(*(s for _, s in sub)) if sub else set()
        if c == root_label:
            return sub_stab, sub_sel
        if stab.get(c, 0.0) >= sub_stab:
            return stab.get(c, 0.0), {c}
        return sub_stab, sub_sel

    _, selected = eom(root_label)

    # labels: first selected ancestor of the fall-out parent
    cpar = {ch[1]: par for par, ch, lam, size in rows if ch[0] == "c"}
    labels = np.full(n, -1, dtype=np.int64)
    for par, ch, lam, size in rows:
        if ch[0] != "p":
            continue
        c = par
        while c is not None:
            if c in selected:
                labels[ch[1]] = c
                break
            c = cpar.get(c)
    return labels


def _canon(labels: np.ndarray) -> np.ndarray:
    """Renumber cluster ids by (size desc, min member) -> 0..C-1."""
    out = np.full(labels.shape[0], -1, dtype=np.int64)
    clusters = {}
    for i, l in enumerate(labels):
        if l != -1:
            clusters.setdefault(l, []).append(i)
    ranked = sorted(clusters.items(), key=lambda kv: (-len(kv[1]), min(kv[1])))
    for new, (_, pts) in enumerate(ranked):
        out[np.asarray(pts)] = new
    return out


def _ari(a: np.ndarray, b: np.ndarray) -> float:
    """Adjusted Rand index (noise -1 treated as its own cluster)."""
    from collections import Counter

    n = a.shape[0]
    pairs = Counter(zip(a.tolist(), b.tolist()))
    ca, cb = Counter(a.tolist()), Counter(b.tolist())

    def comb2(x):
        return x * (x - 1) / 2

    sum_ij = sum(comb2(v) for v in pairs.values())
    sum_a = sum(comb2(v) for v in ca.values())
    sum_b = sum(comb2(v) for v in cb.values())
    tot = comb2(n)
    exp = sum_a * sum_b / tot
    mx = (sum_a + sum_b) / 2
    return float((sum_ij - exp) / (mx - exp)) if mx != exp else 1.0


def _blobs(seed=11, n_per=40, n_noise=15, d=4):
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[0.0] * d, [10.0] + [0.0] * (d - 1), [0.0, 10.0] + [0.0] * (d - 2)]
    )
    pts = [c + rng.normal(scale=0.4, size=(n_per, d)) for c in centers]
    noise = rng.uniform(-30, 30, size=(n_noise, d))
    return np.vstack(pts + [noise])


def _df(spark, x, shift_ids=0):
    return spark.createDataFrame(
        [(int(i + shift_ids), [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(8)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------
def test_knn_graph_matches_numpy(spark):
    x = _blobs(seed=3, n_per=15, n_noise=5)
    df = _df(spark, x)
    k = 6
    got = knn_graph(df, k).collect()
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    D = np.sqrt(np.maximum(d2, 0.0))
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r)
    assert len(by_src) == x.shape[0]
    for s, rows in by_src.items():
        rows.sort(key=lambda r: r["rank"])
        order = np.lexsort((np.arange(x.shape[0]), D[s]))
        order = [int(o) for o in order if o != s][:k]
        assert [r["dst"] for r in rows] == order
        for r, o in zip(rows, order):
            assert r["dist"] == pytest.approx(D[s, o], rel=1e-12)


def test_core_distances_sklearn_convention(spark):
    x = _blobs(seed=5, n_per=10, n_noise=0)
    df = _df(spark, x)
    ms = 4
    knn = knn_graph(df, 8)
    core = {r["vec_id"]: r["core_dist"] for r in core_distances(knn, ms).collect()}
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    D = np.sqrt(np.maximum(d2, 0.0))
    expect = np.sort(D, axis=1)[:, ms - 1]  # column 0 is self
    for i in range(x.shape[0]):
        assert core[i] == pytest.approx(expect[i], rel=1e-12)


def test_boruvka_equals_prim_weight_with_ties(spark):
    rng = np.random.default_rng(17)
    for seed in range(3):
        r = np.random.default_rng(seed)
        n = 30
        # spanning tree + extras, small integer weights force ties
        edges = [(i, int(r.integers(0, i)), float(r.integers(1, 5))) for i in range(1, n)]
        for _ in range(60):
            a, b = r.integers(0, n, size=2)
            if a != b:
                edges.append((int(min(a, b)), int(max(a, b)), float(r.integers(1, 5))))
        dedup = {}
        for a, b, w in edges:
            key = (min(a, b), max(a, b))
            dedup[key] = min(dedup.get(key, np.inf), w)
        edf = spark.createDataFrame(
            [(a, b, w) for (a, b), w in sorted(dedup.items())],
            "src long, dst long, w double",
        )
        mst = boruvka_mst(edf)
        assert mst.shape[0] == n - 1
        # Prim on the same graph
        W = np.full((n, n), np.inf)
        for (a, b), w in dedup.items():
            W[a, b] = W[b, a] = w
        in_t = np.zeros(n, dtype=bool)
        in_t[0] = True
        best = W[0].copy()
        total = 0.0
        for _ in range(n - 1):
            cand = np.where(~in_t)[0]
            j = cand[np.argmin(best[cand])]
            total += best[j]
            in_t[j] = True
            best = np.minimum(best, W[j])
        assert mst[:, 2].sum() == pytest.approx(total, rel=1e-12)
    _ = rng  # noqa


def test_full_k_exactness_vs_independent_reference(spark):
    x = _blobs(seed=11)
    n = x.shape[0]
    mcs, ms = 10, 5
    df = _df(spark, x)
    got = hdbscan_labels(df, min_cluster_size=mcs, min_samples=ms, k=n - 1)
    got_arr = np.full(n, -2, dtype=np.int64)
    for r in got.collect():
        got_arr[r["vec_id"]] = r["label"]
    expect = _canon(_exact_hdbscan(x, mcs, ms))
    np.testing.assert_array_equal(got_arr, _canon(expect))
    # sanity on the fixture itself: 3 clusters, noise present
    assert set(expect) == {-1, 0, 1, 2}


def test_duplicate_points_exactness(spark):
    rng = np.random.default_rng(23)
    base = _blobs(seed=29, n_per=12, n_noise=6, d=3)
    x = np.vstack([base, base[:8]])  # exact duplicates
    n = x.shape[0]
    mcs, ms = 6, 3
    got = hdbscan_labels(_df(spark, x), min_cluster_size=mcs, min_samples=ms, k=n - 1)
    got_arr = np.full(n, -2, dtype=np.int64)
    for r in got.collect():
        got_arr[r["vec_id"]] = r["label"]
    expect = _canon(_exact_hdbscan(x, mcs, ms))
    np.testing.assert_array_equal(got_arr, expect)
    _ = rng


def test_knn_approximation_close_to_exact(spark):
    x = _blobs(seed=41, n_per=60, n_noise=20)
    n = x.shape[0]
    mcs, ms = 12, 5
    got = hdbscan_labels(_df(spark, x), min_cluster_size=mcs, min_samples=ms, k=20)
    got_arr = np.full(n, -2, dtype=np.int64)
    for r in got.collect():
        got_arr[r["vec_id"]] = r["label"]
    expect = _canon(_exact_hdbscan(x, mcs, ms))
    assert _ari(got_arr, expect) >= 0.9


def test_determinism(spark):
    x = _blobs(seed=53, n_per=25, n_noise=10)
    df = _df(spark, x)
    a = sorted(
        (r["vec_id"], r["label"])
        for r in hdbscan_labels(df, min_cluster_size=8, min_samples=4, k=16).collect()
    )
    b = sorted(
        (r["vec_id"], r["label"])
        for r in hdbscan_labels(df, min_cluster_size=8, min_samples=4, k=16).collect()
    )
    assert a == b


def test_ivf_knn_recall_and_pipeline(spark):
    x = _blobs(seed=61, n_per=100, n_noise=30, d=6)
    df = _df(spark, x)
    k = 10
    exact = {
        (r["src"], r["dst"]) for r in knn_graph(df, k).collect()
    }
    appr = {
        (r["src"], r["dst"])
        for r in knn_graph_ivf(df, k, n_cells=12, n_probe=6).collect()
    }
    recall = len(exact & appr) / len(exact)
    assert recall >= 0.9
    # the approximate graph drives the full pipeline end-to-end
    knn = knn_graph_ivf(df, 16, n_cells=12, n_probe=6)
    got = hdbscan_labels(
        df, min_cluster_size=15, min_samples=5, k=16, knn=knn
    )
    got_arr = np.full(x.shape[0], -2, dtype=np.int64)
    for r in got.collect():
        got_arr[r["vec_id"]] = r["label"]
    expect = _canon(_exact_hdbscan(x, 15, 5))
    assert _ari(got_arr, expect) >= 0.85


def test_mutual_reachability_weights(spark):
    x = _blobs(seed=71, n_per=8, n_noise=0, d=3)
    df = _df(spark, x)
    knn = knn_graph(df, 5)
    core = core_distances(knn, 3)
    edges = mutual_reachability(knn, core).collect()
    cd = {r["vec_id"]: r["core_dist"] for r in core.collect()}
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    D = np.sqrt(np.maximum(d2, 0.0))
    assert edges
    for r in edges:
        assert r["src"] < r["dst"]
        expect = max(D[r["src"], r["dst"]], cd[r["src"]], cd[r["dst"]])
        assert r["w"] == pytest.approx(expect, rel=1e-12)


def test_nonclustered_input_is_all_noise(spark):
    # a single tight blob with allow_single_cluster=False semantics:
    # the root is never selected -> everything is noise (documented
    # hdbscan behavior)
    rng = np.random.default_rng(83)
    x = rng.normal(size=(60, 4))
    got = hdbscan_labels(_df(spark, x), min_cluster_size=25, min_samples=5, k=59)
    labels = {r["label"] for r in got.collect()}
    expect = set(_canon(_exact_hdbscan(x, 25, 5)))
    assert labels == expect  # reference agrees, typically {-1}


def test_small_input_guard(spark):
    x = np.eye(4)
    got = hdbscan_labels(_df(spark, x), min_cluster_size=5, min_samples=2, k=3)
    assert {r["label"] for r in got.collect()} == {-1}
    with pytest.raises(ValueError):
        hdbscan_labels(_df(spark, x), min_cluster_size=1)


def test_boruvka_hybrid_tail_bit_identical_to_distributed(spark):
    """The driver-finish tail (_boruvka_rounds_local) must produce a
    bit-identical forest to the pure-distributed rounds, including
    under heavy weight ties — same struct-min per component, same
    (w, src, dst) acceptance order, same union-find."""
    for seed in range(3):
        r = np.random.default_rng(seed + 40)
        n = 120
        edges = {}
        for i in range(1, n):
            edges[(int(r.integers(0, i)), i)] = float(r.integers(1, 4))
        for _ in range(400):
            a, b = (int(v) for v in r.integers(0, n, size=2))
            if a != b:
                k = (min(a, b), max(a, b))
                edges[k] = min(edges.get(k, np.inf), float(r.integers(1, 4)))
        edf = spark.createDataFrame(
            [(a, b, w) for (a, b), w in sorted(edges.items())],
            "src long, dst long, w double",
        ).persist()
        pure = boruvka_mst(edf, driver_edge_cap=0)
        hybrid_now = boruvka_mst(edf)  # cap >> edges: local from round 1
        # cap between: a few distributed rounds, then the local tail
        hybrid_mid = boruvka_mst(edf, driver_edge_cap=len(edges) // 3)
        np.testing.assert_array_equal(pure, hybrid_now)
        np.testing.assert_array_equal(pure, hybrid_mid)
        edf.unpersist()


def test_knn_ivf_merge_is_one_exchange(spark):
    """The global top-k merge after the per-cell cogroup must cost ONE
    Exchange (repartition by src serves both the (src, dst) dedup and
    the ranking window) — 3 Exchange nodes total: the two cogroup
    sides plus the merge."""
    import contextlib
    import io
    import re

    rng = np.random.default_rng(3)
    rows = [
        (int(i), (np.eye(8)[i % 4] * 5 + rng.normal(scale=0.1, size=8)).tolist())
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    knn = knn_graph_ivf(emb, 8, n_cells=8, n_probe=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        knn.explain("formatted")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), re.M))
    assert n_exchanges == 3
