"""Distributed UMAP — the reference's dimensionality reducer
(top2vec.py:1541-1551, `umap.UMAP(n_neighbors=15, n_components=5,
metric='cosine').fit(self.document_vectors)`), re-expressed for Spark
with umap-learn's published semantics (McInnes, Healy & Melville 2018)
rather than substituted by PCA.

Pipeline (each stage a composable operator):

1. kNN graph — reuses :func:`operators.hdbscan.knn_graph` (broadcast
   matmul, narrow) or :func:`knn_graph_ivf` (bucketed, beyond the
   broadcast cap). UMAP counts SELF as the first of ``n_neighbors``
   neighbors; these graphs exclude self, so every stage below treats a
   k-edge row set as n_neighbors = k+1.
2. smooth-kNN calibration + membership strengths
   (:func:`fuzzy_edges`) — umap-learn ``smooth_knn_dist`` exactly:
   rho = distance to the ``local_connectivity``-th nonzero neighbor
   (with fractional interpolation), sigma from a 64-iteration binary
   search driving ``sum_j exp(-max(d_j - rho, 0)/sigma)`` to
   ``log2(n_neighbors) * bandwidth`` (tolerance 1e-5), then the
   MIN_K_DIST_SCALE=1e-3 clamps against the row mean (rho > 0) or the
   GLOBAL mean distance (rho == 0).  Directed weight
   ``w = exp(-max(d - rho, 0)/sigma)`` (1.0 when sigma == 0), the
   ``compute_membership_strengths`` formula.
   Execution: ONE Exchange — ``groupBy(src).collect_list`` then a
   mapInPandas kernel that pads each Arrow batch's neighbor lists
   into a (rows, k) matrix and runs the binary search VECTORIZED
   across all rows at once (no per-row Python loop).
3. fuzzy-set union symmetrization (:func:`symmetrize`) —
   ``w_sym = w_ij + w_ji - w_ij * w_ji`` (set_op_mix_ratio = 1.0, the
   umap default), a full-outer self-join on the flipped edge; the
   result keeps BOTH directions, mirroring umap's symmetric CSR whose
   optimizer visits (i, j) and (j, i) separately.
4. layout (:func:`embed_graph`) — cross-entropy gradient descent with
   umap's exact attractive/repulsive kernels on the low-dim curve
   ``1/(1 + a d^{2b})`` (a, b fit from (spread, min_dist) by
   Gauss-Newton least squares, :func:`find_ab_params`; defaults fit to
   a=1.577, b=0.895 like umap-learn's curve_fit), gradient components
   clipped to ±4, ``negative_sample_rate`` seeded negatives per
   directed edge moving only the head, learning rate decaying
   linearly from ``alpha`` to 0.

   Re-expression delta (documented, not hidden): umap-learn runs
   ASYNCHRONOUS per-edge SGD where edge e is visited every
   ``1/p_e`` epochs (p_e = w_e / w_max).  A faithful async schedule
   does not distribute; this operator runs the SYNCHRONOUS
   expectation of that schedule — every epoch, every directed edge
   contributes its attractive gradient (and its ``rate`` negative
   samples) scaled by p_e, and the per-point sums are applied at
   epoch end.  Same kernels, same clip, same decay; update ORDER
   differs, so coordinates differ from umap-learn run-for-run (as two
   umap-learn seeds differ from each other) while the manifold
   structure objective is the same.

   Two execution paths with IDENTICAL update semantics (pinned
   equal-to-1e-9 by tests/test_umap.py):
   - driver tail (default when n <= ``driver_point_cap``): the fuzzy
     graph — built distributed — collects to numpy ((src, dst, w)
     edge rows, the same O(n·k) driver bound HDBSCAN's condense tail
     accepts) and the epoch loop is vectorized ``np.add.at`` scatter;
   - distributed (beyond the cap, or ``optimize='distributed'``): per
     epoch two hash joins gather endpoint coordinates, one seeded
     hash join gathers negative-sample coordinates, one groupBy-sum
     scatters per-point gradients, ``localCheckpoint`` truncates the
     per-epoch lineage.  Cost: O(epochs) shuffles of the edge list —
     the honest price of synchronous distributed SGD; at 10^12 docs
     the practical recipe is the driver tail over a landmark sample
     + :func:`transform_points` for the rest, exactly umap-learn's
     own fit/transform split.

``metric='cosine'`` (the reference default) is handled as
L2-normalization followed by euclidean kNN — chord distance
``sqrt(2 - 2 cos)``, a strictly monotone map of cosine distance, so
the neighbor graph (and therefore rho's neighbor choice) is
IDENTICAL; the smooth-kNN calibration is scale-adaptive by
construction and absorbs the reparameterization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


# ---------------------------------------------------------------------------
# a, b curve fit (umap.umap_.find_ab_params without scipy)
# ---------------------------------------------------------------------------

def find_ab_params(spread: float = 1.0, min_dist: float = 0.1) -> tuple[float, float]:
    """Fit (a, b) of the low-dim kernel ``1/(1 + a x^{2b})`` to the
    target curve ``y = 1 for x < min_dist, exp(-(x - min_dist)/spread)
    otherwise`` — umap-learn's ``find_ab_params`` (scipy
    ``curve_fit``), reimplemented as damped Gauss-Newton least squares
    on the same 300-point grid over [0, 3*spread].  Defaults converge
    to a=1.5769, b=0.8951 (umap-learn's published values)."""
    xv = np.linspace(0.0, spread * 3.0, 300)
    yv = np.zeros_like(xv)
    yv[xv < min_dist] = 1.0
    yv[xv >= min_dist] = np.exp(-(xv[xv >= min_dist] - min_dist) / spread)

    a, b = 1.0, 1.0
    lam = 1e-3
    x = np.maximum(xv, 1e-12)  # avoid 0^b derivative singularities

    def resid(a_, b_):
        return 1.0 / (1.0 + a_ * x ** (2.0 * b_)) - yv

    r = resid(a, b)
    cost = float(r @ r)
    for _ in range(200):
        x2b = x ** (2.0 * b)
        denom = (1.0 + a * x2b) ** 2
        # d/da, d/db of 1/(1 + a x^{2b})
        ja = -x2b / denom
        jb = -2.0 * a * x2b * np.log(x) / denom
        jtj = np.array([[ja @ ja, ja @ jb], [ja @ jb, jb @ jb]])
        jtr = np.array([ja @ r, jb @ r])
        try:
            step = np.linalg.solve(jtj + lam * np.diag(np.diag(jtj)), -jtr)
        except np.linalg.LinAlgError:  # pragma: no cover
            break
        a2, b2 = a + step[0], b + step[1]
        if a2 <= 0 or b2 <= 0:
            lam *= 10.0
            continue
        r2 = resid(a2, b2)
        c2 = float(r2 @ r2)
        if c2 < cost:
            a, b, r, lam = a2, b2, r2, lam * 0.5
            if abs(cost - c2) < 1e-14:
                cost = c2
                break
            cost = c2
        else:
            lam *= 10.0
            if lam > 1e8:
                break
    return float(a), float(b)


# ---------------------------------------------------------------------------
# smooth-kNN calibration + membership strengths
# ---------------------------------------------------------------------------

def _smooth_knn_batch(
    dmat: np.ndarray,
    mask: np.ndarray,
    n_neighbors: int,
    mean_all: float,
    local_connectivity: float,
    bandwidth: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized umap ``smooth_knn_dist`` over a (rows, k) padded
    distance matrix (``mask`` marks real entries).  Distances are the
    k NON-SELF neighbors; the implicit self at distance 0 makes the
    row n_neighbors = k+1 wide, exactly umap's layout where the psum
    loop skips index 0 and the row mean includes it."""
    rows = dmat.shape[0]
    target = np.log2(float(n_neighbors)) * bandwidth

    d = np.where(mask, dmat, 0.0)
    counts = mask.sum(axis=1)
    # rho: local_connectivity-th nonzero distance with interpolation
    rho = np.zeros(rows)
    nz_mask = mask & (dmat > 0.0)
    nz_counts = nz_mask.sum(axis=1)
    nz_sorted = np.where(nz_mask, dmat, np.inf)
    nz_sorted = np.sort(nz_sorted, axis=1)  # nonzero dists first, inf-padded
    index = int(np.floor(local_connectivity))
    interpolation = local_connectivity - index
    enough = nz_counts >= local_connectivity
    if index > 0:
        base = nz_sorted[:, index - 1]
        rho = np.where(enough, base, rho)
        if interpolation > SMOOTH_K_TOLERANCE:
            nxt = nz_sorted[:, min(index, nz_sorted.shape[1] - 1)]
            ok = enough & np.isfinite(nxt)
            step = interpolation * (np.where(ok, nxt, 0.0) - np.where(ok, base, 0.0))
            rho = np.where(ok, rho + step, rho)
    else:
        rho = np.where(enough, interpolation * nz_sorted[:, 0], rho)
    some = (~enough) & (nz_counts > 0)
    max_nz = np.where(nz_mask, dmat, -np.inf).max(axis=1)
    rho = np.where(some, max_nz, rho)

    # 64-iteration binary search for sigma
    lo = np.zeros(rows)
    hi = np.full(rows, np.inf)
    mid = np.ones(rows)
    done = np.zeros(rows, dtype=bool)
    for _ in range(64):
        gap = np.where(mask, dmat - rho[:, None], 0.0)
        with np.errstate(over="ignore", under="ignore"):
            terms = np.where(gap > 0.0, np.exp(-gap / mid[:, None]), 1.0)
        psum = np.where(mask, terms, 0.0).sum(axis=1)
        newly = np.abs(psum - target) < SMOOTH_K_TOLERANCE
        done |= newly
        if done.all():
            break
        shrink = (psum > target) & ~done
        hi = np.where(shrink, mid, hi)
        lo = np.where((~shrink) & ~done, mid, lo)
        mid_next = np.where(
            shrink,
            (lo + hi) / 2.0,
            np.where(np.isinf(hi), mid * 2.0, (lo + hi) / 2.0),
        )
        mid = np.where(done, mid, mid_next)
    sigma = mid

    # MIN_K_DIST_SCALE clamps; row mean includes the implicit self 0
    mean_ith = d.sum(axis=1) / (counts + 1)
    floor_pos = MIN_K_DIST_SCALE * mean_ith
    floor_zero = MIN_K_DIST_SCALE * mean_all
    sigma = np.where(rho > 0.0, np.maximum(sigma, floor_pos), sigma)
    sigma = np.where(rho <= 0.0, np.maximum(sigma, floor_zero), sigma)
    return rho, sigma


def fuzzy_edges(
    knn: DataFrame,
    n_neighbors: int,
    local_connectivity: float = 1.0,
    bandwidth: float = 1.0,
) -> DataFrame:
    """Directed fuzzy-membership edges (src, dst, w, rho, sigma) from
    a (src, dst, dist, rank) kNN table with k = n_neighbors-1 non-self
    edges per src.  ONE Exchange (groupBy src); the calibration runs
    vectorized across every src in an Arrow batch."""
    # global mean distance over the implicit (k+1)-wide rows incl. the
    # self zeros — umap's np.mean(distances) for the rho==0 clamp
    g = knn.agg(
        F.sum("dist").alias("s"), F.count("dist").alias("c"),
        F.countDistinct("src").alias("n"),
    ).collect()[0]
    if g["c"] is None or g["c"] == 0:
        raise ValueError("fuzzy_edges: empty kNN graph")
    mean_all = float(g["s"]) / (float(g["n"]) * float(n_neighbors))

    grouped = knn.groupBy("src").agg(
        F.sort_array(F.collect_list(F.struct("rank", "dist", "dst"))).alias("nbrs")
    )

    out_schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
            T.StructField("w", T.DoubleType()),
            T.StructField("rho", T.DoubleType()),
            T.StructField("sigma", T.DoubleType()),
        ]
    )

    lc, bw, nn = float(local_connectivity), float(bandwidth), int(n_neighbors)

    def kernel(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            lists = pdf["nbrs"].tolist()
            rows = len(lists)
            kmax = max(len(l) for l in lists)
            dmat = np.zeros((rows, kmax))
            dsts = np.zeros((rows, kmax), dtype=np.int64)
            mask = np.zeros((rows, kmax), dtype=bool)
            for i, lst in enumerate(lists):
                m = len(lst)
                dmat[i, :m] = [e["dist"] for e in lst]
                dsts[i, :m] = [e["dst"] for e in lst]
                mask[i, :m] = True
            rho, sigma = _smooth_knn_batch(dmat, mask, nn, mean_all, lc, bw)
            gap = dmat - rho[:, None]
            with np.errstate(over="ignore", under="ignore"):
                w = np.where(
                    (gap <= 0.0) | (sigma[:, None] == 0.0),
                    1.0,
                    np.exp(-np.maximum(gap, 0.0) / np.maximum(sigma[:, None], 1e-300)),
                )
            srcs = pdf["src"].to_numpy().astype(np.int64)
            sel = mask.ravel()
            yield pd.DataFrame(
                {
                    "src": np.repeat(srcs, kmax)[sel],
                    "dst": dsts.ravel()[sel],
                    "w": w.ravel()[sel],
                    "rho": np.repeat(rho, kmax)[sel],
                    "sigma": np.repeat(sigma, kmax)[sel],
                }
            )

    return grouped.mapInPandas(kernel, out_schema)


def symmetrize(directed: DataFrame, set_op_mix_ratio: float = 1.0) -> DataFrame:
    """Fuzzy-set union ``w + w' - w*w'`` (mixed toward intersection
    ``w*w'`` when ``set_op_mix_ratio < 1``, umap's formula) via a
    full-outer self-join on the flipped edge.  Returns BOTH directions
    of every surviving pair, like umap's symmetric sparse matrix."""
    a = directed.select("src", "dst", F.col("w").alias("w_a"))
    b = directed.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w").alias("w_b")
    )
    mix = float(set_op_mix_ratio)
    j = a.join(b, ["src", "dst"], "full_outer").select(
        "src",
        "dst",
        (F.coalesce("w_a", F.lit(0.0)).alias("wa")),
        (F.coalesce("w_b", F.lit(0.0)).alias("wb")),
    )
    prod = F.col("wa") * F.col("wb")
    uni = F.col("wa") + F.col("wb") - prod
    return j.select(
        "src", "dst", (F.lit(mix) * uni + F.lit(1.0 - mix) * prod).alias("w")
    ).filter(F.col("w") > 0.0)


# ---------------------------------------------------------------------------
# layout optimization
# ---------------------------------------------------------------------------

def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _neg_indices(
    head_idx: np.ndarray, epoch: int, s: int, seed: int, n: int
) -> np.ndarray:
    """Deterministic negative-sample index per (head, epoch, s) —
    splitmix64 finalizer over a distinct odd-multiplier combination,
    identical bits on the driver and inside every executor kernel."""
    z = head_idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    z ^= np.uint64((epoch * 2654435761 + s * 40503 + seed * 7919) & 0xFFFFFFFFFFFFFFFF)
    return (_mix64(z) % np.uint64(n)).astype(np.int64)


def _epoch_updates(
    y: np.ndarray,
    heads: np.ndarray,
    tails: np.ndarray,
    p: np.ndarray,
    epoch: int,
    a: float,
    b: float,
    gamma: float,
    negative_sample_rate: int,
    seed: int,
) -> np.ndarray:
    """One synchronous epoch's per-point updates — THE update rule,
    shared verbatim by the driver tail and (computed per
    partition-of-edges, then reduced) the distributed path.

    Each point's accumulated gradient is normalized by its total
    contribution weight (sum of the p_e of every edge/negative
    touching it), making the applied move the WEIGHTED-MEAN umap
    step for that point rather than the raw sum.  The raw sum — all
    of a point's edge steps evaluated at one stale position — is the
    textbook synchronous-GD overshoot: a 28-edge boundary point would
    move up to 28x a single clipped step and oscillate (umap's async
    loop re-evaluates after every step, so it never sees this).  The
    mean keeps every epoch's move within one clipped umap step,
    trading step count for stability; the direction field and fixed
    points are unchanged."""
    n = y.shape[0]
    upd = np.zeros_like(y)
    wsum = np.zeros(n)

    d = y[heads] - y[tails]
    dist2 = (d * d).sum(axis=1)
    coeff = np.zeros_like(dist2)
    pos = dist2 > 0.0
    coeff[pos] = (-2.0 * a * b * dist2[pos] ** (b - 1.0)) / (
        a * dist2[pos] ** b + 1.0
    )
    g = np.clip(coeff[:, None] * d, -4.0, 4.0) * p[:, None]
    np.add.at(upd, heads, g)
    np.add.at(upd, tails, -g)
    np.add.at(wsum, heads, p)
    np.add.at(wsum, tails, p)

    for s in range(negative_sample_rate):
        negs = _neg_indices(heads, epoch, s, seed, n)
        live = negs != heads  # umap skips self-negatives
        if not live.any():
            continue
        h, k = heads[live], negs[live]
        dn = y[h] - y[k]
        dist2n = (dn * dn).sum(axis=1)
        cn = np.zeros_like(dist2n)
        posn = dist2n > 0.0
        cn[posn] = (2.0 * gamma * b) / (
            (0.001 + dist2n[posn]) * (a * dist2n[posn] ** b + 1.0)
        )
        gn = np.where(
            posn[:, None], np.clip(cn[:, None] * dn, -4.0, 4.0), 4.0
        ) * p[live][:, None]
        np.add.at(upd, h, gn)
        np.add.at(wsum, h, p[live])
    return upd / np.maximum(wsum, 1e-12)[:, None]


def _optimize_driver(
    y: np.ndarray,
    heads: np.ndarray,
    tails: np.ndarray,
    w: np.ndarray,
    n_epochs: int,
    a: float,
    b: float,
    gamma: float,
    negative_sample_rate: int,
    initial_alpha: float,
    seed: int,
) -> np.ndarray:
    p = w / w.max()
    y = y.copy()
    for epoch in range(n_epochs):
        alpha = initial_alpha * (1.0 - epoch / float(n_epochs))
        y += alpha * _epoch_updates(
            y, heads, tails, p, epoch, a, b, gamma, negative_sample_rate, seed
        )
    return y


def embed_graph(
    sym_edges: DataFrame,
    init: DataFrame,
    n_epochs: int,
    a: float,
    b: float,
    gamma: float = 1.0,
    negative_sample_rate: int = 5,
    initial_alpha: float = 1.0,
    seed: int = 42,
    driver_point_cap: int = 500_000,
    optimize: str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Optimize the low-dimensional layout of a symmetrized fuzzy
    graph.  ``init`` is the (vec_id, embedding) starting layout (PCA
    init from :func:`umap_reduce`, or any caller-provided one).

    ``optimize='auto'`` picks the numpy driver tail when the point
    count fits ``driver_point_cap`` (the same bounded-driver-tail
    contract as HDBSCAN's condense step), else the distributed
    join-per-epoch path.  Both paths share :func:`_epoch_updates`
    bit-for-bit; the distributed path merely computes the same sums
    with Spark joins."""
    if optimize not in ("auto", "driver", "distributed"):
        raise ValueError(f"embed_graph: unknown optimize={optimize!r}")
    spark = sym_edges.sparkSession
    n_points = init.count()
    mode = optimize
    if mode == "auto":
        mode = "driver" if n_points <= driver_point_cap else "distributed"

    if mode == "driver":
        init_rows = init.select(id_col, vec_col).collect()
        ids = np.array([r[id_col] for r in init_rows], dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        y0 = np.vstack([np.asarray(init_rows[i][vec_col], dtype=np.float64) for i in order])
        pos = {int(v): i for i, v in enumerate(ids)}
        e = sym_edges.select("src", "dst", "w").collect()
        heads = np.array([pos[r["src"]] for r in e], dtype=np.int64)
        tails = np.array([pos[r["dst"]] for r in e], dtype=np.int64)
        w = np.array([r["w"] for r in e], dtype=np.float64)
        y = _optimize_driver(
            y0, heads, tails, w, n_epochs, a, b, gamma,
            negative_sample_rate, initial_alpha, seed,
        )
        # .tolist() yields NATIVE python floats/ints — list(map(list, y))
        # leaves numpy.float64 elements, which the non-arrow
        # createDataFrame fallback on pyspark 3.5 rejects
        # (FIELD_DATA_TYPE_UNACCEPTABLE; CORRECTNESS_r05
        # umap_cluster_recovery red row).
        pdf = pd.DataFrame({id_col: ids.tolist(), vec_col: y.tolist()})
        return spark.createDataFrame(pdf, f"{id_col} long, {vec_col} array<double>")

    return _optimize_distributed(
        sym_edges, init, n_points, n_epochs, a, b, gamma,
        negative_sample_rate, initial_alpha, seed, id_col, vec_col,
    )


def _optimize_distributed(
    sym_edges: DataFrame,
    init: DataFrame,
    n_points: int,
    n_epochs: int,
    a: float,
    b: float,
    gamma: float,
    negative_sample_rate: int,
    initial_alpha: float,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Synchronous distributed epochs: gather endpoint coordinates by
    hash join, compute per-edge gradients in an Arrow kernel (the SAME
    :func:`_epoch_updates` math on local dense blocks), scatter with a
    groupBy-sum, apply, ``localCheckpoint`` to cut lineage.

    Negative samples index the 0..n-1 DENSE position space (so the
    seeded hash is identical to the driver tail's); the dense position
    table comes from :func:`two_phase_row_number` over vec_id — no
    single-partition window."""
    from top2vec_spark.operators.numbering import two_phase_row_number

    # dense positions 0..n-1 ordered by vec_id (matches the driver
    # tail's np.argsort(ids) layout, so seeds agree across paths)
    posmap = (
        two_phase_row_number(init.select(id_col), [F.col(id_col)], "idx")
        .select(id_col, "idx")
        .localCheckpoint(eager=True)
    )

    y = (
        init.join(posmap, id_col)
        .select("idx", F.col(vec_col).cast("array<double>").alias("y"))
        .localCheckpoint(eager=True)
    )
    hmap = posmap.select(F.col(id_col).alias("src"), F.col("idx").alias("head"))
    tmap = posmap.select(F.col(id_col).alias("dst"), F.col("idx").alias("tail"))
    edges = (
        sym_edges.join(hmap, "src")
        .join(tmap, "dst")
        .select("head", "tail", "w")
    )
    wmax = edges.agg(F.max("w")).collect()[0][0]
    edges = edges.select(
        "head", "tail", (F.col("w") / F.lit(float(wmax))).alias("p")
    ).localCheckpoint(eager=True)

    aa, bb, gg = float(a), float(b), float(gamma)
    rate, sd, npts = int(negative_sample_rate), int(seed), int(n_points)

    for epoch in range(n_epochs):
        alpha = initial_alpha * (1.0 - epoch / float(n_epochs))
        ep = epoch

        # negatives for this epoch, as extra (head, neg) gather keys
        def with_negs(pdfs):
            for pdf in pdfs:
                if not len(pdf):
                    continue
                h = pdf["head"].to_numpy().astype(np.int64)
                negs = [
                    _neg_indices(h, ep, s, sd, npts) for s in range(rate)
                ]
                pdf = pdf.copy()
                for s in range(rate):
                    pdf[f"n{s}"] = negs[s]
                yield pdf

        neg_cols = ", ".join(f"n{s} long" for s in range(rate))
        e = edges.mapInPandas(
            with_negs, f"head long, tail long, p double, {neg_cols}"
        )
        ycur = y
        e = e.join(ycur.withColumnRenamed("idx", "head").withColumnRenamed("y", "yh"), "head")
        e = e.join(ycur.withColumnRenamed("idx", "tail").withColumnRenamed("y", "yt"), "tail")
        for s in range(rate):
            e = e.join(
                ycur.withColumnRenamed("idx", f"n{s}").withColumnRenamed("y", f"yn{s}"),
                f"n{s}",
                "left",
            )

        def grads(pdfs):
            for pdf in pdfs:
                if not len(pdf):
                    continue
                yh = np.vstack(pdf["yh"].to_numpy())
                yt = np.vstack(pdf["yt"].to_numpy())
                p = pdf["p"].to_numpy().astype(np.float64)
                heads = pdf["head"].to_numpy().astype(np.int64)
                tails = pdf["tail"].to_numpy().astype(np.int64)
                dim = yh.shape[1]
                out_idx, out_g = [], []
                out_c = []
                d = yh - yt
                dist2 = (d * d).sum(axis=1)
                coeff = np.zeros_like(dist2)
                pos = dist2 > 0.0
                coeff[pos] = (-2.0 * aa * bb * dist2[pos] ** (bb - 1.0)) / (
                    aa * dist2[pos] ** bb + 1.0
                )
                g = np.clip(coeff[:, None] * d, -4.0, 4.0) * p[:, None]
                out_idx += [heads, tails]
                out_g += [g, -g]
                out_c += [p, p]
                for s in range(rate):
                    negs = pdf[f"n{s}"].to_numpy().astype(np.int64)
                    yn = np.vstack(
                        [
                            np.asarray(v, dtype=np.float64)
                            if v is not None
                            else np.zeros(dim)
                            for v in pdf[f"yn{s}"].to_numpy()
                        ]
                    )
                    live = negs != heads
                    dn = yh - yn
                    dist2n = (dn * dn).sum(axis=1)
                    cn = np.zeros_like(dist2n)
                    posn = dist2n > 0.0
                    cn[posn] = (2.0 * gg * bb) / (
                        (0.001 + dist2n[posn]) * (aa * dist2n[posn] ** bb + 1.0)
                    )
                    gn = np.where(
                        posn[:, None], np.clip(cn[:, None] * dn, -4.0, 4.0), 4.0
                    ) * p[:, None]
                    gn[~live] = 0.0
                    cn_w = np.where(live, p, 0.0)
                    out_idx.append(heads)
                    out_g.append(gn)
                    out_c.append(cn_w)
                yield pd.DataFrame(
                    {
                        "idx": np.concatenate(out_idx),
                        "g": list(map(list, np.concatenate(out_g))),
                        "c": np.concatenate(out_c),
                    }
                )

        gsum = (
            e.mapInPandas(grads, "idx long, g array<double>, c double")
            .select("idx", "c", F.posexplode("g").alias("d", "gv"))
            .groupBy("idx", "d")
            .agg(
                F.sum("gv").alias("gv"),
                F.sum("c").alias("cw"),
            )
            .groupBy("idx")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("d", "gv"))),
                    lambda st: st["gv"],
                ).alias("g"),
                F.max("cw").alias("cw"),
            )
        )
        y = (
            y.join(gsum, "idx", "left")
            .select(
                "idx",
                F.when(
                    F.col("g").isNull(), F.col("y")
                )
                .otherwise(
                    F.zip_with(
                        "y",
                        "g",
                        lambda yv, gv: yv
                        + F.lit(float(alpha))
                        * gv
                        / F.greatest(F.col("cw"), F.lit(1e-12)),
                    )
                )
                .alias("y"),
            )
            .localCheckpoint(eager=True)
        )

    return y.join(posmap, "idx").select(F.col(id_col), F.col("y").alias(vec_col))


# ---------------------------------------------------------------------------
# one-call facade
# ---------------------------------------------------------------------------

def umap_reduce(
    embeddings: DataFrame,
    n_components: int = 2,
    n_neighbors: int = 15,
    metric: str = "cosine",
    min_dist: float = 0.1,
    spread: float = 1.0,
    n_epochs: int | None = None,
    local_connectivity: float = 1.0,
    set_op_mix_ratio: float = 1.0,
    negative_sample_rate: int = 5,
    initial_alpha: float = 1.0,
    gamma: float = 1.0,
    seed: int = 42,
    knn: DataFrame | None = None,
    driver_point_cap: int = 500_000,
    optimize: str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """UMAP fit: kNN -> fuzzy graph -> symmetrize -> PCA init ->
    cross-entropy layout.  Returns (vec_id, embedding) in
    ``n_components`` dims.  Pass ``knn`` (e.g. ``knn_graph_ivf``
    output with k = n_neighbors-1) to pick the bucketed kNN scale
    path; ``metric='cosine'`` L2-normalizes then uses euclidean
    (chord) distance — an identical neighbor graph (monotone map)."""
    from top2vec_spark.operators.hdbscan import knn_graph

    if metric not in ("cosine", "euclidean"):
        raise ValueError(
            f"umap_reduce: metric {metric!r} not implemented "
            "(cosine | euclidean)"
        )
    emb = embeddings.select(id_col, vec_col)
    if metric == "cosine":
        norm = F.sqrt(
            F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        emb = emb.select(
            id_col,
            F.transform(
                vec_col, lambda x: x / F.when(norm > 0, norm).otherwise(F.lit(1.0))
            ).alias(vec_col),
        )
    emb = emb.persist()
    try:
        n = emb.count()
        if n_epochs is None:
            n_epochs = 200 if n > 10_000 else 500
        if knn is None:
            knn = knn_graph(emb, k=n_neighbors - 1, id_col=id_col, vec_col=vec_col)
        directed = fuzzy_edges(
            knn, n_neighbors, local_connectivity=local_connectivity
        )
        sym = symmetrize(directed, set_op_mix_ratio=set_op_mix_ratio).persist()
        try:
            sym.count()  # materialize before the init's PCA jobs
            a, b = find_ab_params(spread, min_dist)
            init = _pca_init(emb, n_components, id_col, vec_col)
            return embed_graph(
                sym,
                init,
                n_epochs=n_epochs,
                a=a,
                b=b,
                gamma=gamma,
                negative_sample_rate=negative_sample_rate,
                initial_alpha=initial_alpha,
                seed=seed,
                driver_point_cap=driver_point_cap,
                optimize=optimize,
                id_col=id_col,
                vec_col=vec_col,
            )
        finally:
            sym.unpersist()
    finally:
        emb.unpersist()


def _pca_init(
    emb: DataFrame, n_components: int, id_col: str, vec_col: str
) -> DataFrame:
    """Deterministic PCA initialization scaled to max-extent 10 (the
    scaling umap applies to its spectral init; PCA replaces the
    spectral solve — deterministic, one distributed moments pass,
    and the standard umap `init='pca'` option)."""
    from top2vec_spark.operators.pca import fit_pca, transform_pca

    model = fit_pca(emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")), n_components)
    proj = transform_pca(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")), model
    )
    mx = proj.select(
        F.max(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
            )
        ).alias("m")
    ).collect()[0]["m"]
    scale = 10.0 / mx if mx and mx > 0 else 1.0
    return proj.select(
        F.col("vec_id").alias(id_col),
        F.transform("embedding", lambda x: x * F.lit(float(scale))).alias(vec_col),
    )


def transform_points(
    new_embeddings: DataFrame,
    fitted: DataFrame,
    layout: DataFrame,
    n_neighbors: int = 15,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Out-of-sample transform: embed NEW points as the
    membership-weighted mean of their nearest fitted points' layout
    coordinates — umap-learn's ``transform`` initialization (weighted
    average over the fuzzy neighbor weights), the distributed recipe
    for beyond-driver-cap corpora: fit on a landmark sample, transform
    the rest with one broadcast-kNN + one join + one groupBy.

    kNN runs new-vs-FIT directly (broadcast the fitted matrix, one
    narrow matmul per Arrow batch of new points) — no self edges to
    drop, so all ``n_neighbors - 1`` ranks are fit points and the
    fuzzy calibration sees the same k-edge layout as the fit side."""
    fit = fitted.select(id_col, vec_col)
    new = new_embeddings.select(id_col, vec_col)
    if metric not in ("cosine", "euclidean"):
        raise ValueError(f"transform_points: metric {metric!r} not implemented")
    if metric == "cosine":
        def l2(df):
            norm = F.sqrt(
                F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
            )
            return df.select(
                id_col,
                F.transform(
                    vec_col,
                    lambda x: x / F.when(norm > 0, norm).otherwise(F.lit(1.0)),
                ).alias(vec_col),
            )
        fit, new = l2(fit), l2(new)

    base = fit.collect()
    fids = np.asarray([r[id_col] for r in base], dtype=np.int64)
    order = np.argsort(fids)
    fids = fids[order]
    mat = np.vstack([np.asarray(base[i][vec_col], dtype=np.float64) for i in order])
    norms = (mat * mat).sum(axis=1)
    bc = new.sparkSession.sparkContext.broadcast((fids, mat, norms))
    kk = min(int(n_neighbors) - 1, mat.shape[0])

    def batch(pdfs):
        fids_, mat_, norms_ = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            q = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            qid = pdf[id_col].to_numpy().astype(np.int64)
            d2 = (q * q).sum(axis=1)[:, None] + norms_[None, :] - 2.0 * (q @ mat_.T)
            np.maximum(d2, 0.0, out=d2)
            srcs, dsts, dists, ranks = [], [], [], []
            for i in range(d2.shape[0]):
                row = d2[i]
                cand = np.argpartition(row, kk - 1)[:kk] if kk < row.shape[0] else np.arange(row.shape[0])
                dist = np.sqrt(row[cand])
                o = np.lexsort((fids_[cand], dist))
                cand, dist = cand[o][:kk], dist[o][:kk]
                m = cand.shape[0]
                srcs.append(np.full(m, qid[i], dtype=np.int64))
                dsts.append(fids_[cand])
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

    edges = new.mapInPandas(batch, "src long, dst long, dist double, rank int")
    directed = fuzzy_edges(edges, n_neighbors)
    lay = layout.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("ly"))
    num = (
        directed.join(lay, "dst")
        .select("src", "w", F.posexplode("ly").alias("d", "v"))
        .groupBy("src", "d")
        .agg((F.sum(F.col("w") * F.col("v")) / F.sum("w")).alias("v"))
        .groupBy("src")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("d", "v"))),
                lambda st: st["v"],
            ).alias(vec_col)
        )
    )
    return num.select(F.col("src").alias(id_col), vec_col)
