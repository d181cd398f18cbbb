"""Distributed doc2vec training (L1) — the reference's joint
document/word embedding (top2vec.py:560-622, gensim
``Doc2Vec(vector_size=300, min_count, window=15, sample=1e-5,
negative, hs, epochs, dm=0, dbow_words=1)``) re-expressed for Spark
from the published algorithms (Le & Mikolov 2014 PV-DBOW; Mikolov
2013 negative sampling + subsampling + hierarchical softmax), not
from gensim's code.

Training semantics (gensim PV-DBOW, dm=0):

- vocabulary = terms with corpus frequency cf > min_count (the
  engine's existing strict-``>`` vocab, operators/corpus_stats.py);
- per epoch, per document: the token sequence is SUBSAMPLED first
  (word w kept with prob ``(sqrt(cf/t)+1) * t/cf`` clipped to 1,
  t = sample * total_tokens — word2vec's published formula), then
  * PV-DBOW pairs: (doc vector -> each kept word);
  * with ``dbow_words=1``, skip-gram word pairs over the SUBSAMPLED
    sequence: for each center position a reduced window
    span in {1..window} is drawn and every in-span context word's
    input vector is trained to predict the center word (gensim's
    train_batch_sg pairing direction);
- objective per pair: negative sampling (``negative`` draws from the
  unigram^0.75 noise distribution, self-collisions skipped) or
  hierarchical softmax over a cf-ordered Huffman tree (``hs=1``);
  sigmoid gradients, learning rate decaying linearly alpha ->
  min_alpha across epochs.

Re-expression delta (documented, same contract as operators/umap.py):
gensim runs ASYNCHRONOUS hogwild SGD whose result depends on thread
interleaving (two gensim runs with workers>1 differ from each other).
This operator runs the SYNCHRONOUS expectation: every epoch, every
pair's gradient is computed against the EPOCH-START parameters; doc
vectors apply their accumulated gradient at epoch end inside their
own partition, word/context matrices apply theirs at the driver epoch
barrier.  Each parameter's applied move is the MEAN of its pairs'
gradients rather than the raw sum — the same stabilization as
operators/umap.py's ``_epoch_updates``: the raw sum (every pair step
evaluated at one stale position) is the textbook synchronous-GD
overshoot, which for a head word touched by 10^4 pairs per epoch
diverges immediately; the mean keeps every epoch's move within one
SGD step of the async schedule, trading step count for stability
while leaving the gradient field and its fixed points unchanged.
Deterministic given (seed, corpus) and
partitioning-invariant (pinned by tests/test_doc2vec.py); coordinates
differ from any one gensim run the way two gensim runs differ from
each other, while the objective and its fixed points are the same.

Distribution (one pass over the corpus per epoch, NO shuffle in the
epoch loop):

- state table (doc_id, seq: array<int> term_ids, dvec) persisted;
  doc vectors are PRIVATE to their partition, so their update never
  crosses the wire;
- word matrices W_in/W_out (or the HS node matrix) broadcast at epoch
  start; each mapInPandas kernel accumulates a per-PARTITION dense
  gradient and emits only the touched term rows; the driver sums and
  applies them.  The vocab x dim matrix on the driver is the standard
  data-parallel word2vec bound (Spark MLlib's Word2Vec holds the same
  matrix per executor); beyond driver memory the documented scale
  path is vocab-sharded parameter partitions, out of scope here;
- the epoch output is ONE union-schema frame (state rows + grad
  rows) so forward math runs once per epoch; ``localCheckpoint``
  truncates the per-epoch lineage.

RNG: subsampling and window draws use a Lehmer/MINSTD chain over
(doc_id, pos, epoch) — integer arithmetic a DuckDB oracle can replay
verbatim (the ``d2v_subsample`` driver row) — negatives use the same
splitmix64 finalizer as operators/umap.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top2vec_spark.operators.umap import _mix64

_M31 = 2147483647  # Park-Miller modulus (2^31 - 1)
_P_SUB = 1  # purpose tags for the MINSTD chain
_P_WIN = 2


def u01(a, b, c: int, d: int) -> np.ndarray:
    """Vectorized MINSTD-chain uniform in [0, 1) keyed by two int64
    arrays + two scalars.  Every intermediate product stays far below
    2^63 (operands are < 2^31 after the first mod), so a BIGINT SQL
    engine replays it exactly — the property the d2v_subsample oracle
    row depends on."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    h = ((a % _M31) * 40503 + (b % _M31) * 104729) % _M31
    h = (h + int(c) * 12582917 + int(d) * 7919) % _M31
    h = (h * 48271) % _M31
    h = (h * 48271) % _M31
    return h / float(_M31)


def keep_probs(cf: np.ndarray, sample: float, total: int) -> np.ndarray:
    """word2vec subsampling keep-probability per vocab word (Mikolov
    2013 eq. 5 as implemented everywhere: keep = (sqrt(cf/t) + 1) *
    t/cf clipped to 1, t = sample * total).  sample <= 0 keeps all."""
    if sample <= 0:
        return np.ones(len(cf))
    t = sample * float(total)
    cf = cf.astype(np.float64)
    return np.minimum((np.sqrt(cf / t) + 1.0) * (t / cf), 1.0)


def noise_cdf(cf: np.ndarray, ns_exponent: float = 0.75) -> np.ndarray:
    """Cumulative unigram^0.75 noise distribution over term_id order."""
    w = cf.astype(np.float64) ** ns_exponent
    c = np.cumsum(w)
    return c / c[-1]


def _neg_draws(
    doc_id: np.ndarray,
    pair_no: np.ndarray,
    s: int,
    epoch: int,
    seed: int,
    cdf: np.ndarray,
) -> np.ndarray:
    z = doc_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    z ^= pair_no.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= np.uint64(
        (epoch * 2654435761 + s * 40503 + seed * 7919) & 0xFFFFFFFFFFFFFFFF
    )
    u = _mix64(z).astype(np.float64) / float(2**64)
    return np.searchsorted(cdf, u, side="right").clip(0, len(cdf) - 1)


def build_huffman(cf: np.ndarray) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Huffman tree over corpus frequencies (hs=1).  Returns per-word
    (points, codes): the internal-node ids on the root->leaf path and
    the 0/1 branch codes, word2vec's layout.  Deterministic: heap
    ties break on node id (leaves first, then creation order), so
    every engine/run builds the same tree."""
    import heapq

    n = len(cf)
    if n == 1:
        return [np.array([0], dtype=np.int64)], [np.array([0], dtype=np.int64)]
    heap = [(int(c), i) for i, c in enumerate(cf)]
    heapq.heapify(heap)
    parent = np.zeros(2 * n - 1, dtype=np.int64)
    binary = np.zeros(2 * n - 1, dtype=np.int64)
    nxt = n
    while len(heap) > 1:
        c1, i1 = heapq.heappop(heap)
        c2, i2 = heapq.heappop(heap)
        parent[i1] = nxt
        parent[i2] = nxt
        binary[i2] = 1
        heapq.heappush(heap, (c1 + c2, nxt))
        nxt += 1
    root = nxt - 1
    points, codes = [], []
    for w in range(n):
        pts, cds = [], []
        node = w
        while node != root:
            if node >= n:
                pts.append(node - n)
            cds.append(int(binary[node]))
            node = parent[node]
        pts.append(root - n)
        # collected leaf->root; word2vec stores root->leaf
        pts.reverse()
        cds.reverse()
        points.append(np.array(pts, dtype=np.int64))
        codes.append(np.array(cds, dtype=np.int64))
    return points, codes


def _pad_tree(
    points: list[np.ndarray], codes: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad the ragged Huffman paths to (vocab, max_code_len) matrices
    so the kernel can gather them in one shot. mask marks real slots."""
    ml = max(len(p) for p in points)
    n = len(points)
    P = np.zeros((n, ml), dtype=np.int64)
    C = np.zeros((n, ml), dtype=np.float64)
    M = np.zeros((n, ml), dtype=bool)
    for i, (p, c) in enumerate(zip(points, codes)):
        P[i, : len(p)] = p
        C[i, : len(c)] = c
        M[i, : len(p)] = True
    return P, C, M


def subsampled_seq(
    doc_id: int, seq: np.ndarray, keep: np.ndarray, epoch: int, seed: int
) -> np.ndarray:
    """Positions of ``seq`` kept this epoch (MINSTD draw per (doc,
    pos, epoch) vs the word's keep probability)."""
    pos = np.arange(len(seq), dtype=np.int64)
    u = u01(np.full(len(seq), doc_id, dtype=np.int64), pos, epoch, _P_SUB + seed)
    return pos[u < keep[seq]]


def _doc_pairs(
    doc_id: int,
    w: np.ndarray,
    epoch: int,
    seed: int,
    window: int,
    dbow_words: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Training pairs for one document's SUBSAMPLED sequence ``w``:
    returns (in_term, out_term) where in_term == -1 means the doc
    vector is the input (PV-DBOW pair).  Word pairs follow gensim's
    train_batch_sg direction: context-word input predicts the center
    word, with a per-center reduced window span in {1..window}."""
    L = len(w)
    in_t = [np.full(L, -1, dtype=np.int64)]
    out_t = [w]
    if dbow_words and L > 1 and window > 0:
        centers = np.arange(L, dtype=np.int64)
        span = 1 + np.floor(
            u01(np.full(L, doc_id, dtype=np.int64), centers, epoch, _P_WIN + seed)
            * window
        ).astype(np.int64)
        offs = np.arange(-window, window + 1, dtype=np.int64)
        ctx = centers[:, None] + offs[None, :]
        ok = (
            (np.abs(offs)[None, :] <= span[:, None])
            & (offs[None, :] != 0)
            & (ctx >= 0)
            & (ctx < L)
        )
        ci, oi = np.nonzero(ok)
        in_t.append(w[ctx[ci, oi]])
        out_t.append(w[ci])
    return np.concatenate(in_t), np.concatenate(out_t)


def _batch_grads(
    doc_ids: np.ndarray,
    seqs: list[np.ndarray],
    dvecs: np.ndarray,
    W_in: np.ndarray,
    W_out: np.ndarray,
    keep: np.ndarray,
    cdf: np.ndarray | None,
    tree: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    epoch: int,
    lr: float,
    window: int,
    negative: int,
    dbow_words: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One synchronous epoch over a batch of documents — THE update
    rule, shared verbatim by the executor kernel and the scalar test
    reference.  All gradients are evaluated against the EPOCH-START
    (dvecs, W_in, W_out); returns (new_dvecs, gW_in, gW_out, nin,
    nout) where gW_out is the negative-sampling output matrix
    gradient or the HS node matrix gradient and nin/nout are the
    per-row contribution counts the caller divides by (after summing
    partials across partitions) to apply the MEAN epoch step — the
    docstring's synchronous-overshoot stabilization.  Doc vectors are
    private to the batch, so their mean step is applied here."""
    dim = dvecs.shape[1]
    new_d = dvecs.copy()
    gin = np.zeros_like(W_in)
    gout = np.zeros_like(W_out)
    nin = np.zeros(len(W_in), dtype=np.int64)
    nout = np.zeros(len(W_out), dtype=np.int64)
    for bi in range(len(doc_ids)):
        did = int(doc_ids[bi])
        seq = seqs[bi]
        kept = subsampled_seq(did, seq, keep, epoch, seed)
        if len(kept) == 0:
            continue
        w = seq[kept]
        in_t, out_t = _doc_pairs(did, w, epoch, seed, window, dbow_words)
        P = len(in_t)
        is_doc = in_t < 0
        Vin = np.where(is_doc[:, None], dvecs[bi][None, :], W_in[in_t])
        if tree is not None:
            Pts, Cds, Msk = tree
            nodes = Pts[out_t]  # (P, ml)
            code = Cds[out_t]
            msk = Msk[out_t]
            f = 1.0 / (
                1.0 + np.exp(-np.einsum("pd,pmd->pm", Vin, W_out[nodes]))
            )
            g = np.where(msk, (1.0 - code - f) * lr, 0.0)
            gin_pair = np.einsum("pm,pmd->pd", g, W_out[nodes])
            np.add.at(
                gout,
                nodes.ravel(),
                (g[:, :, None] * Vin[:, None, :]).reshape(-1, dim),
            )
            np.add.at(nout, nodes.ravel(), msk.ravel().astype(np.int64))
        else:
            pair_no = np.arange(P, dtype=np.int64)
            T = np.empty((P, negative + 1), dtype=np.int64)
            T[:, 0] = out_t
            for s in range(negative):
                T[:, 1 + s] = _neg_draws(
                    np.full(P, did, dtype=np.int64), pair_no, s, epoch, seed, cdf
                )
            label = np.zeros((P, negative + 1))
            label[:, 0] = 1.0
            live = np.ones_like(label, dtype=bool)
            live[:, 1:] = T[:, 1:] != out_t[:, None]  # skip self-negatives
            f = 1.0 / (1.0 + np.exp(-np.einsum("pd,pkd->pk", Vin, W_out[T])))
            g = np.where(live, (label - f) * lr, 0.0)
            gin_pair = np.einsum("pk,pkd->pd", g, W_out[T])
            np.add.at(
                gout,
                T.ravel(),
                (g[:, :, None] * Vin[:, None, :]).reshape(-1, dim),
            )
            np.add.at(nout, T.ravel(), live.ravel().astype(np.int64))
        nd_pairs = int(is_doc.sum())
        new_d[bi] += gin_pair[is_doc].sum(axis=0) / max(nd_pairs, 1)
        wp = ~is_doc
        if wp.any():
            np.add.at(gin, in_t[wp], gin_pair[wp])
            np.add.at(nin, in_t[wp], 1)
    return new_d, gin, gout, nin, nout


def _init_vec(ids: np.ndarray, dim: int, seed: int, salt: int) -> np.ndarray:
    """word2vec-style init: uniform (-0.5, 0.5)/dim seeded from the id."""
    cols = np.arange(dim, dtype=np.uint64)
    z = ids.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
    z = z ^ (cols[None, :] + np.uint64(1)) * np.uint64(0x94D049BB133111EB)
    z = z ^ np.uint64((seed * 7919 + salt) & 0xFFFFFFFFFFFFFFFF)
    u = _mix64(z).astype(np.float64) / float(2**64)
    return (u - 0.5) / dim


class Doc2VecModel:
    """Training result: doc vectors as a DataFrame, word matrices on
    the driver (the same driver bound the per-epoch broadcast already
    implies), plus the vocab order they are indexed by and the
    training hyper-parameters :func:`infer_doc_vectors` replays."""

    def __init__(
        self, doc_vectors, terms, W_in, W_out, raw_doc_state,
        cf=None, params=None,
    ):
        self.doc_vectors = doc_vectors  # (vec_id, embedding) L2-normed
        self.terms = terms  # term strings by term_id
        self.W_in = W_in
        self.W_out = W_out
        self.raw_doc_state = raw_doc_state  # (doc_id, seq, dvec)
        self.cf = cf  # corpus frequencies by term_id
        self.params = params or {}

    def word_vectors(self, spark) -> DataFrame:
        """(term, embedding) L2-normalized — the reference's
        ``model.wv.get_normed_vectors()`` (top2vec.py:620)."""
        W = self.W_in
        nrm = np.linalg.norm(W, axis=1, keepdims=True)
        Wn = W / np.maximum(nrm, 1e-12)
        return spark.createDataFrame(
            [
                (t, [float(x) for x in Wn[i]])
                for i, t in enumerate(self.terms)
            ],
            "term string, embedding array<double>",
        )


def _state_table(tokens: DataFrame, vocab: DataFrame, dim: int, seed: int):
    """(doc_id, seq array<int>, dvec) — one row per doc with an
    in-vocab token; seq in position order, dvec seeded from doc_id."""
    seqs = (
        tokens.join(F.broadcast(vocab.select("term", "term_id")), "term")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term_id"))),
                lambda s: s["term_id"],
            ).alias("seq")
        )
    )

    def init(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy().astype(np.int64)
            D = _init_vec(ids, dim, seed, salt=17)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "seq": pdf["seq"],
                    "dvec": list(map(list, D)),
                }
            )

    return seqs.mapInPandas(
        init, "doc_id long, seq array<int>, dvec array<double>"
    )


_EPOCH_SCHEMA = (
    "doc_id long, seq array<int>, dvec array<double>, "
    "term_id int, gin array<double>, gout array<double>, "
    "nin long, nout long"
)


def train_doc2vec(
    tokens: DataFrame,
    vocab: DataFrame,
    *,
    dim: int = 100,
    window: int = 15,
    sample: float = 1e-5,
    negative: int = 5,
    hs: bool = False,
    epochs: int = 10,
    alpha: float = 0.025,
    min_alpha: float = 1e-4,
    dbow_words: int = 1,
    seed: int = 1,
) -> Doc2VecModel:
    """Train PV-DBOW over tokens(doc_id, pos, term) with
    vocab(term, term_id, cf).  See the module docstring for the
    published semantics and the synchronous re-expression delta.

    Per epoch: broadcast (W_in, W_out) -> ONE mapInPandas pass over
    the persisted state emitting a union frame of updated doc rows +
    per-partition-combined word-gradient rows -> collect the gradient
    rows (<= partitions x touched-vocab) -> driver applies.  No
    shuffle inside the loop; localCheckpoint cuts lineage."""
    spark = tokens.sparkSession
    vrows = (
        vocab.select("term", "term_id", "cf").orderBy("term_id").collect()
    )
    if not vrows:
        raise ValueError("train_doc2vec: empty vocabulary")
    terms = [r["term"] for r in vrows]
    cf = np.array([r["cf"] for r in vrows], dtype=np.int64)
    V = len(terms)
    total = int(cf.sum())
    keep = keep_probs(cf, sample, total)
    if hs:
        tree = _pad_tree(*build_huffman(cf))
        cdf = None
        n_out = max(V - 1, 1)
    else:
        if negative <= 0:
            raise ValueError(
                "train_doc2vec: negative must be > 0 when hs=False"
            )
        tree = None
        cdf = noise_cdf(cf)
        n_out = V
    W_in = _init_vec(np.arange(V, dtype=np.int64), dim, seed, salt=29)
    W_out = np.zeros((n_out, dim))

    state = _state_table(tokens, vocab, dim, seed).persist()
    state.count()
    sc = spark.sparkContext

    for epoch in range(epochs):
        lr = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1)
        bc = sc.broadcast((W_in, W_out, keep, cdf, tree))

        def kernel(pdfs, _epoch=epoch, _lr=lr):
            Wi, Wo, kp, cd, tr = bc.value
            # ONE dense gradient accumulator per PARTITION (not per
            # Arrow batch) — the vocab x dim footprint the module
            # docstring documents as the data-parallel bound.
            gi = np.zeros_like(Wi)
            go = np.zeros_like(Wo)
            ni = np.zeros(len(Wi), dtype=np.int64)
            no = np.zeros(len(Wo), dtype=np.int64)
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ids = pdf["doc_id"].to_numpy().astype(np.int64)
                seqs = [
                    np.asarray(s, dtype=np.int64) for s in pdf["seq"]
                ]
                D = np.array([np.asarray(v) for v in pdf["dvec"]])
                nd, bgi, bgo, bni, bno = _batch_grads(
                    ids, seqs, D, Wi, Wo, kp, cd, tr,
                    _epoch, _lr, window, negative, dbow_words, seed,
                )
                gi += bgi
                go += bgo
                ni += bni
                no += bno
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "seq": pdf["seq"],
                        "dvec": list(map(list, nd)),
                        "term_id": None,
                        "gin": None,
                        "gout": None,
                        "nin": None,
                        "nout": None,
                    }
                )
            rows = sorted(
                set(np.nonzero(ni)[0].tolist())
                | set(np.nonzero(no)[0].tolist())
            )  # heights differ under hs
            if rows:
                yield pd.DataFrame(
                    {
                        "doc_id": None,
                        "seq": None,
                        "dvec": None,
                        "term_id": pd.array(rows, dtype="Int32"),
                        "gin": [
                            list(gi[r]) if r < len(gi) else None
                            for r in rows
                        ],
                        "gout": [
                            list(go[r]) if r < len(go) else None
                            for r in rows
                        ],
                        "nin": [
                            int(ni[r]) if r < len(ni) else 0 for r in rows
                        ],
                        "nout": [
                            int(no[r]) if r < len(no) else 0 for r in rows
                        ],
                    }
                )

        out = state.mapInPandas(kernel, _EPOCH_SCHEMA).persist()
        grads = out.filter(F.col("term_id").isNotNull()).select(
            "term_id", "gin", "gout", "nin", "nout"
        ).collect()
        new_state = (
            out.filter(F.col("doc_id").isNotNull())
            .select("doc_id", "seq", "dvec")
            .localCheckpoint(eager=True)
        )
        out.unpersist()
        state.unpersist()
        state = new_state
        # sum partials across partitions FIRST, then apply the mean
        # step per parameter row (module docstring)
        agi = np.zeros_like(W_in)
        ago = np.zeros_like(W_out)
        ani = np.zeros(V, dtype=np.int64)
        ano = np.zeros(n_out, dtype=np.int64)
        for r in grads:
            t = r["term_id"]
            if r["gin"] is not None and t < V:
                agi[t] += np.asarray(r["gin"])
                ani[t] += r["nin"]
            if r["gout"] is not None and t < n_out:
                ago[t] += np.asarray(r["gout"])
                ano[t] += r["nout"]
        W_in += agi / np.maximum(ani, 1)[:, None]
        W_out += ago / np.maximum(ano, 1)[:, None]
        bc.unpersist()

    nrm = F.sqrt(
        F.aggregate("dvec", F.lit(0.0), lambda a, x: a + x * x)
    )
    doc_vecs = state.select(
        F.col("doc_id").alias("vec_id"),
        F.transform("dvec", lambda x: x / nrm).alias("embedding"),
    )
    return Doc2VecModel(
        doc_vecs, terms, W_in, W_out, state,
        cf=cf,
        params=dict(
            dim=dim, window=window, sample=sample, negative=negative,
            hs=hs, epochs=epochs, alpha=alpha, min_alpha=min_alpha,
            dbow_words=dbow_words, seed=seed,
        ),
    )


def infer_doc_vectors(
    model: Doc2VecModel,
    tokens: DataFrame,
    *,
    epochs: int | None = None,
    alpha: float | None = None,
    min_alpha: float | None = None,
    seed: int | None = None,
) -> DataFrame:
    """Infer vectors for NEW documents against a frozen trained model
    — gensim's ``infer_vector`` (the reference calls it per new doc in
    a driver loop: add_documents top2vec.py:2026, free-text queries
    2489/2566).  dm=0 inference trains ONLY the document vector on its
    own PV-DBOW pairs (no skip-gram, no word-matrix updates), same
    subsampling / negative-or-HS objective / linear alpha decay as
    training.

    Spark shape: fully embarrassingly parallel — each doc's epochs run
    locally inside ONE mapInPandas pass (frozen matrices broadcast,
    epoch loop vectorized across the Arrow batch via the shared
    :func:`_batch_grads` rule with ``dbow_words=0``), so unlike
    training there is no per-epoch barrier, no shuffle, no driver
    round-trip: the reference's O(new docs) driver loop becomes one
    distributed map.  Returns (vec_id, embedding) L2-normalized.
    OOV terms drop out (gensim ignores them); docs with no in-vocab
    token are absent from the output."""
    p = model.params
    epochs = int(p["epochs"] if epochs is None else epochs)
    alpha = float(p["alpha"] if alpha is None else alpha)
    min_alpha = float(p["min_alpha"] if min_alpha is None else min_alpha)
    seed = int(p["seed"] if seed is None else seed)
    sample, negative, hs = p["sample"], p["negative"], p["hs"]
    window = p["window"]
    dim = model.W_in.shape[1]
    cf = np.asarray(model.cf, dtype=np.int64)
    keep = keep_probs(cf, sample, int(cf.sum()))
    if hs:
        tree = _pad_tree(*build_huffman(cf))
        cdf = None
    else:
        tree = None
        cdf = noise_cdf(cf)
    spark = tokens.sparkSession
    vocab_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(model.terms)],
        "term string, term_id int",
    )
    state = _state_table(tokens, vocab_df, dim, seed)
    bc = spark.sparkContext.broadcast((model.W_in, model.W_out))

    def kernel(pdfs):
        Wi, Wo = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy().astype(np.int64)
            seqs = [np.asarray(s, dtype=np.int64) for s in pdf["seq"]]
            D = np.array([np.asarray(v) for v in pdf["dvec"]])
            for epoch in range(epochs):
                lr = alpha - (alpha - min_alpha) * epoch / max(
                    1, epochs - 1
                )
                D = _batch_grads(
                    ids, seqs, D, Wi, Wo, keep, cdf, tree,
                    epoch, lr, window, negative, dbow_words=0,
                    seed=seed,
                )[0]
            nrm = np.maximum(
                np.linalg.norm(D, axis=1, keepdims=True), 1e-12
            )
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(map(list, D / nrm)),
                }
            )

    return state.mapInPandas(
        kernel, "vec_id long, embedding array<double>"
    )
