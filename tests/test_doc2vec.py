"""Distributed PV-DBOW doc2vec (L1, operators/doc2vec.py): the
synchronous-epoch semantics pinned against an INDEPENDENT scalar
per-pair transcription of the published update rules, partitioning
invariance, Huffman-tree properties, and planted-cluster learning."""

from __future__ import annotations

import math

import numpy as np
import pytest

from top2vec_spark.operators.corpus_stats import build_vocab
from top2vec_spark.operators.doc2vec import (
    _P_SUB,
    _P_WIN,
    _init_vec,
    _neg_draws,
    build_huffman,
    infer_doc_vectors,
    keep_probs,
    noise_cdf,
    train_doc2vec,
    u01,
)
from top2vec_spark.operators.tokens import tokenize_docs


# ---------------------------------------------------------------- helpers


def _tokens_df(spark, docs):
    return spark.createDataFrame(
        [
            (did, pos, term)
            for did, words in docs
            for pos, term in enumerate(words)
        ],
        "doc_id long, pos int, term string",
    )


def _sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


def scalar_train(
    docs,
    terms,
    cf,
    *,
    dim,
    window,
    sample,
    negative,
    hs,
    epochs,
    alpha=0.025,
    min_alpha=1e-4,
    dbow_words=1,
    seed=1,
):
    """Pure-Python per-pair transcription of the documented training
    semantics (module docstring of operators/doc2vec.py): subsample ->
    PV-DBOW pairs then windowed skip-gram pairs -> negative-sampling
    or hierarchical-softmax sigmoid updates, all against epoch-start
    parameters. Shares only the RNG/init primitives (they ARE the
    spec); every gradient below is scalar loops, no _batch_grads."""
    tid = {t: i for i, t in enumerate(terms)}
    V = len(terms)
    total = int(np.sum(cf))
    keep = keep_probs(np.asarray(cf), sample, total)
    if hs:
        points, codes = build_huffman(np.asarray(cf))
        W_out = np.zeros((max(V - 1, 1), dim))
    else:
        cdf = noise_cdf(np.asarray(cf))
        W_out = np.zeros((V, dim))
    W_in = _init_vec(np.arange(V, dtype=np.int64), dim, seed, salt=29)
    seqs = {
        did: [tid[t] for t in words if t in tid] for did, words in docs
    }
    seqs = {d: s for d, s in seqs.items() if s}
    D = {
        d: _init_vec(np.array([d], dtype=np.int64), dim, seed, salt=17)[0]
        for d in seqs
    }
    for epoch in range(epochs):
        lr = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1)
        newD = {d: v.copy() for d, v in D.items()}
        gin = np.zeros_like(W_in)
        gout = np.zeros_like(W_out)
        nin = np.zeros(len(W_in), dtype=np.int64)
        nout = np.zeros(len(W_out), dtype=np.int64)
        for did, seq in seqs.items():
            w = [
                t
                for pos, t in enumerate(seq)
                if u01(
                    np.array([did]), np.array([pos]), epoch, _P_SUB + seed
                )[0]
                < keep[t]
            ]
            if not w:
                continue
            pairs = [(-1, t) for t in w]  # PV-DBOW pairs first
            if dbow_words and len(w) > 1 and window > 0:
                for i in range(len(w)):
                    span = 1 + int(
                        u01(
                            np.array([did]), np.array([i]), epoch,
                            _P_WIN + seed,
                        )[0]
                        * window
                    )
                    # _doc_pairs enumerates np.nonzero row-major:
                    # center ascending, offset ascending
                    for off in range(-window, window + 1):
                        j = i + off
                        if off == 0 or abs(off) > span or j < 0 or j >= len(w):
                            continue
                        pairs.append((w[j], w[i]))
            gdoc = np.zeros(dim)
            ndoc = 0
            for pno, (int_, out) in enumerate(pairs):
                vin = D[did] if int_ < 0 else W_in[int_]
                gpair = np.zeros(dim)
                if hs:
                    for node, code in zip(points[out], codes[out]):
                        f = _sigmoid(float(vin @ W_out[node]))
                        g = lr * (1.0 - code - f)
                        gpair += g * W_out[node]
                        gout[node] += g * vin
                        nout[node] += 1
                else:
                    targets = [out] + [
                        int(
                            _neg_draws(
                                np.array([did], dtype=np.int64),
                                np.array([pno], dtype=np.int64),
                                s, epoch, seed, cdf,
                            )[0]
                        )
                        for s in range(negative)
                    ]
                    for k, tgt in enumerate(targets):
                        if k > 0 and tgt == out:
                            continue  # self-negative skipped
                        label = 1.0 if k == 0 else 0.0
                        f = _sigmoid(float(vin @ W_out[tgt]))
                        g = lr * (label - f)
                        gpair += g * W_out[tgt]
                        gout[tgt] += g * vin
                        nout[tgt] += 1
                if int_ < 0:
                    gdoc += gpair
                    ndoc += 1
                else:
                    gin[int_] += gpair
                    nin[int_] += 1
            newD[did] += gdoc / max(ndoc, 1)
        D = newD
        # mean step per parameter row (the documented stabilization)
        W_in = W_in + gin / np.maximum(nin, 1)[:, None]
        W_out = W_out + gout / np.maximum(nout, 1)[:, None]
    return D, W_in, W_out


def _collect_model(model):
    rows = model.raw_doc_state.select("doc_id", "dvec").collect()
    return {r["doc_id"]: np.array(r["dvec"]) for r in rows}


TINY = [
    (0, "cat sat mat cat hat".split()),
    (1, "dog sat log dog fog".split()),
    (2, "cat dog sat mat log".split()),
    (3, "hat fog cat sat dog mat".split()),
    (4, "mat mat cat log fog sat".split()),
    (5, "fog hat log dog cat".split()),
    (6, "sat hat mat fog dog log cat".split()),
    (7, "log cat fog hat sat".split()),
]


@pytest.fixture(scope="module")
def tiny(spark):
    tokens = _tokens_df(spark, TINY)
    vocab = build_vocab(tokens, min_count=0)
    vrows = vocab.select("term", "term_id", "cf").orderBy("term_id").collect()
    return tokens, vocab, [r["term"] for r in vrows], [r["cf"] for r in vrows]


# ---------------------------------------------------------------- units


def test_u01_deterministic_uniform():
    a = np.arange(1000, dtype=np.int64)
    u = u01(a, a * 7, 3, 5)
    assert ((u >= 0) & (u < 1)).all()
    assert np.allclose(u, u01(a, a * 7, 3, 5))
    # crude uniformity: mean near .5, spread over the unit interval
    assert 0.45 < u.mean() < 0.55
    assert len(np.unique((u * 20).astype(int))) == 20


def test_keep_probs_formula():
    cf = np.array([1000, 10, 1])
    kp = keep_probs(cf, sample=1e-3, total=1011)
    t = 1e-3 * 1011
    expect = min((math.sqrt(1000 / t) + 1) * (t / 1000), 1.0)
    assert kp[0] == pytest.approx(expect)
    assert kp[1] == pytest.approx((math.sqrt(10 / t) + 1) * (t / 10))
    assert kp[2] == 1.0  # (sqrt(1/t)+1)*t > 1 for cf=1 -> clipped
    assert (keep_probs(cf, 0.0, 1011) == 1.0).all()


def test_huffman_prefix_free_and_ordered():
    cf = np.array([100, 40, 30, 20, 5, 3, 1])
    points, codes = build_huffman(cf)
    strs = ["".join(map(str, c)) for c in codes]
    # prefix-free
    for i, a in enumerate(strs):
        for j, b in enumerate(strs):
            if i != j:
                assert not b.startswith(a)
    # Kraft equality (complete binary tree) + monotone code lengths
    assert sum(2.0 ** -len(s) for s in strs) == pytest.approx(1.0)
    lens = [len(s) for s in strs]
    assert lens == sorted(lens)
    # points align with codes and index the (V-1)-row node matrix
    for p, c in zip(points, codes):
        assert len(p) == len(c)
        assert (p >= 0).all() and (p < len(cf) - 1).all()


def test_noise_cdf_shape():
    cdf = noise_cdf(np.array([8, 1]))
    w0 = 8**0.75
    assert cdf[-1] == 1.0
    assert cdf[0] == pytest.approx(w0 / (w0 + 1))


# ------------------------------------------------------- semantics pins


@pytest.mark.parametrize("hs", [False, True])
def test_distributed_matches_scalar_reference(spark, tiny, hs):
    tokens, vocab, terms, cf = tiny
    kw = dict(
        dim=8, window=3, sample=3e-2, negative=0 if hs else 3, hs=hs,
        epochs=3, dbow_words=1, seed=7,
    )
    model = train_doc2vec(tokens, vocab, **kw)
    D_ref, Win_ref, Wout_ref = scalar_train(TINY, terms, cf, **kw)
    assert np.allclose(model.W_in, Win_ref, atol=1e-9)
    assert np.allclose(model.W_out, Wout_ref, atol=1e-9)
    D = _collect_model(model)
    assert set(D) == set(D_ref)
    for d in D:
        assert np.allclose(D[d], D_ref[d], atol=1e-9), d


def test_partitioning_invariance(spark, tiny):
    tokens, vocab, _, _ = tiny
    kw = dict(dim=6, window=2, sample=0.0, negative=2, epochs=2, seed=3)
    m1 = train_doc2vec(tokens.repartition(1), vocab, **kw)
    m7 = train_doc2vec(tokens.repartition(7), vocab, **kw)
    assert np.allclose(m1.W_in, m7.W_in, atol=1e-9)
    assert np.allclose(m1.W_out, m7.W_out, atol=1e-9)
    D1, D7 = _collect_model(m1), _collect_model(m7)
    for d in D1:
        assert np.allclose(D1[d], D7[d], atol=1e-9)


def test_subsampling_drops_head_terms(spark, tiny):
    """With an aggressive sample threshold the head term must be
    dropped from SOME epoch-positions (keep < 1 actually bites)."""
    tokens, vocab, terms, cf = tiny
    keep = keep_probs(np.array(cf), 3e-2, int(np.sum(cf)))
    assert keep.min() < 1.0  # the fixture really exercises subsampling


GROUPS = {
    0: "apple pear plum grape melon".split(),
    1: "iron copper zinc nickel cobalt".split(),
    2: "river lake ocean stream pond".split(),
}


@pytest.fixture(scope="module")
def planted_model(spark):
    rng = np.random.RandomState(5)
    docs = []
    for did in range(45):
        g = did % 3
        words = [GROUPS[g][rng.randint(5)] for _ in range(12)]
        docs.append((did, words))
    tokens = _tokens_df(spark, docs)
    vocab = build_vocab(tokens, min_count=0)
    model = train_doc2vec(
        tokens, vocab, dim=12, window=4, sample=0.0, negative=5,
        epochs=80, alpha=0.5, seed=11,
    )
    return tokens, vocab, model


def test_learns_planted_clusters(spark, planted_model):
    groups = GROUPS
    _, _, model = planted_model
    vecs = {
        r["vec_id"]: np.array(r["embedding"])
        for r in model.doc_vectors.collect()
    }
    within, across = [], []
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            cos = float(vecs[i] @ vecs[j])
            (within if i % 3 == j % 3 else across).append(cos)
    assert np.mean(within) > np.mean(across) + 0.3
    # word vectors separate the same way
    wv = {
        r["term"]: np.array(r["embedding"])
        for r in model.word_vectors(spark).collect()
    }
    w_within = np.mean(
        [
            wv[a] @ wv[b]
            for g in groups.values()
            for a in g
            for b in g
            if a < b
        ]
    )
    w_across = np.mean(
        [wv[a] @ wv[b] for a in groups[0] for b in groups[1]]
    )
    assert w_within > w_across + 0.3


# ---------------------------------------------------------- inference


def test_infer_matches_driver_emulation(spark, planted_model):
    """infer_doc_vectors is per-doc-local math — a driver emulation
    with the same shared update rule must reproduce it BIT-identically
    (no cross-partition float-sum variance exists on this path)."""
    from top2vec_spark.operators.doc2vec import (
        _batch_grads,
        _init_vec,
        infer_doc_vectors,
        keep_probs,
        noise_cdf,
    )

    _, _, model = planted_model
    new_docs = [
        (1000, "apple pear apple grape melon plum".split()),
        (1001, "iron zinc cobalt iron nickel".split()),
    ]
    toks = _tokens_df(spark, new_docs)
    out = {
        r["vec_id"]: np.array(r["embedding"])
        for r in infer_doc_vectors(model, toks, epochs=10).collect()
    }
    tid = {t: i for i, t in enumerate(model.terms)}
    cf = np.asarray(model.cf, dtype=np.int64)
    keep = keep_probs(cf, model.params["sample"], int(cf.sum()))
    cdf = noise_cdf(cf)
    p = model.params
    for did, words in new_docs:
        seq = np.array([tid[w] for w in words], dtype=np.int64)
        D = _init_vec(
            np.array([did], dtype=np.int64), 12, p["seed"], salt=17
        )
        for epoch in range(10):
            lr = p["alpha"] - (p["alpha"] - p["min_alpha"]) * epoch / 9
            D = _batch_grads(
                np.array([did], dtype=np.int64), [seq], D,
                model.W_in, model.W_out, keep, cdf, None,
                epoch, lr, p["window"], p["negative"],
                dbow_words=0, seed=p["seed"],
            )[0]
        ref = D[0] / np.linalg.norm(D[0])
        assert np.array_equal(out[did], ref), did


def test_infer_lands_in_planted_group(spark, planted_model):
    _, _, model = planted_model
    new_docs = [
        (2000 + g, [GROUPS[g][i % 5] for i in range(12)])
        for g in range(3)
    ]
    toks = _tokens_df(spark, new_docs)
    inf = {
        r["vec_id"]: np.array(r["embedding"])
        for r in infer_doc_vectors(
            model, toks, epochs=40, alpha=0.5
        ).collect()
    }
    trained = {
        r["vec_id"]: np.array(r["embedding"])
        for r in model.doc_vectors.collect()
    }
    for g in range(3):
        sims = {
            d: float(inf[2000 + g] @ v) for d, v in trained.items()
        }
        # the nearest trained doc must belong to the planted group
        best = max(sims, key=sims.get)
        assert best % 3 == g, (g, best, sims[best])


def test_infer_oov_and_empty(spark, planted_model):
    _, _, model = planted_model
    docs = [
        (3000, "apple qqqqq pear zzzzz".split()),  # OOV terms drop
        (3001, "qqqqq zzzzz".split()),  # fully OOV -> absent
    ]
    out = infer_doc_vectors(model, _tokens_df(spark, docs)).collect()
    ids = {r["vec_id"] for r in out}
    assert ids == {3000}


# ------------------------------------------------------------ facade


def test_facade_presets_and_registration(spark):
    from pyspark.sql import functions as F

    from top2vec_spark.api import Top2VecSpark
    from top2vec_spark.operators.tokens import assign_doc_ids
    from top2vec_spark.sources.pages import generate_pages

    docs = assign_doc_ids(generate_pages(spark, 120)).withColumn(
        "text", F.decode("html", "utf-8")
    )
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True)
    with pytest.raises(ValueError, match="speed parameter needs to be"):
        eng.train_doc2vec(speed="warp")
    with pytest.raises(ValueError, match="no doc2vec model"):
        eng.infer_document_vectors(docs.limit(2))
    model = eng.train_doc2vec(
        speed="test-learn", vector_size=8, epochs=2, window=3
    )
    inf = eng.infer_document_vectors(docs.limit(3), epochs=2).collect()
    assert len(inf) == 3
    for r in inf:
        v = np.array(r["embedding"])
        assert v.shape == (8,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    assert model.W_in.shape[1] == 8
    # registered vectors drive the vector-search surfaces
    hits = eng.search_documents_by_vector(
        [float(x) for x in model.W_in[0]], 3
    )
    assert hits.count() == 3
    top = eng.similar_words([eng.vocab.collect()[0]["term"]], 3)
    assert top.count() == 3


def test_empty_vocab_raises(spark):
    tokens = _tokens_df(spark, [(0, ["solo"])])
    vocab = build_vocab(tokens, min_count=5)  # cf=1 filtered out
    with pytest.raises(ValueError, match="empty vocabulary"):
        train_doc2vec(tokens, vocab, dim=4, epochs=1)
