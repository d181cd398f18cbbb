"""Positional fulltext operators vs independent pure-Python oracles.

Every assertion recomputes the expected answer from the raw token
lists with plain Python (no Spark, no shared code path): phrase scan,
brute-force minimal-cover enumeration, window-hit counting.
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from top2vec_spark.config import BM25Config
from top2vec_spark.operators.bm25 import idf
from top2vec_spark.operators.corpus_stats import (
    build_doc_stats,
    build_vocab,
    compute_globals,
)
from top2vec_spark.operators.positional import (
    best_snippet,
    bool_and_topk,
    min_cover_span,
    phrase_occurrences,
    phrase_topk,
)
from top2vec_spark.operators.tokens import tokenize_docs

CORPUS = [
    (0, "fast table scan beats slow table scan on a fast table"),
    (1, "the table is fast and the scan is slow"),
    (2, "fast fast table table fast table"),
    (3, "spark merges sorted runs in a window of rows"),
    (4, "window merge window merge spark spark"),
    (5, "no relevant words here at all"),
    (6, "fast table"),
]


def _pytoks(text: str) -> list[str]:
    # the engine tokenizer on this ASCII corpus = lowercase word split
    # with len >= 2 (single-letter 'a' dropped, as MIN_TOKEN_LEN=2)
    import re

    return [
        t
        for t in re.findall(r"[a-z_]+", text.lower())
        if 2 <= len(t) <= 15 and not t.startswith("_")
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def tokens(spark, docs):
    return tokenize_docs(docs, ascii_fast_path=True).cache()


def _py_phrase_occ(phrase):
    out = []
    for doc_id, text in CORPUS:
        toks = _pytoks(text)
        n = len(phrase)
        for s in range(len(toks) - n + 1):
            if toks[s : s + n] == list(phrase):
                out.append((doc_id, s))
    return sorted(out)


def test_phrase_occurrences_match_python_scan(tokens):
    got = sorted(
        (r["doc_id"], r["start"])
        for r in phrase_occurrences(tokens, ["fast", "table"]).collect()
    )
    assert got == _py_phrase_occ(["fast", "table"])
    assert got  # non-trivial fixture


def test_phrase_repeated_word(tokens):
    got = sorted(
        (r["doc_id"], r["start"])
        for r in phrase_occurrences(tokens, ["fast", "fast"]).collect()
    )
    assert got == _py_phrase_occ(["fast", "fast"]) == [(2, 0)]


def test_phrase_three_words_and_join_order(tokens, docs):
    vocab = build_vocab(tokens, min_count=0)
    want = _py_phrase_occ(["fast", "table", "scan"])
    for v in (None, vocab):  # with/without rarest-first reordering
        got = sorted(
            (r["doc_id"], r["start"])
            for r in phrase_occurrences(
                tokens, ["fast", "table", "scan"], vocab=v
            ).collect()
        )
        assert got == want == [(0, 0)]


def test_phrase_absent_term_empty(tokens):
    assert phrase_occurrences(tokens, ["fast", "zebra"]).count() == 0


def test_phrase_topk_scores(tokens):
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    rows = phrase_topk(tokens, ds, g, ["fast", "table"], k=10).collect()
    occ = _py_phrase_occ(["fast", "table"])
    by_doc = {}
    for d, _ in occ:
        by_doc[d] = by_doc.get(d, 0) + 1
    dfp = len(by_doc)
    dls = {d: len(_pytoks(t)) for d, t in CORPUS}
    avgdl = sum(dls.values()) / len([d for d in dls.values() if d > 0])
    cfg = BM25Config()
    exp = {}
    for d, tf in by_doc.items():
        i = idf(g.n_docs, dfp)
        exp[d] = (
            i
            * (tf * (cfg.k1 + 1))
            / (tf + cfg.k1 * (1 - cfg.b + cfg.b * dls[d] / avgdl))
        )
    got = {r["doc_id"]: (r["tf"], r["score"]) for r in rows}
    assert set(got) == set(by_doc)
    for d in exp:
        assert got[d][0] == by_doc[d]
        assert math.isclose(got[d][1], exp[d], rel_tol=1e-12)
    # ordering contract
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_phrase_topk_reuses_tf_exchange(spark, docs):
    """The phrase df is consumed via crossJoin(broadcast(count)) over
    the SAME tf aggregate — the final adaptive plan must show
    ReusedExchange nodes for the occurrence-join subtree (one
    computation of the expensive match set, no persist, no driver
    count action). Pinned on UNCACHED tokens: a cached input hides
    the reuse behind the InMemoryRelation (still a single
    computation, via the cache instead) — and the CacheManager
    substitutes the module fixture's cached tokens into ANY matching
    subtree, so this test uses its own distinct corpus."""
    fresh = spark.createDataFrame(
        [(i, t + " padding") for i, t in CORPUS], "doc_id long, text string"
    )
    toks = tokenize_docs(fresh, ascii_fast_path=True)  # no .cache()
    ds = build_doc_stats(toks)
    g = compute_globals(ds)
    res = phrase_topk(toks, ds, g, ["fast", "table"], k=10)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_phrase_topk_no_match_empty(tokens):
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    out = phrase_topk(tokens, ds, g, ["zebra", "table"], k=10)
    assert out.count() == 0
    assert out.columns == ["doc_id", "tf", "score"]


def test_bool_and_membership_and_scores(spark, tokens):
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens, min_count=0)
    rows = bool_and_topk(
        spark, tokens, ds, g, vocab, ["fast", "table", "scan"], k=10
    ).collect()
    # docs containing ALL three
    want_docs = {
        d
        for d, t in CORPUS
        if {"fast", "table", "scan"} <= set(_pytoks(t))
    }
    assert {r["doc_id"] for r in rows} == want_docs == {0, 1}
    # score equals the plain BM25 sum over the three terms
    dls = {d: len(_pytoks(t)) for d, t in CORPUS}
    avgdl = sum(v for v in dls.values() if v > 0) / len(
        [v for v in dls.values() if v > 0]
    )
    cfg = BM25Config()
    for r in rows:
        toks = _pytoks(dict(CORPUS)[r["doc_id"]])
        exp = 0.0
        for term in ("fast", "table", "scan"):
            tf = toks.count(term)
            dfq = sum(
                1 for _, t in CORPUS if term in _pytoks(t)
            )
            exp += (
                idf(g.n_docs, dfq)
                * (tf * (cfg.k1 + 1))
                / (
                    tf
                    + cfg.k1
                    * (1 - cfg.b + cfg.b * dls[r["doc_id"]] / avgdl)
                )
            )
        assert math.isclose(r["score"], exp, rel_tol=1e-9)


def test_bool_and_unknown_term_raises(spark, tokens):
    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    vocab = build_vocab(tokens, min_count=0)
    with pytest.raises(ValueError, match="not in vocabulary"):
        bool_and_topk(spark, tokens, ds, g, vocab, ["zebra"], k=5)


def _py_min_span(terms):
    out = {}
    for doc_id, text in CORPUS:
        toks = _pytoks(text)
        occ = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
        if any(not v for v in occ.values()):
            continue
        best = min(
            max(c) - min(c)
            for c in itertools.product(*(occ[t] for t in terms))
        )
        out[doc_id] = best
    return out


def test_min_cover_span_matches_bruteforce(tokens):
    for terms in (["fast", "scan"], ["fast", "table", "slow"], ["window", "spark"]):
        got = {
            r["doc_id"]: r["span"]
            for r in min_cover_span(tokens, terms).collect()
        }
        assert got == _py_min_span(terms)


def test_min_cover_span_needs_two_terms(tokens):
    with pytest.raises(ValueError, match="2 distinct"):
        min_cover_span(tokens, ["fast", "FAST"])


def test_min_cover_span_partition_invariance(tokens):
    a = sorted(
        map(tuple, min_cover_span(tokens, ["fast", "slow"]).collect())
    )
    b = sorted(
        map(
            tuple,
            min_cover_span(tokens.repartition(7), ["fast", "slow"]).collect(),
        )
    )
    assert a == b


def _py_best_snippet(terms, width):
    out = {}
    for doc_id, text in CORPUS:
        toks = _pytoks(text)
        hitpos = [i for i, t in enumerate(toks) if t in terms]
        if not hitpos:
            continue
        best = None
        for s in hitpos:
            h = sum(1 for p in hitpos if s <= p < s + width)
            if best is None or h > best[1]:
                best = (s, h)
        s, h = best
        out[doc_id] = (s, h, " ".join(toks[s : s + width]))
    return out


def test_best_snippet_matches_python(tokens):
    width = 4
    got = {
        r["doc_id"]: (r["start"], r["hits"], r["snippet"])
        for r in best_snippet(tokens, ["fast", "table"], width=width).collect()
    }
    assert got == _py_best_snippet({"fast", "table"}, width)
    assert 5 not in got  # doc with no hits emits no row


def test_best_snippet_tie_smallest_start(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb cc aa dd cc")], "doc_id long, text string"
    )
    toks = tokenize_docs(docs, ascii_fast_path=True)
    r = best_snippet(toks, ["aa", "cc"], width=3).collect()[0]
    # windows starting at 0 ("aa bb cc") and 2/3 all have 2 hits;
    # the tie-break picks start=0
    assert (r["start"], r["hits"], r["snippet"]) == (0, 2, "aa bb cc")


def test_best_snippet_width_validation(tokens):
    with pytest.raises(ValueError, match="width"):
        best_snippet(tokens, ["fast"], width=0)


# ---------------------------------------------------------------------------
# Positional sidecar index
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pos_index(spark, tokens, tmp_path_factory):
    from top2vec_spark.operators.positional import build_position_index

    path = str(tmp_path_factory.mktemp("posidx"))
    build_position_index(tokens, path, n_buckets=8)
    return path


def test_indexed_phrase_equals_tokens_path(spark, tokens, pos_index):
    from top2vec_spark.operators.positional import load_position_postings

    pruned = load_position_postings(spark, pos_index, ["fast", "table"])
    got = sorted(
        (r["doc_id"], r["start"])
        for r in phrase_occurrences(pruned, ["fast", "table"]).collect()
    )
    assert got == _py_phrase_occ(["fast", "table"])


def test_indexed_min_span_equals_tokens_path(spark, tokens, pos_index):
    from top2vec_spark.operators.positional import load_position_postings

    terms = ["fast", "table", "slow"]
    pruned = load_position_postings(spark, pos_index, terms)
    got = {
        r["doc_id"]: r["span"] for r in min_cover_span(pruned, terms).collect()
    }
    assert got == _py_min_span(terms)


def test_indexed_scan_prunes_buckets(spark, pos_index):
    """The pruned read must touch ONLY the query terms' bucket dirs —
    directory pruning is the scale contract of the sidecar."""
    from top2vec_spark.operators.positional import (
        load_position_postings,
        term_buckets,
    )

    terms = ["fast", "table"]
    want = set(term_buckets(spark, terms, 8))
    pruned = load_position_postings(spark, pos_index, terms)
    files = [
        r["f"]
        for r in pruned.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    ]
    seen = {
        int(f.split("pbucket=")[1].split("/")[0]) for f in files
    }
    assert seen <= want
    # and the plan carries the partition filter (not a post-scan filter)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "pbucket" in plan


def test_facade_positional_methods(spark, docs):
    from top2vec_spark.api import Top2VecSpark

    eng = Top2VecSpark(spark, docs, ascii_fast_path=True, min_count=0)
    ph = eng.search_documents_by_phrase(
        ["fast", "table"], 5, return_documents=False
    ).collect()
    assert [r["doc_id"] for r in ph]
    assert all(r["tf"] >= 1 for r in ph)
    con = eng.search_documents_by_keywords_all(
        ["fast", "table", "scan"], 5, return_documents=False
    ).collect()
    assert {r["doc_id"] for r in con} == {0, 1}
    prox = eng.search_documents_by_proximity(
        ["fast", "scan"], 3, return_documents=False
    ).collect()
    spans = {r["doc_id"]: r["span"] for r in prox}
    want = _py_min_span(["fast", "scan"])
    assert all(want[d] == s for d, s in spans.items())
    snip = eng.get_search_snippets(["fast", "table"], width=4).collect()
    assert {r["doc_id"]: (r["start"], r["hits"], r["snippet"]) for r in snip} \
        == _py_best_snippet({"fast", "table"}, 4)
    with pytest.raises(ValueError):
        eng.search_documents_by_phrase(["zzznotaword"], 5)


def test_facade_sidecar_lifecycle(spark, tmp_path):
    """store_positions=True: phrase search reads the sidecar while it
    is fresh, falls back to raw tokens after an epoch append (stale
    next_doc_id), and honors tombstones after a delete."""
    from top2vec_spark.api import Top2VecSpark

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True, min_count=0)
    raw = [
        (r["doc_id"], r["tf"], round(r["score"], 9))
        for r in eng.search_documents_by_phrase(
            ["fast", "table"], 5, return_documents=False
        ).collect()
    ]
    eng.build_index(str(tmp_path / "idx"), store_positions=True)
    src = eng._positional_tokens(["fast", "table"])
    assert any("positions" in f for f in src.inputFiles())
    via_idx = [
        (r["doc_id"], r["tf"], round(r["score"], 9))
        for r in eng.search_documents_by_phrase(
            ["fast", "table"], 5, return_documents=False
        ).collect()
    ]
    assert via_idx == raw
    # delete the top phrase doc: it must drop out, later ranks move up
    top_doc = raw[0][0]
    eng.delete_documents([top_doc])
    after = [
        r["doc_id"]
        for r in eng.search_documents_by_phrase(
            ["fast", "table"], 5, return_documents=False
        ).collect()
    ]
    assert top_doc not in after
    assert after == [d for d, _, _ in raw if d != top_doc][: len(after)]
    # epoch append bumps next_doc_id -> the stale sidecar is bypassed
    new = spark.createDataFrame(
        [(100, "fast table fast table")], "doc_id long, text string"
    )
    eng2 = eng.add_documents(new)
    src2 = eng2._positional_tokens(["fast", "table"])
    assert not any("positions" in f for f in src2.inputFiles())
    ph2 = eng2.search_documents_by_phrase(
        ["fast", "table"], 5, return_documents=False
    ).collect()
    # the appended doc (remapped id) has tf=2 and must now appear
    assert any(r["tf"] == 2 and r["doc_id"] >= 100 for r in ph2)


def test_indexed_phrase_topk_scores_match_raw(spark, tokens, pos_index):
    """Full indexed phrase query (pruned postings -> occurrences ->
    BM25 pseudo-term) is row- and score-identical to the raw-tokens
    path when given the same corpus stats."""
    from top2vec_spark.operators.positional import load_position_postings

    ds = build_doc_stats(tokens)
    g = compute_globals(ds)
    raw = sorted(
        map(tuple, phrase_topk(tokens, ds, g, ["fast", "table"], 10).collect())
    )
    pruned = load_position_postings(spark, pos_index, ["fast", "table"])
    idx = sorted(
        map(tuple, phrase_topk(pruned, ds, g, ["fast", "table"], 10).collect())
    )
    assert raw == idx


def test_wildcard_fuzzy_route_through_fresh_sidecar(spark, tmp_path):
    """r06 routing optimization: wildcard and fuzzy atoms expand
    against the vocabulary BEFORE source routing, so with a fresh
    sidecar the query reads term-pruned positional postings instead of
    re-tokenizing the corpus — and the results are identical to the
    raw-tokens execution."""
    from top2vec_spark.api import Top2VecSpark

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    eng = Top2VecSpark(spark, docs, ascii_fast_path=True, min_count=0)

    def run(q):
        return [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search(q, 5, return_documents=False).collect()
        ]

    # raw-tokens results (no index yet)
    raw_wild = run("tab?e spark")
    raw_fuzz = run("tible~1 spark")

    eng.build_index(str(tmp_path / "idx_wf"), store_positions=True)
    # the router must now pick the sidecar for both shapes
    for q in ("tab?e spark", "tible~1 spark"):
        _, src, _ = eng._parse_and_route(q)
        files = src.inputFiles()
        assert any("positions" in f for f in files), q
        assert not any("documents" in f for f in files), q
    assert run("tab?e spark") == raw_wild
    assert run("tible~1 spark") == raw_fuzz

    # unexpandable atoms still raise the executor's message verbatim
    with pytest.raises(ValueError, match="no vocabulary terms match"):
        eng.search("zzz*", 5)
    with pytest.raises(ValueError, match="edit distance"):
        eng.search("zzzzzzz~1", 5)
