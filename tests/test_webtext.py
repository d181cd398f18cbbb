"""Webtext operators: Gopher-style repetition stats, URL parsing,
canonicalization dedup (operators/webtext.py). Expected values are
hand-computed on tiny fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top2vec_spark.operators.webtext import (
    canonicalize_url,
    domain_stats,
    repetition_stats,
    url_dedup,
    with_url_parts,
)


def _rep(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in repetition_stats(df).collect()
    }


def test_repetition_stats_hand_computed(spark):
    out = _rep(
        spark,
        [
            # words: a b a c a b -> top word 'a' 3/6; bigrams
            # (a b, b a, a c, c a, a b) -> top 'a b' 2/5; trigrams
            # (a b a, b a c, a c a, c a b) -> 4 occ, 4 distinct -> 0
            (0, "a b a c a b"),
            # all identical: top word 4/4; bigram 3/3; trigrams 2 occ
            # 1 distinct -> dup 1/2
            (1, "x x x x"),
            (2, "lone"),  # 1 word: bigram/trigram fracs 0
            (3, "two words"),  # 2 words: trigram frac 0, bigram 1/1
        ],
    )
    r0 = out[0]
    assert r0["n_words"] == 6
    assert r0["top_word_frac"] == pytest.approx(3 / 6)
    assert r0["uniq_word_frac"] == pytest.approx(3 / 6)  # {a,b,c} of 6
    assert r0["top_bigram_frac"] == pytest.approx(2 / 5)
    assert r0["dup_trigram_frac"] == 0.0
    r1 = out[1]
    assert r1["n_words"] == 4
    assert r1["top_word_frac"] == 1.0
    assert r1["top_bigram_frac"] == 1.0
    assert r1["dup_trigram_frac"] == pytest.approx(1 / 2)
    r2 = out[2]
    assert (r2["n_words"], r2["top_word_frac"]) == (1, 1.0)
    assert r2["top_bigram_frac"] == 0.0 and r2["dup_trigram_frac"] == 0.0
    r3 = out[3]
    assert r3["n_words"] == 2
    assert r3["top_bigram_frac"] == 1.0
    assert r3["dup_trigram_frac"] == 0.0


def test_repetition_stats_whitespace_and_empty(spark):
    # Multi-space / tab runs collapse; all-space text yields no row
    # from the explode (no grams) — callers left-join if they need
    # empty docs back, same convention as doc_stats.
    out = _rep(spark, [(0, "  a   b\t a  "), (1, "q")])
    assert out[0]["n_words"] == 3
    assert out[0]["top_word_frac"] == pytest.approx(2 / 3)


def test_corpus_filter_rules(spark):
    from top2vec_spark.operators.webtext import corpus_filter

    # 6-letter distinct words: alpha = 6/7 ≈ 0.857 > 0.82 threshold
    good = " ".join(
        f"word{chr(97 + i % 26)}{chr(97 + i // 26)}" for i in range(40)
    )
    df = spark.createDataFrame(
        [
            (0, good),  # 40 distinct letter words -> keeps
            (1, "x y"),  # too short + repetitive profile
            (2, " ".join(["dup"] * 50)),  # top_word/uniq/dup_trigram fail
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in corpus_filter(df).collect()}
    assert rows[0]["keep"] is True and rows[0]["fails"] == ""
    assert rows[1]["keep"] is False and "len" in rows[1]["fails"]
    f2 = rows[2]["fails"]
    assert rows[2]["keep"] is False
    assert "top_word" in f2 and "uniq" in f2 and "dup_trigram" in f2


def test_url_parts(spark):
    df = spark.createDataFrame(
        [
            (0, "https://www.ex.co.uk/a/b/c?q=1"),
            (1, "http://host.test/"),
            (2, "https://bare.io"),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in with_url_parts(df).collect()}
    assert rows[0]["host"] == "www.ex.co.uk"
    assert rows[0]["tld"] == "uk"
    assert rows[0]["path"] == "/a/b/c"
    assert rows[0]["path_depth"] == 3
    assert rows[1]["path_depth"] == 0
    assert rows[2]["host"] == "bare.io" and rows[2]["path_depth"] == 0


def test_canonicalize_url(spark):
    cases = [
        ("HTTPS://WWW.Ex.com/A/b/?utm=1#frag", "ex.com/a/b"),
        ("http://ex.com/p/1", "ex.com/p/1"),
        ("https://ex.com///", "ex.com"),
        ("http://www.ex.com", "ex.com"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    bad = df.withColumn("got", canonicalize_url(F.col("url"))).filter(
        F.col("got") != F.col("want")
    )
    assert bad.count() == 0, bad.collect()


def test_url_dedup_keeper_is_min_id(spark):
    df = spark.createDataFrame(
        [
            (5, "http://www.ex.com/p/1/"),
            (2, "https://ex.com/p/1?x=2"),
            (9, "https://ex.com/p/2"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canon_url"]: r for r in url_dedup(df).collect()}
    assert rows["ex.com/p/1"]["keeper"] == 2
    assert rows["ex.com/p/1"]["n_dupes"] == 1
    assert rows["ex.com/p/2"]["n_dupes"] == 0


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "en", "abcd", "https://a.test/x/1"),
            (1, "de", "ab", "https://a.test/x/y/2"),
            (2, "en", "abcdef", "https://b.test/1"),
        ],
        "doc_id long, lang string, text string, url string",
    )
    rows = {r["host"]: r for r in domain_stats(df).collect()}
    a = rows["a.test"]
    assert (a["n_pages"], a["n_langs"], a["max_path_depth"]) == (2, 2, 3)
    assert a["avg_chars"] == pytest.approx(3.0)
    assert rows["b.test"]["n_pages"] == 1


def test_pii_scrub(spark):
    from top2vec_spark.operators.webtext import pii_scrub

    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@sub.ex.org and boss@ex.io end"),
            (1, "server at 10.0.255.3 port open"),
            (2, "call +1-555-0134 or +49-30-12345678 today"),
            # email host wins over the IPv4 rule (applied first)
            (3, "root@1.2.3.4 logged in"),
            (4, "nothing here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[0]["n_email"] == 2
    assert rows[0]["scrubbed"] == "mail <EMAIL> and <EMAIL> end"
    assert rows[1]["n_ipv4"] == 1
    assert rows[1]["scrubbed"] == "server at <IP> port open"
    assert rows[2]["n_phone"] == 2
    assert rows[2]["scrubbed"] == "call <PHONE> or <PHONE> today"
    # '@1.2.3.4' has no alpha TLD, so the email rule skips it and the
    # local part survives; the IPv4 rule then takes the address.
    assert rows[3]["n_email"] == 0
    assert rows[3]["n_ipv4"] == 1
    assert rows[3]["scrubbed"] == "root@<IP> logged in"
    assert (
        rows[4]["n_email"] == rows[4]["n_ipv4"] == rows[4]["n_phone"] == 0
    )
    assert rows[4]["scrubbed"] == "nothing here"


def test_line_dedup_corpus_level(spark):
    from top2vec_spark.operators.webtext import line_dedup

    df = spark.createDataFrame(
        [
            (0, "header\nalpha beta\nfooter"),
            (1, "header\ngamma\nfooter"),
            (2, "header\nalpha beta\n\nunique"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # doc 0 is the global first occurrence of all its lines
    assert rows[0]["clean"] == "header\nalpha beta\nfooter"
    assert (rows[0]["n_lines"], rows[0]["n_kept"]) == (3, 3)
    # doc 1 keeps only its unique line
    assert rows[1]["clean"] == "gamma"
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (3, 1)
    # doc 2: header + 'alpha beta' are dupes; the empty line is
    # always kept (formatting), 'unique' survives
    assert rows[2]["clean"] == "\nunique"
    assert (rows[2]["n_lines"], rows[2]["n_kept"]) == (4, 2)


def test_clean_corpus_pipeline(spark):
    from top2vec_spark.operators.webtext import clean_corpus

    body = (
        "the quick brown fox jumps over a lazy dog near the bank "
        "contact bob@ex.org"
    )
    df = spark.createDataFrame(
        [
            (0, f"header\n{body}\nfooter"),
            (1, f"header\n{body}\nfooter"),  # exact dup of 0
            (2, "header\nfooter"),  # every line duped -> empty
            (
                3,
                "header\ncompletely different words appear in this line "
                "with plenty of variety here today\nfooter",
            ),
            (4, " ".join(["x"] * 30)),  # repetition monster
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in clean_corpus(df, min_words=10, min_alpha=0.6).collect()
    }
    # doc 1 is byte-identical to doc 0 -> dropped before any other
    # stage, carries no downstream stats
    assert (rows[1]["keep"], rows[1]["reason"]) == (False, "exact_dup")
    assert rows[1]["text_final"] is None and rows[1]["n_lines"] is None
    # doc 0 survives dedup, gets its email scrubbed, then trips the
    # top_word rule ('the' 2/16 = 0.125 > 0.12)
    assert rows[0]["reason"] == "top_word"
    assert rows[0]["n_pii"] == 1
    assert "<EMAIL>" in rows[0]["text_final"]
    assert (rows[0]["n_lines"], rows[0]["n_kept"]) == (3, 3)
    # doc 2's lines all belong to doc 0 after line dedup -> zero words
    assert (rows[2]["keep"], rows[2]["reason"]) == (False, "empty")
    assert rows[2]["n_kept"] == 0
    # doc 3 keeps its unique body line and passes every rule
    assert (rows[3]["keep"], rows[3]["reason"]) == (True, "")
    assert rows[3]["n_kept"] == 1
    # doc 4 fails multiple rules with labels in rule order
    assert rows[4]["reason"] == "alpha,uniq,top_word,dup_trigram"


def test_decontaminate(spark):
    from top2vec_spark.operators.webtext import decontaminate

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x y z w"), (2, "a b")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("q q a b c d q",)], "text string"
    )
    rows = {
        r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()
    }
    # doc 0 shares trigrams 'a b c' and 'b c d' with the benchmark
    assert (rows[0]["n_hits"], rows[0]["contaminated"]) == (2, True)
    assert (rows[1]["n_hits"], rows[1]["contaminated"]) == (0, False)
    # fewer than n words -> clean by construction
    assert (rows[2]["n_hits"], rows[2]["contaminated"]) == (0, False)
