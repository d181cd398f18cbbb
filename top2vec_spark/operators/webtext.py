"""Webtext corpus operators: Gopher-style repetition statistics, URL
parsing / per-domain aggregation, and URL-canonicalization dedup.

Not in the reference (Top2Vec has no corpus-hygiene surface); added
under the engine's training-data-pipeline mandate for Common-Crawl
-style web pages (BASELINE.json input_hint). The repetition signals
re-express the public Gopher rules (Rae et al. 2021 §A.1.1) as
count-based fractions so they are exactly reproducible by a SQL
oracle:

  top_word_frac    — occurrences of the most frequent word / n_words
  top_bigram_frac  — occurrences of the most frequent word-2-gram
                     / total 2-gram occurrences
  dup_trigram_frac — fraction of 3-gram occurrences that are repeats
                     (total - distinct) / total

Scale notes (100 TB): the repetition signals are per-document, so
they run as a ZERO-SHUFFLE narrow Arrow kernel (one Counter pass per
doc) — the declarative explode-into-corpus-wide-agg alternative
shuffles 3x the corpus word count for per-doc keys and measured 0.33
scaling efficiency 8->32 cores vs ~linear for the kernel
(BENCH/SCALING_WEBTEXT_r5.md). URL parsing is pure codegen'd string
expressions at scan speed; line_dedup is the only corpus-global op
here (hash-keyed agg + join, linear).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def repetition_stats(
    docs: DataFrame, text_col: str = "text", passthrough: tuple = ()
) -> DataFrame:
    """Per-document repetition signals over whitespace words.

    Returns (doc_id, *passthrough, n_words long, top_word_frac,
    uniq_word_frac, top_bigram_frac, dup_trigram_frac — all double in
    [0,1]). Docs with < 2 (resp. < 3) words report 0.0 for the bigram
    (trigram) fractions; docs with ZERO words emit no row.

    Implementation: a zero-shuffle narrow mapInPandas kernel — one
    collections.Counter pass per document over words / word-pairs /
    word-triples (text in, six numbers out). Every statistic here is
    per-document, so the declarative alternative (explode tagged
    1/2/3-grams into a corpus-wide hash agg keyed (doc_id, n, gram))
    pushes ~3x the corpus's word count through an Exchange for
    nothing: measured at 400k pages it was 4.7x slower at 32 cores
    and scaled at 0.33 efficiency 8->32 vs ~linear for this kernel
    (BENCH/SCALING_WEBTEXT_r5.md). At 100 TB that shuffle is the
    whole job; this pass is embarrassingly parallel.

    Word-split semantics mirror the SQL oracle exactly: trim SPACES
    only (Spark/DuckDB `trim` default), split on ASCII `\\s+`
    (re.ASCII == Java-regex default char class), drop empties.
    Fractions are int/int true division — identical IEEE doubles in
    Python, Spark SQL, and DuckDB.
    """
    from pyspark.sql import types as T

    in_schema = docs.schema
    out_schema = T.StructType(
        [in_schema["doc_id"]]
        + [in_schema[c] for c in passthrough]
        + [
            T.StructField("n_words", T.LongType()),
            T.StructField("top_word_frac", T.DoubleType()),
            T.StructField("uniq_word_frac", T.DoubleType()),
            T.StructField("top_bigram_frac", T.DoubleType()),
            T.StructField("dup_trigram_frac", T.DoubleType()),
        ]
    )
    cols = (
        ["doc_id"]
        + list(passthrough)
        + [
            "n_words",
            "top_word_frac",
            "uniq_word_frac",
            "top_bigram_frac",
            "dup_trigram_frac",
        ]
    )
    base = docs.select("doc_id", *passthrough, text_col)

    def kernel(pdfs):
        import re
        from collections import Counter

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        for pdf in pdfs:
            recs = []
            extras = [pdf[c] for c in passthrough]
            for i, text in enumerate(pdf[text_col]):
                words = ws.split((text or "").strip(" "))
                words = [w for w in words if w]
                n = len(words)
                if n == 0:
                    continue
                wc = Counter(words)
                top_w = max(wc.values()) / n
                uniq = len(wc) / n
                if n >= 2:
                    top_b = max(Counter(zip(words, words[1:])).values()) / (
                        n - 1
                    )
                else:
                    top_b = 0.0
                if n >= 3:
                    # words contain no spaces, so tuple identity ==
                    # space-joined-gram identity
                    tc = Counter(zip(words, words[1:], words[2:]))
                    dup_t = (n - 2 - len(tc)) / (n - 2)
                else:
                    dup_t = 0.0
                recs.append(
                    (pdf["doc_id"].iat[i],)
                    + tuple(e.iat[i] for e in extras)
                    + (n, top_w, uniq, top_b, dup_t)
                )
            yield pd.DataFrame(recs, columns=cols)

    return base.mapInPandas(kernel, out_schema)


def corpus_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 30,
    min_alpha: float = 0.82,
    min_uniq: float = 0.40,
    max_top_word: float = 0.12,
    max_dup_trigram: float = 0.10,
) -> DataFrame:
    """Composite C4/Gopher-style keep/drop filter. Returns
    (doc_id, keep boolean, fails string — comma-joined names of the
    failed rules, '' when kept).

    All rules are evaluated on ROUND-6 features so threshold
    comparisons are bit-stable across engines (a raw-double boundary
    case could round differently than it compares). Docs that produce
    zero words emit no repetition row and are dropped — at pipeline
    scale empty docs should be culled by a length predicate before
    this operator.

    Zero-shuffle end to end: the alpha ratio is computed as a codegen
    column BEFORE the repetition kernel and carried through it as a
    passthrough column, so there is no join anywhere in the plan.
    """
    t = F.col(text_col)
    alpha = (
        F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
        / F.greatest(F.length(t), F.lit(1))
    ).cast("double")
    rep = repetition_stats(
        docs.withColumn("alpha_r", F.round(alpha, 6)),
        text_col,
        passthrough=("alpha_r",),
    )
    joined = rep.select(
        "doc_id",
        "alpha_r",
        "n_words",
        F.round("top_word_frac", 6).alias("topw_r"),
        F.round("uniq_word_frac", 6).alias("uniq_r"),
        F.round("dup_trigram_frac", 6).alias("trig_r"),
    )
    rules = [
        ("len", F.col("n_words") >= min_words),
        ("alpha", F.col("alpha_r") >= min_alpha),
        ("uniq", F.col("uniq_r") >= min_uniq),
        ("top_word", F.col("topw_r") <= max_top_word),
        ("dup_trigram", F.col("trig_r") <= max_dup_trigram),
    ]
    # concat_ws skips NULLs, so only failed rule names appear.
    fails = F.concat_ws(
        ",", *[F.when(~cond, F.lit(name)) for name, cond in rules]
    )
    return joined.select(
        "doc_id", (fails == "").alias("keep"), fails.alias("fails")
    )


# ---------------------------------------------------------------------------
# URL operators
# ---------------------------------------------------------------------------
def with_url_parts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds (host, tld, path, path_depth) parsed from an absolute
    http(s) URL. Uses Spark's built-in parse_url (JVM, codegen) for
    host/path; tld is the last dot-segment of the host."""
    u = F.col(url_col)
    host = F.parse_url(u, F.lit("HOST"))
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    return (
        pages.withColumn("host", host)
        .withColumn("tld", F.regexp_extract(host, r"([^.]+)$", 1))
        .withColumn("path", path)
        .withColumn(
            "path_depth",
            F.size(F.filter(F.split(path, "/"), lambda x: x != "")),
        )
    )


def domain_stats(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-host rollup of a pages frame (n_pages, distinct langs, mean
    text length, max path depth). Single hash aggregation keyed by
    host; at CC scale host is the natural partition key and the
    head-host skew is bounded by map-side combine (one partial row per
    host per task)."""
    p = with_url_parts(pages)
    return p.groupBy("host", "tld").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("lang").alias("n_langs"),
        F.avg(F.length(F.col(text_col))).alias("avg_chars"),
        F.max("path_depth").alias("max_path_depth"),
    )


def canonicalize_url(url_col: Column) -> Column:
    """Canonical URL form for dedup: lowercase; strip scheme, a
    leading 'www.', query string, fragment, and any trailing slashes.
    Plain anchored regexps so a SQL oracle reproduces it exactly."""
    c = F.lower(url_col)
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"[?#].*$", "")
    c = F.regexp_replace(c, r"/+$", "")
    return c


def url_dedup(
    pages: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group pages by canonical URL; keep the smallest id as the
    canonical representative. Returns (canon_url, keeper long,
    n_dupes long). One hash aggregation keyed by canon_url."""
    return (
        pages.withColumn("canon_url", canonicalize_url(F.col(url_col)))
        .groupBy("canon_url")
        .agg(
            F.min(id_col).cast("long").alias("keeper"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dupes"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------
# Applied in listed order; each stage counts matches on the text AS
# SCRUBBED SO FAR, then replaces them — so the counts are exactly
# "what this stage removed" and the pipeline is reproducible by any
# engine that applies the same regexps in the same order. Patterns
# stay inside the Java-regex / RE2 common subset (no backrefs, no
# lookaround) so a DuckDB oracle matches byte-for-byte.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{7,14}\d", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails, IPv4 addresses, and international phone numbers
    with typed placeholder tokens. Adds (n_email, n_ipv4, n_phone —
    int counts of replacements) and `scrubbed` (the cleaned text).

    Email runs first so an address's host part is consumed before the
    IPv4 rule can see it (user@1.2.3.4). Pure codegen'd string
    expressions — scan-speed at 100 TB, no shuffle, no Python.
    """
    t = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(
            F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{name}")
        )
        t = F.regexp_replace(t, pat, repl)
    return docs.select("*", *counts, t.alias("scrubbed"))


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """Corpus-LEVEL exact line dedup (the C4 §2.2 rule: keep one
    occurrence of every distinct line across the whole corpus, drop
    the rest — kills boilerplate headers/footers/nav chrome shared by
    millions of pages). The keeper is the lexicographically-first
    occurrence by (doc_id, pos), so the result is deterministic at
    any parallelism. Empty lines are passed through unchanged (they
    carry formatting, not content).

    Returns (id_col, clean string — surviving lines rejoined in
    original order, n_lines int, n_kept int).

    Scale plan (100 TB): posexplode (narrow) -> ONE hash agg keyed by
    (xxhash64(line), length(line)) with map-side combine computing the
    min (doc_id, pos) struct -> shuffle join back on the same key ->
    per-doc re-assembly agg. Three shuffles, all linear in total line
    count. The head-line skew (a footer in 50% of docs) is safe in
    the agg (partial min per task); the join's hot key is one row on
    the build side, so AQE skew-split handles the probe side.

    Deliberately NOT the cheaper-looking one-shuffle formulation
    (row_number() over (partition by line order by doc_id, pos)): a
    window partition is one task, so a boilerplate line shared by 30%
    of a trillion pages would serialize 30% of the corpus through a
    single sort — the agg+join costs one more exchange but has no
    single-task key anywhere. The oracle uses the window form (DuckDB,
    sf0.01) where skew cannot exist; semantics are identical.
    """
    d, p = F.col(id_col), F.col("pos")
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("pos", "line"),
    )
    nonempty = lines.filter(F.col("line") != "")
    key = [F.xxhash64("line").alias("h"), F.length("line").alias("hl")]
    firsts = nonempty.groupBy(*key).agg(
        F.min(F.struct(d.alias("d"), p.alias("p"))).alias("first")
    )
    marked = nonempty.join(
        firsts, (F.xxhash64("line") == F.col("h")) & (F.length("line") == F.col("hl"))
    ).select(
        id_col,
        "pos",
        "line",
        ((F.col("first.d") == d) & (F.col("first.p") == p)).alias("keep"),
    )
    # re-attach empty lines as always-kept so reassembly preserves them
    empties = lines.filter(F.col("line") == "").select(
        id_col, "pos", "line", F.lit(True).alias("keep")
    )
    per_doc = marked.unionByName(empties).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lines"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            line_sep,
        ).alias("clean"),
    )
    return per_doc


def clean_corpus(
    docs: DataFrame, text_col: str = "text", **filter_kwargs
) -> DataFrame:
    """End-to-end training-corpus hygiene pipeline, one lazy plan:

      1. whole-document exact dedup (keeper = min doc_id) — FIRST,
         because it is the cheapest stage and the biggest volume cut
         at crawl scale, and later stages never see the drops;
      2. corpus-level line dedup (`line_dedup`) on the survivors;
      3. PII scrubbing (`pii_scrub`) of the line-deduped text;
      4. composite quality filter (`corpus_filter`, kwargs forwarded)
         on the scrubbed text.

    Ordering note: stage 1 MUST precede stage 2 — after corpus-level
    line dedup a given line survives in exactly one document, so two
    documents can never again have equal text and a later exact-dedup
    stage would be dead code (an exact duplicate's lines all belong
    to its twin, leaving it empty — caught here as 'exact_dup'
    up-front instead of a confusing 'empty' later).

    Returns one row per input doc:
      (doc_id, keep boolean, reason string — '' kept / 'exact_dup' /
       'empty' / comma-joined filter-rule names, text_final string —
       scrubbed clean text (NULL for exact_dup drops, which never
       flow through the later stages), n_pii int, n_lines int,
       n_kept int — NULL for exact_dup drops likewise).

    Scale: stage 1 is one (xxhash64,length)-keyed agg + co-keyed join
    (same skew-safe shape as line_dedup); stages 3-4 are narrow /
    zero-shuffle; the doc_id-keyed stitching joins co-partition.
    """
    t = F.col(text_col)
    firsts = docs.groupBy(
        F.xxhash64(t).alias("h"), F.length(t).alias("l")
    ).agg(F.min("doc_id").alias("keeper"))
    marked = docs.join(
        firsts, (F.xxhash64(t) == F.col("h")) & (F.length(t) == F.col("l"))
    ).select("doc_id", text_col, (F.col("doc_id") == F.col("keeper")).alias("uniq"))
    dropped = marked.filter(~F.col("uniq")).select(
        "doc_id",
        F.lit(False).alias("keep"),
        F.lit("exact_dup").alias("reason"),
        F.lit(None).cast("string").alias("text_final"),
        F.lit(None).cast("int").alias("n_pii"),
        F.lit(None).cast("int").alias("n_lines"),
        F.lit(None).cast("int").alias("n_kept"),
    )
    survivors = marked.filter(F.col("uniq")).select("doc_id", text_col)

    ld = line_dedup(survivors, text_col)
    scr = pii_scrub(
        ld.select("doc_id", F.col("clean").alias(text_col)), text_col
    ).select("doc_id", "n_email", "n_ipv4", "n_phone", "scrubbed")
    cf = corpus_filter(
        scr.select("doc_id", F.col("scrubbed").alias("text")),
        "text",
        **filter_kwargs,
    )
    res = (
        ld.select("doc_id", "n_lines", "n_kept")
        .join(scr, "doc_id")
        .join(cf.select("doc_id", "keep", "fails"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("keep", F.lit(False)).alias("keep"),
            F.coalesce("fails", F.lit("empty")).alias("reason"),
            F.col("scrubbed").alias("text_final"),
            (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
            .cast("int")
            .alias("n_pii"),
            "n_lines",
            "n_kept",
        )
    )
    return res.unionByName(dropped)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the public GPT-3 appendix-C /
    PaLM-style rule): flag every training document that shares any
    word n-gram (default 8) with a held-out benchmark/eval set.

    Returns (doc_id, n_hits int — matching n-gram occurrences in the
    doc, contaminated boolean). Docs with fewer than n words are
    clean by construction.

    Scale plan (100 TB): the benchmark side is small (eval sets are
    thousands of rows), so its distinct n-gram set is BROADCAST —
    the training corpus is never shuffled at all: one narrow
    generator explode per doc, a broadcast-hash semi-join, and a
    doc_id-keyed partial count. The corpus-side n-gram array is
    pre-projected into its own column (Catalyst does not CSE inside
    Generate: referencing split() in the gram lambda would re-split
    the text per element).
    """

    def words_of(col: str) -> Column:
        return F.filter(
            F.split(F.trim(F.col(col)), r"\s+"), lambda x: x != ""
        )

    def ngram_arr(warr: Column) -> Column:
        joined = F.transform(
            F.sequence(F.lit(0), F.size(warr) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(warr, i + j + 1) for j in range(n)]
            ),
        )
        return F.when(F.size(warr) >= n, joined).otherwise(
            F.array().cast("array<string>")
        )

    bench_grams = (
        benchmark.select(words_of(bench_text_col).alias("__w"))
        .select(F.explode(ngram_arr(F.col("__w"))).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        "doc_id", words_of(text_col).alias("__w")
    ).select("doc_id", F.explode(ngram_arr(F.col("__w"))).alias("gram"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    return docs.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )
