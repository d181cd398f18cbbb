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

Scale notes (100 TB): one generator explode (narrow, no shuffle) into
a single hash aggregation keyed (doc_id, n, gram) with map-side
combine, then a (doc_id)-keyed roll-up — both linear, no skew beyond
the document-length distribution because every key contains doc_id.
URL parsing is pure codegen'd string expressions at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def _words(text_col: Column) -> Column:
    """Whitespace word split, empty strings dropped (so '' and
    all-space texts yield zero words on both engines)."""
    return F.filter(F.split(F.trim(text_col), _WS), lambda x: x != "")


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals over whitespace words.

    Returns (doc_id, n_words long, top_word_frac, uniq_word_frac,
    top_bigram_frac, dup_trigram_frac — all double in [0,1]). Docs
    with < 2 (resp. < 3) words report 0.0 for the bigram (trigram)
    fractions.
    """
    # Materialize the word array in its own Project: referencing the
    # raw split expression inside the n-gram lambdas would re-split
    # the whole text on EVERY element_at (O(n^2) per doc — visible as
    # a dozen split() copies in the Generate's explain output).
    base = docs.select("doc_id", _words(F.col(text_col)).alias("__w"))
    w = F.col("__w")

    def ngrams(arr: Column, n: int) -> Column:
        # join n consecutive words with single spaces; empty when the
        # doc has fewer than n words (sequence guard).
        joined = F.transform(
            F.sequence(F.lit(0), F.size(arr) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j + 1) for j in range(n)]
            ),
        )
        return F.when(F.size(arr) >= n, joined).otherwise(
            F.array().cast("array<string>")
        )

    def tag(n: int) -> Column:
        # NB: the lambda must take exactly ONE arg — F.transform binds
        # a second parameter to the array index, not a closure default.
        return F.transform(
            ngrams(w, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    tagged = F.concat(tag(1), tag(2), tag(3))
    long = base.select("doc_id", F.explode(tagged).alias("g")).select(
        "doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    )
    counts = long.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )

    def agg_n(n: int, fn, alias: str) -> Column:
        return fn(F.when(F.col("n") == n, F.col("c"))).alias(alias)

    per_doc = counts.groupBy("doc_id").agg(
        agg_n(1, F.sum, "w_tot"),
        agg_n(1, F.max, "w_top"),
        F.count(F.when(F.col("n") == 1, True)).alias("w_dist"),
        agg_n(2, F.sum, "b_tot"),
        agg_n(2, F.max, "b_top"),
        agg_n(3, F.sum, "t_tot"),
        F.count(F.when(F.col("n") == 3, True)).alias("t_dist"),
    )
    frac = lambda num, den: F.coalesce(  # noqa: E731
        (num / den).cast("double"), F.lit(0.0)
    )
    return per_doc.select(
        "doc_id",
        F.coalesce(F.col("w_tot"), F.lit(0)).cast("long").alias("n_words"),
        frac(F.col("w_top"), F.col("w_tot")).alias("top_word_frac"),
        frac(F.col("w_dist"), F.col("w_tot")).alias("uniq_word_frac"),
        frac(F.col("b_top"), F.col("b_tot")).alias("top_bigram_frac"),
        frac(F.col("t_tot") - F.col("t_dist"), F.col("t_tot")).alias(
            "dup_trigram_frac"
        ),
    )


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
    zero words have no repetition row and are dropped by the inner
    join — at pipeline scale empty docs should be culled by a length
    predicate before this operator.
    """
    rep = repetition_stats(docs, text_col)
    t = F.col(text_col)
    alpha = (
        F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
        / F.greatest(F.length(t), F.lit(1))
    ).cast("double")
    joined = docs.select("doc_id", F.round(alpha, 6).alias("alpha_r")).join(
        rep.select(
            "doc_id",
            "n_words",
            F.round("top_word_frac", 6).alias("topw_r"),
            F.round("uniq_word_frac", 6).alias("uniq_r"),
            F.round("dup_trigram_frac", 6).alias("trig_r"),
        ),
        "doc_id",
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
