"""docs -> tokens(doc_id, pos, term) long-format table.

Replaces the reference's ragged ``list[list[str]]`` tokenized corpus
(top2vec/top2vec.py:664) and the parallel ``document_labels`` foreign
key (embedding.py:107) with an exploded, keyed DataFrame — the
positional alignment of the reference becomes real join keys
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top2vec_spark.functions.tokenizer import sql_tokens_expr, tokenize_udf


def custom_tokenizer_udf(tokenizer):
    """Wrap a user tokenizer callable (str -> list[str]) as an
    Arrow-batched pandas UDF — the reference's tokenizer hook
    (top2vec.py:411-415, H1/T7). Documented SLOW path: the callable
    runs per row inside the batch (Arrow transfer is vectorized, the
    user code is not); the built-in contract tokenizer stays
    C-level/codegen."""
    import pandas as pd

    def _apply(texts):
        return texts.fillna("").map(tokenizer)

    # real (non-stringified) hints: this module uses PEP-563 lazy
    # annotations, which pyspark's pandas_udf can't resolve for a
    # locally-imported pd
    _apply.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_apply, "array<string>")


def tokenize_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ascii_fast_path: bool = False,
    tokenizer=None,
) -> DataFrame:
    """Return tokens(doc_id, pos, term).

    ``ascii_fast_path=True`` uses the pure-JVM tokenizer (whole-stage
    codegen, zero Python) — valid when the corpus is known ASCII; the
    default Arrow pandas UDF implements the full unicode contract.
    ``tokenizer`` (a str -> list[str] callable) overrides both — the
    reference's custom-tokenizer seam. ``pos`` is the 0-based token
    position within the document (post-filter positions, matching the
    reference's tokenized list indices).
    """
    if tokenizer is not None:
        toks = custom_tokenizer_udf(tokenizer)(F.col(text_col))
    elif ascii_fast_path:
        toks = sql_tokens_expr(text_col)
    else:
        toks = tokenize_udf(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.posexplode("_toks").alias("pos", "term"))
    )


def doc_term_counts_packed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fused tokenize + per-doc term count, ARRAY-PACKED: docs ->
    (doc_id, terms array, tfs array, dl) — one row per document.

    This is the build's canonical tf representation: ~56x fewer rows
    than the long format through Arrow, parquet, and re-reads (the
    long-format materialization of ~90M tiny rows was the top
    non-scaling cost at 1.6M docs — row overhead, not data bytes).
    """
    import pandas as pd

    from top2vec_spark.functions.tokenizer import _tokenize_series

    def batch(pdfs):
        for pdf in pdfs:
            toks = _tokenize_series(pdf[text_col])
            # Per-doc dict counting. MEASURED faster (2.5x) than the
            # "vectorized" alternative (object-array concat +
            # pd.factorize + sort-based np.unique over the flattened
            # tokens): for short-string tokens in small docs, CPython
            # dict hashing beats materializing/sorting millions of
            # object pointers. Don't "optimize" this without timing.
            terms, tfs, dls = [], [], []
            for tl in toks:
                cnt = {}
                for t in tl:
                    cnt[t] = cnt.get(t, 0) + 1
                terms.append(list(cnt.keys()))
                tfs.append(list(cnt.values()))
                dls.append(len(tl))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "terms": terms,
                    "tfs": tfs,
                    "dl": dls,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        batch, "doc_id long, terms array<string>, tfs array<long>, dl long"
    )


def explode_packed_tf(packed: DataFrame) -> DataFrame:
    """(doc_id, terms, tfs, dl) -> long tf(doc_id, term, tf, dl)
    (JVM-side explode, codegen)."""
    return packed.select(
        "doc_id",
        "dl",
        F.explode(F.arrays_zip("terms", "tfs")).alias("z"),
    ).select(
        "doc_id",
        F.col("z.terms").alias("term"),
        F.col("z.tfs").alias("tf"),
        "dl",
    )


def pack_tokens(tokens: DataFrame) -> DataFrame:
    """tokens(doc_id, pos, term) -> packed tf (for the
    long-format-input compatibility path; one groupBy)."""
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("doc_id")
        .agg(
            F.collect_list("term").alias("terms"),
            F.collect_list("tf").alias("tfs"),
            F.sum("tf").alias("dl"),
        )
        .select("doc_id", "terms", "tfs", "dl")
    )


def doc_term_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fused tokenize + per-doc term count: docs -> tf(doc_id, term,
    tf, dl) in ONE Arrow pass — the index build's hot path.

    Convenience wrapper: packed transfer + JVM explode.
    """
    return explode_packed_tf(doc_term_counts_packed(docs, text_col, id_col))


def assign_doc_ids(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Deterministic dense doc_id (0..n-1) by url sort order — JVM-only.

    Replaces the reference's implicit ``range(0, n)`` ids and
    ``doc_id2index`` dict (top2vec.py:524-528). A global
    ``row_number`` over url would be a single-partition window — fine
    for fixtures, NOT for 10^12 rows. Two-phase numbering instead:

    1. range-partition by url (equal keys co-locate; partition p holds
       a contiguous url range, so global order = partition order) and
       sort within partitions;
    2. count rows per partition (tiny collect), prefix-sum into
       per-partition offsets;
    3. doc_id = offset[partition] + (local row_number - 1), the local
       window running per partition — no single-partition stage.

    Everything stays JVM-side (whole-stage codegen; no RDD/Python
    round-trip of the corpus — the old ``rdd.zipWithIndex`` variant
    pickled every row out to Python and back). See
    operators/numbering.two_phase_row_number for the mechanism (plan
    capture in BENCH/PLANS.md).
    """
    from top2vec_spark.operators.numbering import two_phase_row_number

    return two_phase_row_number(pages, [F.col(url_col)], "doc_id")
