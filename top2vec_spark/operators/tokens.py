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


def tokenize_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ascii_fast_path: bool = False,
) -> DataFrame:
    """Return tokens(doc_id, pos, term).

    ``ascii_fast_path=True`` uses the pure-JVM tokenizer (whole-stage
    codegen, zero Python) — valid when the corpus is known ASCII; the
    default Arrow pandas UDF implements the full unicode contract.
    ``pos`` is the 0-based token position within the document
    (post-filter positions, matching the reference's tokenized list
    indices).
    """
    toks = (
        sql_tokens_expr(text_col) if ascii_fast_path else tokenize_udf(F.col(text_col))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.posexplode("_toks").alias("pos", "term"))
    )


def doc_term_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fused tokenize + per-doc term count: docs -> tf(doc_id, term,
    tf, dl) in ONE Arrow pass — the index build's hot path.

    Equivalent to ``tokenize_docs(...).groupBy(doc_id, term).count()``
    joined with doc lengths, but never materializes the exploded
    per-position rows and never shuffles them: counting happens inside
    the pandas UDF per batch, so the only shuffle downstream is over
    the ~unique-terms-per-doc rows (typically ~60% smaller than raw
    tokens, and no (doc_id, term) shuffle for the tf agg at all).
    """
    import pandas as pd

    from top2vec_spark.functions.tokenizer import _tokenize_series

    def batch(pdfs):
        for pdf in pdfs:
            toks = _tokenize_series(pdf[text_col])
            ids, terms, tfs, dls = [], [], [], []
            for doc_id, tl in zip(pdf[id_col], toks):
                dl = len(tl)
                cnt = {}
                for t in tl:
                    cnt[t] = cnt.get(t, 0) + 1
                ids.extend([doc_id] * len(cnt))
                terms.extend(cnt.keys())
                tfs.extend(cnt.values())
                dls.extend([dl] * len(cnt))
            yield pd.DataFrame(
                {"doc_id": ids, "term": terms, "tf": tfs, "dl": dls}
            )

    return docs.select(id_col, text_col).mapInPandas(
        batch, "doc_id long, term string, tf long, dl long"
    )


def assign_doc_ids(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Deterministic dense doc_id (0..n-1) by url sort order.

    Replaces the reference's implicit ``range(0, n)`` ids and
    ``doc_id2index`` dict (top2vec.py:524-528). A global
    ``row_number`` over url is a single-partition window — fine for
    fixtures, NOT for 10^12 rows; at scale we use
    ``zipWithIndex``-style two-phase numbering: per-partition counts
    collected (tiny), then offset + local rank. Implemented the
    scalable way here.
    """
    # Two-phase dense numbering: range-partition by url (global order
    # preserved across partition boundaries), sort within partitions,
    # then zipWithIndex (one count job + local offsets — no global
    # single-partition window).
    parts = pages.repartitionByRange(F.col(url_col)).sortWithinPartitions(url_col)
    schema = parts.schema.add("doc_id", "long", False)
    indexed = parts.rdd.zipWithIndex().map(lambda t: (*t[0], t[1]))
    return pages.sparkSession.createDataFrame(indexed, schema)
