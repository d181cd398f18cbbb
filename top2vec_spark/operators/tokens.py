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
