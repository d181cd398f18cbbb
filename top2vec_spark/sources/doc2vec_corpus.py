"""Doc2Vec training-corpus sink (SURVEY §2.1 S2).

The reference materializes its tokenized corpus for gensim Doc2Vec's
``corpus_file`` mode as one temp text file — ``' '.join(tokenizer(doc))``
per document, newline-joined, where the LINE NUMBER is the document's
training tag (reference top2vec.py:604-609: ``processed = [' '.join(
tokenizer(doc)) for doc in documents]; lines = "\\n".join(processed)``).

The distributed re-expression writes the same byte content as a
directory of globally ordered text part-files plus a manifest that
pins the line-number -> doc_id mapping, so trained vectors (tagged by
line index) can be joined back to documents. Gensim itself is NOT a
dependency — this sink only produces the file format; training is the
caller's (out-of-scope per the north rule: L1-L4).

Order contract: ``repartitionByRange(doc_id)`` + ``sortWithinPartitions
(doc_id)`` makes partition i hold a contiguous ascending doc_id range
below partition i+1's, and Spark's text writer names part files in
partition order — concatenating them in filename order reproduces the
reference's single file byte-for-byte (modulo the trailing newline the
line-oriented writer appends after the final document; gensim's
corpus_file reader is line-oriented and unaffected).

Documents whose every token was filtered out become EMPTY lines —
present, so line numbering stays aligned with document order, exactly
like the reference's ``' '.join([]) == ''`` entries.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def export_doc2vec_corpus(
    doc_tokens: DataFrame, path: str, n_files: int = 64
) -> DataFrame:
    """Write ``doc_tokens`` (doc_id, tokens: array<string>) as a gensim
    ``corpus_file``-format directory at ``{path}/corpus`` and return
    (after writing to ``{path}/manifest``) the split manifest:

        split_id    output partition / part-file ordinal (ascending)
        n_lines     documents in this split
        first_line  global 0-based line number of the split's first
                    document == its gensim training tag
        first_doc_id / last_doc_id   contiguous doc_id range

    Line ``first_line + i`` of the concatenated corpus is the i-th
    doc_id (ascending) within the split — the join key back from
    line-tagged trained vectors to documents.
    """
    lines = (
        doc_tokens.select(
            "doc_id", F.concat_ws(" ", "tokens").alias("line")
        )
        .repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    # Persist so the text write and the manifest aggregation see the
    # SAME materialized range partitioning (repartitionByRange samples
    # boundaries per execution; two independent runs could split
    # differently).
    lines.persist()
    try:
        lines.select("line").write.mode("overwrite").text(f"{path}/corpus")
        per_split = (
            lines.groupBy(F.spark_partition_id().alias("split_id"))
            .agg(
                F.count("*").alias("n_lines"),
                F.min("doc_id").alias("first_doc_id"),
                F.max("doc_id").alias("last_doc_id"),
            )
        )
        w = Window.orderBy("split_id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        manifest = per_split.select(
            "split_id",
            "n_lines",
            F.coalesce(F.sum("n_lines").over(w), F.lit(0)).alias(
                "first_line"
            ),
            "first_doc_id",
            "last_doc_id",
        )
        # n_files rows — the single-partition window is fine.
        manifest.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/manifest"
        )
    finally:
        lines.unpersist()
    spark = doc_tokens.sparkSession
    return spark.read.parquet(f"{path}/manifest")


def corpus_part_files(path: str) -> list[str]:
    """The corpus part files in global document order (filename order
    == partition order == ascending doc_id ranges)."""
    return sorted(glob.glob(os.path.join(path, "corpus", "part-*")))


def write_local_corpus_file(
    doc_tokens: DataFrame, file_path: str, max_docs: int = 1_000_000
) -> int:
    """The reference's exact single-file shape (top2vec.py:604-609)
    for corpora that fit one driver-local file: documents streamed in
    doc_id order through ``toLocalIterator`` (one partition in driver
    memory at a time, never the whole corpus). Returns the line count.

    Guarded by ``max_docs`` — beyond it, use ``export_doc2vec_corpus``
    and concatenate part files at the filesystem layer instead.
    """
    n = doc_tokens.count()
    if n > max_docs:
        raise ValueError(
            f"corpus has {n} documents > max_docs={max_docs}; use "
            "export_doc2vec_corpus for a distributed multi-file sink"
        )
    ordered = (
        doc_tokens.select(
            "doc_id", F.concat_ws(" ", "tokens").alias("line")
        )
        .repartitionByRange(max(1, n // 100_000 + 1), "doc_id")
        .sortWithinPartitions("doc_id")
    )
    count = 0
    with open(file_path, "w", encoding="utf8") as f:
        for row in ordered.toLocalIterator():
            f.write(row["line"])
            f.write("\n")
            count += 1
    return count
