"""Concat-and-chunk sequence packing — the standard LLM-pretraining
data layout: concatenate every document's token stream in a
deterministic corpus order with a separator token after each document,
then slice the single virtual stream into fixed-length training
sequences.

Not a reference operator (Top2Vec stops at topic modeling); this is
part of the engine's training-data-pipeline surface, sitting after
dedup/quality filtering (operators/dedup.py, webtext.py) and before
an exporter. The semantics match the widely published "packing"
recipe (GPT-2/T5-style concat-and-chunk: documents joined by an EOS
separator, stream split every ``seq_len`` tokens, so a sequence may
span multiple documents and a document may span multiple sequences).

Scale shape (the 100-TB plan):
- per-document lengths: ONE map-side-combined groupBy over the token
  table (shuffle volume O(docs));
- global document offsets: the same two-phase scan as
  operators/numbering.py generalized from row counts to length SUMS —
  range-partition the O(docs) length table by doc_id, eagerly
  localCheckpoint (freezes range boundaries for every consumer —
  numbering.py documents why persist() is not enough), collect ONE
  row per partition (the partition's span sum), prefix-sum on the
  driver, broadcast back; within a partition the offset is a
  partition-local cumulative-sum window. No single-partition global
  window anywhere.
- token placement: one hash join of the token table to the O(docs)
  offset table on doc_id — the single corpus-sized shuffle, which any
  global re-layout fundamentally requires; everything after is
  per-row integer arithmetic in whole-stage codegen.

Total stream length comes back to the driver for free (the prefix-sum
accumulator), so ``drop_last`` never runs a counting job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def document_offsets(
    tokens: DataFrame, sep_width: int = 1
) -> tuple[DataFrame, int]:
    """(doc_id, n, doc_off) — each document's token count and its
    exclusive prefix-sum start position in the doc_id-ordered virtual
    stream (every document occupying ``n + sep_width`` slots) — plus
    the total stream length (driver-side int).

    Two-phase distributed scan; see the module docstring. The returned
    frame descends from an eager localCheckpoint, so its offsets are
    frozen for every downstream consumer.

    Requires positions to be dense 0..n-1 per document (what
    tokenize_docs emits). A phrase-augmented token table
    (tokens_with_phrases unions pseudo-tokens at the SAME pos as
    their first unigram) violates this — packing it would collide
    slots and leave holes — so the count/max/min invariant is checked
    inside the same aggregation and the call FAILS LOUDLY instead of
    corrupting the stream.
    """
    from pyspark import StorageLevel

    lens = tokens.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("pos").alias("_mx"),
        F.min("pos").alias("_mn"),
    )
    # persist: repartitionByRange's internal range-sampling job would
    # otherwise recompute the corpus-scale aggregation a second time
    # (the numbering.py persist_input hazard); lens is O(docs)
    lens = lens.persist(StorageLevel.MEMORY_AND_DISK)
    bad = lens.filter(
        (F.col("n") != F.col("_mx") + 1) | (F.col("_mn") != 0)
    ).limit(1)
    if bad.count() > 0:
        r = bad.collect()[0]
        lens.unpersist()
        raise ValueError(
            "token positions are not dense 0..n-1 per document "
            f"(doc_id={r['doc_id']}: n={r['n']}, max(pos)={r['_mx']}, "
            f"min(pos)={r['_mn']}) — pack the RAW token stream, not a "
            "phrase-augmented one"
        )
    lens = lens.withColumn(
        "span", (F.col("n") + F.lit(int(sep_width))).cast("long")
    )
    parts = (
        lens.repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    lens.unpersist()
    psums = sorted(
        (r["_pid"], r["s"])
        for r in parts.groupBy("_pid").agg(F.sum("span").alias("s")).collect()
    )
    offsets, acc = [], 0
    for pid, s in psums:
        offsets.append((int(pid), int(acc)))
        acc += int(s or 0)
    spark = tokens.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _poff long")
    w = Window.partitionBy("_pid").orderBy("doc_id")
    out = (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "doc_off",
            (F.col("_poff") + F.sum("span").over(w) - F.col("span")).cast(
                "long"
            ),
        )
        .select("doc_id", "n", "doc_off")
    )
    return out, acc


def pack_sequences(
    tokens: DataFrame,
    seq_len: int,
    sep_token: str | int | None = "<eos>",
    drop_last: bool = False,
) -> DataFrame:
    """tokens(doc_id, pos, term) -> one row per packed-stream slot:
    (seq_id, pos, doc_id, term). ``term`` may be ANY scalar payload —
    strings here and in the oracle row, integer token IDs in a real
    trainer export (pass e.g. ``sep_token=-1``; the separator literal
    is cast to the token column's type).

    Documents are laid out in ascending doc_id order; after each
    document's tokens one ``sep_token`` slot is emitted (carrying the
    finished document's doc_id), unless ``sep_token`` is None. The
    stream is split every ``seq_len`` slots: ``seq_id = g div
    seq_len``, ``pos = g mod seq_len`` for global slot ``g``.
    ``drop_last`` removes the trailing partial sequence (standard
    train-set behavior; keep it for eval). Deterministic for a given
    token table — no RNG, no timestamp.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    sep_width = 1 if sep_token is not None else 0
    doc_off, total = document_offsets(tokens, sep_width=sep_width)
    body = tokens.join(doc_off.select("doc_id", "doc_off"), "doc_id").select(
        "doc_id",
        (F.col("doc_off") + F.col("pos")).cast("long").alias("g"),
        "term",
    )
    if sep_token is not None:
        # cast to the token column's type so integer payloads (packed
        # token IDs with e.g. sep_token=-1) union cleanly with strings.
        # A string sentinel over a numeric column would cast to NULL
        # under non-ANSI semantics and silently poison every
        # separator slot — reject it driver-side instead.
        from pyspark.sql.types import StringType

        term_type = tokens.schema["term"].dataType
        if isinstance(sep_token, str) and not isinstance(
            term_type, StringType
        ):
            raise TypeError(
                f"sep_token {sep_token!r} cannot be cast to the token "
                f"column's type {term_type.simpleString()} — pass a "
                "numeric sep_token (e.g. -1) for token-ID streams"
            )
        sep_lit = F.lit(sep_token).cast(term_type)
        seps = doc_off.select(
            "doc_id",
            (F.col("doc_off") + F.col("n")).cast("long").alias("g"),
            sep_lit.alias("term"),
        )
        body = body.unionByName(seps)
    out = body.select(
        F.expr(f"g DIV {int(seq_len)}").alias("seq_id"),
        F.pmod("g", F.lit(int(seq_len))).cast("long").alias("pos"),
        "doc_id",
        "term",
    )
    if drop_last and total % seq_len != 0:
        out = out.where(F.col("seq_id") < total // seq_len)
    return out


def write_packed_sequences(
    sequences: DataFrame, path: str, shards: int | None = None
) -> None:
    """Persist training sequences (the packed_sequence_arrays form —
    one row per sequence) as parquet, range-sharded by seq_id so each
    shard holds a CONTIGUOUS block of the training stream: a trainer
    streams shard 0, 1, 2, ... and sees the exact packed order without
    a sort, and a seq_id range predicate prunes whole files.
    ``shards`` defaults to the current partitioning."""
    df = sequences
    if shards is not None:
        df = df.repartitionByRange(int(shards), "seq_id")
    df.sortWithinPartitions("seq_id").write.mode("overwrite").parquet(path)


def packed_sequence_arrays(packed: DataFrame) -> DataFrame:
    """Long packed rows -> one row per training sequence:
    (seq_id, tokens, doc_starts, n_docs) with tokens in slot order.
    ``doc_starts`` lists the in-sequence positions where attention
    should reset: slot 0 always (attention never crosses sequences),
    plus every slot whose document differs from the previous slot's —
    the boundary metadata document-aware trainers mask with
    (separator slots carry the FINISHED document's id, so the
    boundary lands on the first slot of the next document). ONE
    map-side-combined groupBy; each group is exactly ``seq_len``
    rows, so no skew is possible by construction."""
    starts = F.expr(
        "filter(transform(_s, (x, i) -> CASE WHEN i = 0 "
        "OR _s[i-1].doc_id != x.doc_id THEN x.pos "
        "ELSE CAST(-1 AS BIGINT) END), v -> v >= 0)"
    )
    return (
        packed.groupBy("seq_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "term", "doc_id"))
            ).alias("_s"),
        )
        .select(
            "seq_id",
            F.transform("_s", lambda s: s["term"]).alias("tokens"),
            starts.alias("doc_starts"),
        )
        # each document occupies ONE contiguous slot run per sequence
        # (doc_id order + separator carries the finished doc), so the
        # boundary count IS the distinct-doc count — computing it from
        # doc_starts avoids the mixed distinct/non-distinct aggregate
        # (Expand, ~2x agg input) a countDistinct would plan
        .withColumn("n_docs", F.size("doc_starts").cast("long"))
    )
