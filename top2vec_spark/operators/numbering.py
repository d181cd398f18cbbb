"""Two-phase global row numbering — the scale-safe replacement for a
single-partition ``row_number() OVER (ORDER BY ...)`` window.

A global window with no PARTITION BY moves the whole relation to ONE
task (Spark logs ``WindowExec: No Partition Defined ... Moving all data
to a single partition``). Fine for fixtures; at web scale a
min_count-filtered vocabulary is 10^7-10^8 rows and a corpus is 10^12 —
both must be numbered without serializing on one core. The two-phase
scheme used here keeps every stage parallel:

1. range-partition by the sort key (equal keys co-locate; partition p
   holds a contiguous key range, so global order == partition order),
   sort within partitions, and EAGERLY materialize the partitioned
   frame with ``localCheckpoint`` — this freezes the range-sample
   boundaries and the per-row local positions once, for every
   downstream consumer;
2. count rows per partition over the checkpointed data (a tiny,
   cache-local job), prefix-sum into per-partition offsets;
3. number = offset[partition] + local position, where the local
   position comes from ``monotonically_increasing_id`` (= partition_id
   << 33 + row position within the already-sorted partition) — NOT a
   window, which would force one more full hash Exchange.

Everything stays JVM-side (whole-stage codegen, zero Python).

Why an eager checkpoint and not ``persist``: range-sample boundaries
are drawn per QueryExecution, so with a merely-persisted frame any
consumer that recomputes an evicted partition in its OWN query would
draw fresh boundaries while the offsets were computed against the old
ones — silently producing duplicate/skipped ids (the round-3 design
documented this as an eviction-registry invariant instead of enforcing
it). ``localCheckpoint(eager=True)`` truncates lineage: every consumer
reads the one materialized partitioning, recompute-with-new-boundaries
is impossible by construction, and a lost partition fails loudly
instead of corrupting ids. Storage is reclaimed automatically by
Spark's ContextCleaner when the frame is garbage-collected — no
eviction registry. On a multi-executor cluster with dynamic
allocation, swap ``localCheckpoint`` for a reliable ``checkpoint()``
to the cluster FS (executor loss would otherwise fail the job); on
static executors localCheckpoint is the cheaper standard choice.

Replaces the reference's implicit positional numbering (``range(0, n)``
document ids, top2vec.py:524-528, and CountVectorizer's vocabulary
indices, top2vec.py:866-874).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def two_phase_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str,
    start: int = 0,
    persist_input: bool = False,
) -> DataFrame:
    """Add ``out_col`` = dense global rank (start..start+n-1) of each
    row under ``order`` (a list of Columns, each with its sort
    direction baked in, e.g. ``[F.col("df").desc(), F.col("term")]``).

    The combined sort key should be a TOTAL order (unique per row):
    ties would be numbered in an arbitrary but valid order, exactly
    like ``row_number`` itself.

    ``persist_input``: cache ``df`` for the duration of THIS call.
    ``repartitionByRange`` runs an internal range-sampling job that
    recomputes the FULL input plan before the shuffle computes it
    again — when the input is an expensive aggregation over a much
    larger relation (vocab counts over the exploded corpus tf), that
    is a duplicated corpus-scale pass. Set True when the input frame
    is small relative to its lineage (vocab: <= 10^8 rows even at web
    scale, spilled via MEMORY_AND_DISK); leave False when the input IS
    the big relation (doc-id numbering over the raw corpus) where
    caching would cost more than the rescan. The cache is released
    before returning (the checkpoint severs the lineage), so there is
    no cross-call registry and nothing to evict.
    """
    if persist_input:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    parts = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    if persist_input:
        df.unpersist()
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], start
    for pid, cnt in counts:
        offsets.append((int(pid), int(acc)))
        acc += int(cnt)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    local_idx = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_off") + local_idx).cast("long"))
        .drop("_pid", "_off", "_mid")
    )
