"""Two-phase global row numbering — the scale-safe replacement for a
single-partition ``row_number() OVER (ORDER BY ...)`` window.

A global window with no PARTITION BY moves the whole relation to ONE
task (Spark logs ``WindowExec: No Partition Defined ... Moving all data
to a single partition``). Fine for fixtures; at web scale a
min_count-filtered vocabulary is 10^7-10^8 rows and a corpus is 10^12 —
both must be numbered without serializing on one core. The two-phase
scheme used here keeps every stage parallel:

1. range-partition by the sort key (equal keys co-locate; partition p
   holds a contiguous key range, so global order == partition order)
   and sort within partitions;
2. count rows per partition (a tiny collect), prefix-sum into
   per-partition offsets;
3. number = offset[partition] + local position, where the local
   position comes from ``monotonically_increasing_id`` (= partition_id
   << 33 + row position within the already-sorted partition) — NOT a
   window, which would force one more full hash Exchange.

Everything stays JVM-side (whole-stage codegen, zero Python). The
repartitioned frame is persisted for the duration of the two jobs so
the count job and the numbering job see identical partitioning (range
sampling is seeded per-plan; persistence removes recompute ambiguity).

Replaces the reference's implicit positional numbering (``range(0, n)``
document ids, top2vec.py:524-528, and CountVectorizer's vocabulary
indices, top2vec.py:866-874).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bounded registry of persisted numbering inputs: each call persists
# its range-partitioned frame (the count job and the numbering job MUST
# see identical partitioning — range sampling is per-plan; a
# persist_input call adds a second entry for the cached input), and the
# oldest entries are unpersisted once more than _MAX_LIVE entries are
# live. Invariant required of callers: materialize the numbered
# output before issuing _MAX_LIVE/2 further numbering calls —
# trivially true for every in-repo flow (each build stage / append
# epoch / micro-batch writes its output synchronously). Without the
# cap, a long-running stream (one numbering per micro-batch) leaks one
# MEMORY_AND_DISK frame per batch.
_MAX_LIVE = 8
_LIVE: list = []


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

    ``persist_input``: cache ``df`` itself for the call's duration.
    ``repartitionByRange`` runs an internal range-sampling job that
    recomputes the FULL input plan before the count job computes it
    again — when the input is an expensive aggregation over a much
    larger relation (vocab counts over the exploded corpus tf), that
    is a duplicated corpus-scale pass. Set True when the input frame
    is small relative to its lineage (vocab: <= 10^8 rows even at web
    scale, spilled via MEMORY_AND_DISK); leave False when the input IS
    the big relation (doc-id numbering over the raw corpus) where
    caching would cost more than the rescan.
    """
    if persist_input:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        _LIVE.append(df)
    parts = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _LIVE.append(parts)
    while len(_LIVE) > _MAX_LIVE:
        _LIVE.pop(0).unpersist()
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
