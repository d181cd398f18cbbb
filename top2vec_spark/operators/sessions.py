"""Gap-based sessionization over the events table.

Training-data pipelines sessionize interaction/crawl logs constantly
(per-user event runs split where the inter-event gap exceeds a
threshold). Two twins share the semantics:

- ``sessionize_batch`` (here): pure window expressions — lag to flag
  session starts, a running sum to number sessions, one aggregation.
  Fully SQL-expressible -> DuckDB-oracled in the driver gate.
- ``streaming.sessions.sessionize_stream``: the SAME semantics as a
  custom STATEFUL streaming operator via applyInPandasWithState
  (open sessions live in the state store across micro-batches);
  pytest pins its closed sessions against this batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events,
    total_value); session_id is 1-based per user in time order.

    Plan shape: one shuffle on user_id (both windows and the final
    aggregation share it — Catalyst reuses the partitioning), running
    entirely in whole-stage codegen. Skew note: a single hyperactive
    user serializes inside one partition; for skewed logs use
    ``sessionize_batch_salted`` below — identical output, per-event
    work split over (user, time-chunk) partitions."""
    w = W.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev_ts = F.lag(ts_col).over(w)
    # Sub-second-precision gap (cast-to-double = fractional epoch
    # seconds) so the batch twin splits sessions exactly where the
    # streaming twin's microsecond comparison does — unix_timestamp
    # truncates to whole seconds and would disagree on e.g. a 1800.5 s
    # gap.
    new_sess = (
        prev_ts.isNull()
        | ((F.col(ts_col).cast("timestamp").cast("double")
            - prev_ts.cast("timestamp").cast("double"))
           > gap_seconds)
    ).cast("int")
    numbered = events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            W.partitionBy(user_col).orderBy(ts_col, "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return (
        numbered.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .orderBy(user_col, "session_id")
    )


def sessionize_batch_salted(
    events: DataFrame,
    gap_seconds: int = 1800,
    chunk_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Skew-safe twin of ``sessionize_batch`` — IDENTICAL output
    (pinned by tests/test_streaming.py on a fixture where one user
    owns ~30% of all events), but the per-EVENT window work is
    partitioned by (user, time-chunk) instead of user alone, so a
    hyperactive user's log splits across many tasks instead of
    serializing in one straggler partition.

    Three phases:

    1. LOCAL sessionize within each (user, chunk) — chunk =
       floor(epoch / chunk_seconds). All O(n_events) lag/running-sum
       work happens here, salted by the time chunk.
    2. BOUNDARY merge: only the FIRST and LAST local session of each
       chunk can merge across a chunk edge (interior sessions are
       final — the >gap splits around them are chunk-local facts).
       Because chunk_seconds > gap_seconds, sessions separated by an
       entirely empty chunk can never merge, so the boundary relation
       is <= 2 rows per (user, active-chunk) — the same gap-merge
       window over this tiny SESSION-level relation reconstructs the
       cross-chunk sessions exactly (the cross-chunk event gap IS
       prev_chunk.last_session.end -> next_chunk.first_session.start).
    3. Renumber merged+interior sessions 1-based per user by start
       time — a per-user window over SESSIONS, O(sessions/user) not
       O(events/user).

    total_value sums partial sums (float addition order differs from
    the unsalted twin by at most last-ulp noise; both round to 6 at
    the end)."""
    if chunk_seconds is None:
        chunk_seconds = max(4 * gap_seconds, 3600)
    if chunk_seconds <= gap_seconds:
        raise ValueError("chunk_seconds must exceed gap_seconds")
    ep = F.col(ts_col).cast("timestamp").cast("double")
    ev = events.withColumn("_chunk", F.floor(ep / chunk_seconds))

    # -- phase 1: local sessions within (user, chunk) ------------------
    wl = W.partitionBy(user_col, "_chunk").orderBy(ts_col, "event_id")
    prev_ts = F.lag(ts_col).over(wl)
    new_sess = (
        prev_ts.isNull()
        | ((ep - prev_ts.cast("timestamp").cast("double")) > gap_seconds)
    ).cast("int")
    numbered = ev.withColumn(
        "_ls",
        F.sum(new_sess).over(wl.rowsBetween(W.unboundedPreceding, 0)),
    )
    local = numbered.groupBy(user_col, "_chunk", "_ls").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("_sv"),
    )
    nsess = W.partitionBy(user_col, "_chunk")
    # persist: boundary + interior both branch off this frame; without
    # it the whole phase-1 shuffle would either rerun per branch or
    # hinge on ReusedExchange. Reclaimed by ContextCleaner on GC
    # (deterministic input — a recompute after eviction is identical).
    local = local.withColumn("_max_ls", F.max("_ls").over(nsess)).persist()

    # -- phase 2: merge first/last sessions across chunk edges ---------
    boundary = local.filter((F.col("_ls") == 1) | (F.col("_ls") == F.col("_max_ls")))
    interior = local.filter((F.col("_ls") != 1) & (F.col("_ls") != F.col("_max_ls")))
    wb = W.partitionBy(user_col).orderBy("session_start", "session_end")
    pe = F.lag(F.col("session_end").cast("timestamp").cast("double")).over(wb)
    newg = (
        pe.isNull()
        | ((F.col("session_start").cast("timestamp").cast("double") - pe) > gap_seconds)
    ).cast("int")
    grouped = boundary.withColumn(
        "_g", F.sum(newg).over(wb.rowsBetween(W.unboundedPreceding, 0))
    )
    merged = grouped.groupBy(user_col, "_g").agg(
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
        F.sum("n_events").alias("n_events"),
        F.sum("_sv").alias("_sv"),
    )

    # -- phase 3: renumber per user by start time ----------------------
    cols = [user_col, "session_start", "session_end", "n_events", "_sv"]
    final = interior.select(*cols).unionByName(merged.select(*cols))
    wn = W.partitionBy(user_col).orderBy("session_start", "session_end")
    return (
        final.withColumn("session_id", F.row_number().over(wn))
        .select(
            user_col,
            F.col("session_id").cast("long").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
            F.round("_sv", 6).alias("total_value"),
        )
        .orderBy(user_col, "session_id")
    )
