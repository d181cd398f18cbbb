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
    user serializes inside one partition; per-user event counts are
    bounded in practice (and a salted two-phase variant would split
    on (user, day) first)."""
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
