"""Streaming corpus-quality monitor — watermarked event-time windows.

The second Structured Streaming surface (alongside ingest.py's
foreachBatch index append): a readStream of pages is profiled with the
SAME codegen'd quality expressions the batch pipeline uses
(operators/textquality.py) and aggregated into event-time windows on
the page's crawl timestamp (``warc_ts``), with a watermark bounding
how long late pages are admitted — the standard late-data pattern
(watermark + window), NOT processing-time bucketing.

Scale shape: the aggregation state is (window x lang) — thousands of
keys at most, regardless of corpus rate; everything before the window
agg is stateless column math at scan speed. Output modes:

- append (default): windows emit once, after the watermark passes —
  the exactly-once feed for a downstream quality dashboard table;
- update: early partial rows for live monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_window_stats(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    by_lang: bool = True,
) -> DataFrame:
    """pages (streaming OR batch) -> per-(event-time window[, lang])
    corpus stats: page count, mean length, mean alpha ratio, short-doc
    count. Works identically on a batch frame (no watermark applied),
    so tests can pin streaming output against the batch computation.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    alpha_ratio = (
        F.length(F.regexp_replace(t, "[^A-Za-z]", "")) /
        F.greatest(n_chars, F.lit(1))
    )
    feats = pages.select(
        F.col(ts_col),
        *([F.col("lang")] if by_lang else []),
        n_chars.alias("n_chars"),
        alpha_ratio.alias("alpha_ratio"),
        (n_chars < F.lit(200)).cast("int").alias("is_short"),
    )
    if feats.isStreaming:
        feats = feats.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("win")] + (
        [F.col("lang")] if by_lang else []
    )
    return feats.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.avg("n_chars").alias("avg_chars"),
        F.avg("alpha_ratio").alias("avg_alpha_ratio"),
        F.sum("is_short").alias("n_short"),
    )


def start_quality_monitor(
    stream_pages: DataFrame,
    checkpoint_dir: str,
    sink_table: str = "quality_monitor",
    output_mode: str = "append",
    **kwargs,
):
    """Start the monitor into a memory sink (tests/dashboards); swap
    ``format`` for a real table sink in production. Returns the
    StreamingQuery."""
    stats = quality_window_stats(stream_pages, **kwargs)
    return (
        stats.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
