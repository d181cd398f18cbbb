"""Streaming exact dedup — the crawl-feed twin of the batch
``operators/dedup.dedup_exact``.

A live ingest of Common-Crawl-style pages re-fetches the same content
constantly (mirrors, trailing-slash urls, re-crawls). This operator
keeps only the FIRST arrival of each content fingerprint across
micro-batches using Spark's built-in streaming dedup state:

- ``dropDuplicatesWithinWatermark`` on the dual content key (two
  independent xxhash64 JVM hashes + length — the batch dedup's exact
  collision-hardened key) with an event-time watermark bounding state:
  a duplicate arriving within the watermark window is dropped; state
  for fingerprints older than the watermark is evicted, so the state
  store is O(unique pages per watermark window), not O(corpus).
- For UNBOUNDED exact dedup (drop a re-crawl seen a month ago), the
  scale answer is not streaming state but the batch dedup over the
  accumulated corpus — documented, matching industry practice.

Scale shape: the dedup is a stateful exchange on the fingerprint key;
everything before it is stateless codegen column math. No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_keys(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the exact-dedup content key columns — the SAME dual-hash
    construction as the batch twin (operators/dedup._content_keys:
    raw-text xxhash64 x2 + length, byte-identical grouping), so a
    pipeline that dedups the stream and later compacts with batch
    dedup_exact sees consistent duplicate groups."""
    from top2vec_spark.operators.dedup import _content_keys

    keys = _content_keys(pages, text_col)
    return pages.select(
        "*",
        keys[0].alias("_h1"),
        keys[1].alias("_h2"),
        keys[2].alias("_hlen"),
    )


def dedup_stream(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """pages (streaming) -> first arrival per content fingerprint
    within the watermark horizon; key columns are dropped from the
    output. Batch frames pass through the equivalent dropDuplicates
    (no watermark), so tests pin streaming output against batch."""
    keyed = content_keys(pages, text_col)
    keys = ["_h1", "_h2", "_hlen"]
    if keyed.isStreaming:
        out = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    else:
        out = keyed.dropDuplicates(keys)
    return out.drop(*keys)


def start_dedup_stream(
    stream_pages: DataFrame,
    checkpoint_dir: str,
    sink_table: str = "deduped_pages",
    **kwargs,
):
    """Memory-sink runner for tests/dashboards; swap the format for a
    real table sink in production. Returns the StreamingQuery."""
    out = dedup_stream(stream_pages, **kwargs)
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
