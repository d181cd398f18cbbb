"""Streaming ingest: continuous index append via Structured Streaming.

The reference has NO streaming surface (SURVEY.md §2.12) — its only
incremental capability is batch add_documents (U1). This module is the
engine's upgrade of that capability to a stream: a ``readStream`` of
pages is folded into the index with ``foreachBatch``, each micro-batch
running the SAME incremental append as the batch API
(plans/build.append_documents) — new doc-shards only, existing
partitions untouched, exactly-once per batch via the streaming
checkpoint + idempotent shard-aligned ids.

Scale shape: each micro-batch tokenizes only its own rows (fused
Arrow pass) and appends new shard partitions; the stats refresh is a
metadata update. Queries stay correct mid-stream because WAND's exact
scoring always reads CURRENT globals and its pruning bounds switch to
stat-independent (block_max_tf, block_min_dl) form once stats drift
(operators/wand.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top2vec_spark.plans.build import PostingsIndex


class StreamingIndexer:
    """Fold a streaming DataFrame of pages/documents into an index.

    ``stream_df`` needs a text column; doc_ids are assigned per batch
    from the index's next shard boundary (monotone, gap-free within a
    batch, shard-aligned across batches).
    """

    def __init__(self, index: PostingsIndex, text_col: str = "text") -> None:
        self.index = index
        self.text_col = text_col
        self.batches_applied = 0

    def _apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # epoch-stable base id + epoch-keyed append: a foreachBatch
        # RETRY of the same epoch reuses the same id range and hits the
        # append's idempotent per-epoch staging (plans/build.py) — a
        # replayed batch is a no-op once its .done marker exists, so
        # the "exactly-once per batch" contract holds across restarts.
        lo = self.index.epoch_base_doc_id(epoch_id)
        from top2vec_spark.operators.numbering import two_phase_row_number

        # deterministic ids within the batch: rank by url (or text),
        # two-phase numbering — a global orderBy window would move a
        # large catch-up batch (first run against a backlog) to ONE task
        order_col = "url" if "url" in batch_df.columns else self.text_col
        docs = two_phase_row_number(
            batch_df, [F.col(order_col)], "doc_id", start=lo
        ).select("doc_id", F.col(self.text_col).alias("text"))
        self.index = self.index.append_documents(docs, epoch_id=epoch_id)
        self.batches_applied += 1

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
    ):
        """Start the streaming query. Returns the StreamingQuery;
        callers stop it (or use processAllAvailable for tests)."""
        writer = stream_df.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()
