"""Structured Streaming incremental index maintenance.

Reference behavior (SURVEY.md §2.9): pull-based ingestion polls
Kafka/Kinesis/file partitions from checkpointed offsets into the indexing
path; near-real-time refresh makes each write batch searchable. Spark
mapping: ``readStream`` (kafka/file source) -> ``foreachBatch`` calling
the incremental index builder; Structured Streaming's checkpoint gives
exactly-once batch offsets (the translog/offset-pointer analog), and each
completed micro-batch == one refresh (a new searchable generation).

Example (Kafka, production shape)::

    stream = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", ...)
              .option("subscribe", "docs").load()
              .select(F.from_json(F.col("value").cast("string"), SCHEMA).alias("d"))
              .select("d.*"))
    q = start_indexing_stream(stream, index_dir, checkpoint_dir,
                              text_col="content")
    q.awaitTermination()

Tests use a file source with ``Trigger.AvailableNow`` (no Kafka broker in
the sandbox) — the foreachBatch path is identical.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame

from opensearch_spark.index.build import build_index
from opensearch_spark.index.incremental import add_batch


def start_indexing_stream(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "content",
    id_cols: Sequence[str] = ("repo", "path", "commit"),
    doc_id_col: str | None = None,
    n_segments: int = 16,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start a streaming query that maintains the index incrementally.

    First non-empty batch bootstraps the index (full build); subsequent
    batches append generations via ``add_batch``. Batch idempotence on
    restart comes from the SS checkpoint (a replayed batch id is not
    re-delivered by foreachBatch)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if not os.path.exists(os.path.join(index_dir, "manifest.json")):
            build_index(
                spark, batch, index_dir, text_col=text_col, id_cols=id_cols,
                doc_id_col=doc_id_col, n_segments=n_segments,
            )
        else:
            add_batch(
                spark, batch, index_dir, text_col=text_col, id_cols=id_cols,
                doc_id_col=doc_id_col,
            )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
