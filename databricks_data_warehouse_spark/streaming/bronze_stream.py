"""Streaming bronze ingestion: a file stream drained into a ManagedTable
via ``foreachBatch`` + idempotent MERGE.

SURVEY.md §1.1: the reference's bronze stage (append-new-rows-only with
an all-column match) is exactly ``availableNow`` streaming semantics —
this module makes that literal. Each micro-batch runs the same
``merge_insert_only`` the batch pipeline uses, so restarts and overlaps
are idempotent BY THE MERGE, not by checkpoint bookkeeping alone
(checkpoints still bound re-reads; the merge guarantees correctness
even if a batch replays).

At scale the source becomes a cloud landing bucket or Kafka and the
trigger a processing-time cadence; the sink-side code is unchanged.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import ManagedTable


def stream_bronze_ingest(
    spark: SparkSession,
    source_dir: str,
    table: ManagedTable,
    checkpoint_dir: str | None = None,
) -> ManagedTable:
    """Drain ``source_dir`` (parquet files) into ``table`` with one
    idempotent merge per micro-batch; returns after the availableNow
    drain completes."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(
            tempfile.gettempdir(), f"bronze_ckpt_{uuid.uuid4().hex[:8]}"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not table.exists():
            table.create_if_not_exists(batch_df.schema)
        table.merge_insert_only(batch_df)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table
