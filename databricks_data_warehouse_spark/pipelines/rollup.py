"""Incremental time-bucket rollup (continuous-aggregate / hypertable-
rollup pattern): maintain a bucketed aggregate table from event batches
WITHOUT rescanning history.

Per refresh: the batch is partially aggregated to (bucket, dims) rows;
existing rollup rows for exactly those keys are read back, combined
(count/sum measures add; the combine is associative), and upserted. The
upsert is partition-scoped — the rollup partitions by bucket date, so a
batch touching one hour rewrites one day's partition, never the table.

Exactly-once caveat (documented, not hidden): additive combination
assumes each event is presented once across refreshes. Feed it from
idempotent bronze batches (pipelines/bronze.py) or a streaming source
with checkpointing (streaming/bronze_stream.py); replaying a batch
would double-count — the same contract TimescaleDB/druid-style rollups
have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import cents
from ..sources.tables import ManagedTable


def refresh_hourly_rollup(
    spark: SparkSession,
    events_batch: DataFrame,
    table: ManagedTable,
) -> ManagedTable:
    """Fold one events batch (ts, event_type, value) into an hourly
    rollup keyed on (bucket_date, window_start, event_type) with
    event_count and exact integer-cents sum_value_cents measures."""
    partial = (
        events_batch.withColumn("window_start", F.date_trunc("hour", F.col("ts")))
        .withColumn("bucket_date", F.to_date("window_start"))
        .groupBy("bucket_date", "window_start", "event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum(cents(F.col("value"))).alias("sum_value_cents"),
        )
    )
    keys = ["bucket_date", "window_start", "event_type"]
    if not table.exists():
        table.create_if_not_exists(partial.schema)
    existing = table.read().join(
        partial.select(*keys).distinct(), on=keys, how="inner"
    )
    combined = (
        partial.unionByName(existing)
        .groupBy(*keys)
        .agg(
            F.sum("event_count").alias("event_count"),
            F.sum("sum_value_cents").alias("sum_value_cents"),
        )
    )
    table.merge_upsert(combined, key_columns=keys)
    return table


def rollup_as_view(table: ManagedTable) -> DataFrame:
    """Presentation projection: cents back to 2-decimal values."""
    return table.read().select(
        "window_start",
        "event_type",
        "event_count",
        (F.col("sum_value_cents") / 100).alias("sum_value"),
    )
