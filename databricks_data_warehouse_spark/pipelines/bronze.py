"""Bronze ingestion (E1): raw parquet → partitioned managed table.

Reference semantics (Bronze-Ingestion-Customers.py:26-58, same ×5):
1. read raw source;
2. synthetic duplicate id ``window_id`` = row_number over a window
   partitioned (and ordered) by the dedup key columns — the reference
   uses ALL columns (Bronze-Ingestion-Customers.py:29-30), the keyed
   variant exists for order_details (Bronze-Ingestion-OrderDetails.py:31-32);
3. derive ``year``/``month`` partition columns from a timestamp column;
4. stamp ``bronze_ingestion_time``;
5. create-if-not-exists + MERGE insert-only on all non-ingestion-time
   columns → re-running ingests nothing (S5 idempotency).

Scale notes: the reference's all-columns window shuffles every byte of
the batch by every column — fine for per-batch dedup ids since the
batch (not the table) is windowed, but we partition the window by the
caller's ``dedup_columns`` when given so wide rows hash by their key
instead. The merge is partition-scoped (see sources/tables.py): only
the batch's year/month partitions are read and rewritten.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import ManagedTable


def bronze_ingest(
    spark: SparkSession,
    source_df: DataFrame,
    table_location: str,
    table_name: str,
    timestamp_column: str,
    dedup_columns: Sequence[str] | None = None,
    partition_columns: Sequence[str] = ("year", "month"),
) -> ManagedTable:
    """Ingest one batch into a bronze table; returns the table handle."""
    dedup_cols = list(dedup_columns) if dedup_columns else list(source_df.columns)
    # deterministic window ids (round-12 review 5): ordering only by
    # the key columns ties every same-key row, so window_id assignment
    # depended on input partitioning — re-ingesting the identical batch
    # could flip ids, defeat the all-column anti-join, and DUPLICATE
    # the batch. Tie-break by the remaining columns: identical inputs
    # then always produce identical (row, window_id) pairs.
    rest = [c for c in source_df.columns if c not in dedup_cols]
    w = Window.partitionBy(*dedup_cols).orderBy(*dedup_cols, *rest)
    df = source_df.withColumn("window_id", F.row_number().over(w))
    if "year" in partition_columns:
        df = df.withColumn("year", F.year(F.col(timestamp_column)))
    if "month" in partition_columns:
        df = df.withColumn("month", F.month(F.col(timestamp_column)))
    df = df.withColumn("bronze_ingestion_time", F.current_timestamp())

    table = ManagedTable(
        spark,
        table_name,
        table_location,
        schema=df.schema,
        partition_columns=list(partition_columns),
    )
    table.create_if_not_exists()
    table.merge_insert_only(df)
    return table
