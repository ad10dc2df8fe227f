"""Streaming bronze ingestion: availableNow drain into a ManagedTable,
idempotent across re-runs and across checkpoint loss (the merge, not
the checkpoint, guarantees exactly-once table contents). Plus a live
rate-source smoke test (unbounded source, processing-time trigger)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable
from databricks_data_warehouse_spark.streaming.bronze_stream import (
    stream_bronze_ingest,
)


def test_stream_bronze_ingest_idempotent(spark, tmp_path):
    src = str(tmp_path / "landing")
    spark.createDataFrame(
        [(1, "a", 2024, 1), (2, "b", 2024, 2)],
        "id long, name string, year int, month int",
    ).write.parquet(src)
    table = ManagedTable(
        spark, "bs", str(tmp_path / "bs"), partition_columns=["year", "month"]
    )
    stream_bronze_ingest(spark, src, table, str(tmp_path / "ckpt1"))
    assert table.read().count() == 2
    # re-run with a FRESH checkpoint: every file replays, merge inserts 0
    stream_bronze_ingest(spark, src, table, str(tmp_path / "ckpt2"))
    assert table.read().count() == 2
    # new file lands -> only its rows ingest (resume from ckpt2... new ckpt
    # replays all, merge dedupes)
    spark.createDataFrame(
        [(3, "c", 2024, 2)], "id long, name string, year int, month int"
    ).write.mode("append").parquet(src)
    stream_bronze_ingest(spark, src, table, str(tmp_path / "ckpt3"))
    assert sorted(r.id for r in table.read().collect()) == [1, 2, 3]


def test_rate_source_live_stream(spark, tmp_path):
    """Unbounded built-in rate source: prove the engine handles a LIVE
    stream (not just bounded drains) — micro-batches accumulate into a
    memory sink until we stop the query."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    )
    agg = stream.withColumn("bucket", F.col("value") % 5).groupBy("bucket").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("rate_sink").count() > 0:
                break
            time.sleep(0.5)
        rows = spark.table("rate_sink").collect()
        assert rows, "no micro-batch produced output within 30s"
        assert all(r.bucket in range(5) for r in rows)
    finally:
        q.stop()


def test_stream_bronze_schema_evolution_across_restart(spark, tmp_path):
    """VERDICT r05 item 7: the realistic Bronze drift case — a stream
    restart picks up landing files that grew a column. With
    merge_schema=True the table schema evolves mid-pipeline: pre-drift
    rows read back NULL for the new column, post-drift rows carry it,
    and a further no-drift re-drain stays a no-op."""
    src = str(tmp_path / "landing_ev")
    spark.createDataFrame(
        [(1, "a", 2024, 1), (2, "b", 2024, 2)],
        "id long, name string, year int, month int",
    ).write.parquet(src)
    table = ManagedTable(
        spark, "bsev", str(tmp_path / "bsev"), partition_columns=["year", "month"]
    )
    ckpt = str(tmp_path / "ckpt_ev")
    stream_bronze_ingest(spark, src, table, ckpt, merge_schema=True)
    assert table.read().columns == ["id", "name", "year", "month"]

    # drift: new files carry an extra column; SAME checkpoint, so only
    # the new files are processed on restart
    spark.createDataFrame(
        [(3, "c", 2024, 2, "x@y.z")],
        "id long, name string, year int, month int, email string",
    ).write.mode("append").parquet(src)
    stream_bronze_ingest(spark, src, table, ckpt, merge_schema=True)

    df = table.read()
    assert df.columns == ["id", "name", "year", "month", "email"]
    rows = {r.id: r for r in df.collect()}
    assert rows[1].email is None and rows[2].email is None
    assert rows[3].email == "x@y.z"

    # no-drift re-drain with a fresh checkpoint replays everything and
    # inserts nothing; version must not move (no-op merges are free)
    v = table.current_version()
    stream_bronze_ingest(spark, src, table, str(tmp_path / "ckpt_ev2"),
                         merge_schema=True)
    assert table.current_version() == v
    assert table.read().count() == 3
