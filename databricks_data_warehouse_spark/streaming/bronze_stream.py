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

import hashlib
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
    merge_schema: bool = False,
) -> ManagedTable:
    """Drain ``source_dir`` (parquet files) into ``table`` with one
    idempotent merge per micro-batch; returns after the availableNow
    drain completes.

    ``merge_schema=True`` is the schema-on-read drift path: the stream
    schema is inferred across ALL files (``mergeSchema``), and each
    micro-batch merge evolves the table schema (new columns appended,
    old rows null-filled) — so a restarted stream whose landing files
    grew a column keeps ingesting, the realistic Bronze drift case.
    A file stream's schema is pinned at start; drift between restarts
    (not within a run) is what this covers, matching how Delta's
    autoMerge handles it."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    schema = reader.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(
            tempfile.gettempdir(), f"bronze_ckpt_{uuid.uuid4().hex[:8]}"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not table.exists():
            table.create_if_not_exists(batch_df.schema)
        table.merge_insert_only(batch_df, merge_schema=merge_schema)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table


def stream_events_to_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable streaming ingestion: the ``events`` stream drained
    through ``foreachBatch`` + keyed ``merge_insert_only`` into a
    ManagedTable, then read back — the MERGE-maintained-table parity the
    reference's Bronze stage has in batch form
    (Bronze-Ingestion-Customers.py:51-58), now fed by a stream.

    Every call uses a FRESH checkpoint, so the whole source replays each
    time and the table still holds exactly one copy of every event: the
    exactly-once guarantee comes from the merge (anti-join on
    ``event_id``), not from checkpoint bookkeeping. The table location
    is keyed on the corpus fingerprint so a regenerated source gets a
    fresh table rather than merging into stale rows. The drained table
    IS the events table — hash-checkable against ``SELECT * FROM
    events``.

    Write hygiene (BENCH_r05 "What's wrong 2"): the table is
    PARTITIONED by event_type, so a micro-batch rewrites only the
    partitions it touches; a replayed batch whose anti-join inserts
    nothing commits nothing at all (merge_insert_only's no-op
    short-circuit); and ``retain_versions=2`` vacuums superseded
    versions on commit, so neither versions nor dead files accumulate
    across batches or re-runs — a re-drain of an already-ingested
    source costs one anti-join probe, not O(table) rewrites.
    """
    from .windows import _scratch_root, _stream_events

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    try:
        if os.path.isdir(src):
            fp = str(
                sorted(
                    (n, os.stat(os.path.join(src, n)).st_mtime_ns)
                    for n in os.listdir(src)
                )
            )
        else:
            st = os.stat(src)
            fp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        fp = "missing"
    # layout is part of the key: a relocated layout change (e.g. the
    # r06 partition-by-event_type) must get a fresh table, not merge
    # partitioned writes into an unpartitioned manifest
    h = hashlib.md5(f"{src}|{fp}|pby=event_type,rv=2".encode()).hexdigest()[:10]
    loc = os.path.join(_scratch_root(), f"stream_tbl_{h}")
    table = ManagedTable(
        spark,
        f"stream_events_{h}",
        loc,
        partition_columns=["event_type"],
        retain_versions=2,
    )

    events = _stream_events(spark, sf_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not table.exists():
            table.create_if_not_exists(batch_df.schema)
        table.merge_insert_only(batch_df, match_columns=["event_id"])

    ckpt = os.path.join(
        _scratch_root(), "ckpt", f"stream_tbl_{uuid.uuid4().hex[:8]}"
    )
    q = (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table.read()
