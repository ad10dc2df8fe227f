"""JSON extraction over ``events.props`` (the reference has no JSON
surface — SURVEY.md §2.H lists it as extension).

``get_json_object`` is a JVM-side expression — stays in codegen, no
Python boundary; at scale the extraction projects before any shuffle so
only the extracted scalar moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import cents, load, rnd


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``props.k`` as a long for every event."""
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "props")
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the extracted payload by event_type: event count, sum and
    avg of ``k`` — extraction feeding a standard hash agg."""
    return (
        events_json_extract(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("k").alias("sum_k"),
            rnd(F.sum("k") / F.count("*"), 2).alias("avg_k"),
        )
    )


def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type (batch form of
    the streaming aggregation in ``streaming/windows.py`` — identical
    semantics, F.window in both)."""
    events = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("event_count"),
            # 2-decimal values → exact integer-cents sum, order-independent
            (F.sum(cents(F.col("value"))) / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "sum_value",
        )
    )


def events_sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Batch sessionization: per-user sessions cut at ``gap_minutes`` of
    inactivity — the classic gaps-and-islands rewrite (lag → new-session
    flag → running sum = session number), the batch twin of
    ``streaming/windows.stream_session_windows``'s stateful merge.

    Session boundaries compare raw timestamps (``ts > prev + INTERVAL``)
    — no epoch truncation, so the cut is microsecond-exact and
    cross-engine identical; the window orders by (ts, event_id) so ties
    can't reorder between engines.

    Scale notes: both windows and the final agg partition on
    ``user_id`` — one shuffle key end to end, the same partitioning the
    streaming deployment uses; per-user ordering is a partition-local
    sort, never global.
    """
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # two stages (a window argument can't itself contain a window):
    # both use the same partitioning, so Catalyst plans ONE exchange +
    # one sort feeding both Window operators
    flagged = events.withColumn(
        "is_new",
        (
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                > F.lag("ts").over(w)
                + F.expr(f"INTERVAL {gap_minutes} MINUTES")
            )
        ).cast("long"),
    )
    sess = flagged.withColumn(
        "sess_no",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("event_count"),
    )
