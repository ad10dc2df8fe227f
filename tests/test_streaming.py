"""Streaming ≡ batch equivalence: on a bounded historical source, the
availableNow-drained streaming aggregations must produce exactly the
batch results (the property that also lets the DuckDB oracle check
them), and the custom stateful operator must match a batch groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_data_warehouse_spark import streaming as st
from databricks_data_warehouse_spark.ext.json_ops import events_hourly_windows
from databricks_data_warehouse_spark.queries._util import load

SF = "/root/testdata/sf0.001"


def test_tumbling_stream_equals_batch(spark):
    batch = events_hourly_windows(spark, SF)
    stream = st.stream_hourly_tumbling(spark, SF)
    assert stream.count() == batch.count()
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_session_windows_cover_all_events(spark):
    events = load(spark, SF, "events")
    sessions = st.stream_session_windows(spark, SF)
    # every event is in exactly one session
    assert (
        sessions.agg(F.sum("event_count")).collect()[0][0] == events.count()
    )
    # session invariant: end = last event + gap ⇒ end > start
    assert sessions.filter(F.col("session_end") <= F.col("session_start")).count() == 0


def test_stateful_running_counts_match_batch_groupby(spark):
    events = load(spark, SF, "events")
    expected = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r.user_id: r.events_seen
        for r in st.stream_user_running_counts(spark, SF).collect()
    }
    assert got == expected


def test_stream_stream_join_equals_batch_self_join(spark):
    events = load(spark, SF, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
    stream = st.stream_click_purchase_join(spark, SF)
    assert stream.count() == batch.count()
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_stream_dedup_collapses_redelivery(spark):
    from databricks_data_warehouse_spark.queries._util import load
    from databricks_data_warehouse_spark.streaming import stream_dedup_events

    sf = "/root/testdata/sf0.001"
    out = stream_dedup_events(spark, sf)
    src = load(spark, sf, "events")
    n_src = src.count()
    assert out.count() == n_src  # 2n redelivered rows -> n distinct
    assert out.select("event_id").distinct().count() == n_src


def test_batch_sessionize_agrees_with_streaming_sessions(spark):
    """Same gap rule, two engines: gaps-and-islands batch sessionization
    must produce the same session partitioning (count + sizes) as the
    streaming session_window state machine."""
    from databricks_data_warehouse_spark.ext.json_ops import events_sessionize

    batch = events_sessionize(spark, SF, gap_minutes=30)
    stream = st.stream_session_windows(spark, SF)
    assert batch.count() == stream.count()
    # identical (user, session_start, event_count) triples; streaming
    # session_end = last event + gap, batch = last event, so compare on
    # the fields with shared semantics
    b = {
        (r["user_id"], r["session_start"], r["event_count"])
        for r in batch.collect()
    }
    s = {
        (r["user_id"], r["session_start"], r["event_count"])
        for r in stream.collect()
    }
    assert b == s
    # within a user, sessions are disjoint and ordered: next start is
    # strictly after previous end + gap
    import collections
    by_user = collections.defaultdict(list)
    for r in batch.collect():
        by_user[r["user_id"]].append((r["session_start"], r["session_end"]))
    from datetime import timedelta
    gap = timedelta(minutes=30)
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2  # disjoint
            assert s2 > e1 + gap  # the cut was a REAL gap
