"""As-of and range joins — operators Spark's join syntax lacks,
composed from built-in primitives (no UDFs, no mapPartitions).

As-of join (backward): for each left row, the single most recent right
row at-or-before its timestamp, per key. Spark has no ASOF JOIN; the
standard composition is a tagged union + `last(ignorenulls)` over a
time-ordered window — one shuffle by (key), no range explosion, state
linear in rows. (DuckDB has native ASOF JOIN, which is the oracle.)

Range join: equi-free interval containment (value BETWEEN lo AND hi)
against a small band table — broadcast the bands so the 'inequality
join' is a broadcast nested loop over k bands, not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..queries._util import load


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of-backward join: latest right row with
    ``right_ts <= left_ts`` per ``key``. Right must be unique per
    (key, right_ts) — pre-aggregate if not, or ties are undefined
    (DuckDB ASOF has the same contract).
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__t"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        )
        .withColumn("__is_left", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps, so an
    # exactly-simultaneous right row IS visible to the left row (<=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            f"__r_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return (
        carried.filter(F.col("__is_left") == 1)
        .drop("__t", "__is_left")
        .withColumnsRenamed({f"__r_{c}": c for c in right_cols})
    )


def asof_events_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the customer's most recent order at-or-before
    the event time (as-of backward on user_id/custkey)."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    # unique per (custkey, date): keep the max orderkey (deterministic
    # tie contract, mirrored in the oracle)
    latest_per_day = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    joined = asof_join_backward(
        events,
        latest_per_day.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
    )


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join: events classified into value bands
    (a 6-row broadcast band table; lo <= value < hi). The inequality
    join compiles to a broadcast nested loop over the tiny band side —
    the right plan shape; a shuffle range join would be wrong here."""
    bands = spark.createDataFrame(
        [
            ("negative", float("-inf"), 0.0),
            ("tiny", 0.0, 10.0),
            ("small", 10.0, 50.0),
            ("medium", 50.0, 150.0),
            ("large", 150.0, 300.0),
            ("huge", 300.0, float("inf")),
        ],
        "band string, lo double, hi double",
    )
    events = load(spark, sf_dir, "events").select("event_id", "value")
    joined = events.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        "left",
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("event_count"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / 100).alias(
            "sum_value"
        ),
    )
