"""Generated columns (Delta `GENERATED ALWAYS AS`): computed on write,
validated on every write, and — for the monotonic shapes — filters on
the SOURCE column derive filters on the generated (partition) column,
so `WHERE ts …` partition-prunes a `d = CAST(ts AS DATE)` layout
without the query naming `d`."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import (
    ManagedTable,
    _derived_generated_triples,
    _gen_apply,
    _parse_generation_expr,
)

_TS0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, n=3000):
    return spark.range(0, n).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=(F.col("id") * 15).cast("int"))
        ).alias("ts"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


@pytest.fixture()
def day_table(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("v", DoubleType()),
            StructField("day", DateType()),
        ]
    )
    t = ManagedTable(
        spark,
        "genday",
        str(tmp_path / "genday"),
        schema=schema,
        partition_columns=["day"],
    )
    t.set_generated_column("day", "CAST(ts AS DATE)")
    t.overwrite(_events(spark))  # 'day' omitted: computed on write
    return t


def test_parse_shapes():
    assert _parse_generation_expr("CAST(ts AS DATE)") == ("to_date", None, "ts")
    assert _parse_generation_expr("to_date(ts)") == ("to_date", None, "ts")
    assert _parse_generation_expr("date_trunc('month', ts)") == (
        "date_trunc", "month", "ts",
    )
    assert _parse_generation_expr("year(ts)") == ("year", None, "ts")
    assert _parse_generation_expr("substring(s, 1, 4)") == ("substr", 4, "s")
    # month parses but is pair-gated (non-monotonic): see
    # test_month_pair_derivation_rules
    assert _parse_generation_expr("month(ts)") == ("month", None, "ts")
    assert _parse_generation_expr("dayofmonth(ts)") is None
    assert _parse_generation_expr("a + b") is None


def test_gen_apply_semantics():
    ts = datetime.datetime(2024, 3, 7, 15, 44, 9, 123)
    assert _gen_apply("to_date", None, ts) == datetime.date(2024, 3, 7)
    assert _gen_apply("year", None, ts) == 2024
    assert _gen_apply("date_trunc", "month", ts) == datetime.datetime(2024, 3, 1)
    # 2024-03-07 is a Thursday; Spark weeks start Monday
    assert _gen_apply("date_trunc", "week", ts) == datetime.datetime(2024, 3, 4)
    assert _gen_apply("date_trunc", "hour", ts) == datetime.datetime(
        2024, 3, 7, 15
    )
    assert _gen_apply("substr", 3, "abcdef") == "abc"
    # pushdown string literals (tz-aware ISO) parse too
    assert _gen_apply("to_date", None, "2024-01-30 00:00:00+00:00") == (
        datetime.date(2024, 1, 30)
    )
    assert _gen_apply("to_date", None, 42) is None


def test_derivation_triples():
    gen = {"day": {"expr": "CAST(ts AS DATE)", "fn": "to_date",
                   "arg": None, "src": "ts"}}
    lo = datetime.datetime(2024, 1, 10, 5, 0)
    hi = datetime.datetime(2024, 1, 12, 23, 59)
    got = _derived_generated_triples([("ts", "between", lo, hi)], gen)
    assert got == [
        ("day", "between", datetime.date(2024, 1, 10),
         datetime.date(2024, 1, 12))
    ]
    got2 = _derived_generated_triples([("ts", "<", lo)], gen)
    assert got2 == [("day", "<=", datetime.date(2024, 1, 10))]
    assert _derived_generated_triples([("other", "=", 1)], gen) == []


def test_computed_on_write_and_correct(day_table):
    bad = day_table.read().filter(
        ~F.col("day").eqNullSafe(F.col("ts").cast("date"))
    ).count()
    assert bad == 0
    assert day_table.read().count() == 3000


def test_source_filter_partition_prunes(day_table):
    lo = datetime.datetime(2024, 1, 10)
    hi = datetime.datetime(2024, 1, 12, 23, 59, 59)
    rep = day_table.skipping_report([("ts", "between", lo, hi)])
    assert rep["files_kept"] < rep["files_total"] / 4
    got = day_table.scan([("ts", "between", lo, hi)]).count()
    want = day_table.read().filter(F.col("ts").between(lo, hi)).count()
    assert got == want > 0


def test_derivation_prunes_even_without_source_stats(day_table):
    """The mechanism itself, isolated: strip the source column's footer
    stats from the manifest (simulating an unindexable source type) —
    the derived day-triple must still partition-prune."""
    v = day_table.current_version()
    path = day_table._manifest_path(v)
    with open(path) as f:
        m = json.load(f)
    for st in m["stats"].values():
        st["cols"].pop("ts", None)
    os.remove(path)
    with open(path, "w") as f:
        json.dump(m, f)
    lo = datetime.datetime(2024, 1, 30)
    rep = day_table.skipping_report([("ts", ">=", lo)])
    assert rep["files_kept"] < rep["files_total"] / 4
    got = day_table.scan([("ts", ">=", lo)]).count()
    assert got == day_table.read().filter(F.col("ts") >= lo).count() > 0


def test_wrong_supplied_value_aborts(day_table, spark):
    v0 = day_table.current_version()
    bad = _events(spark, 10).withColumn(
        "day", F.lit(datetime.date(1999, 1, 1))
    )
    with pytest.raises(ValueError, match="generated column day"):
        day_table.append(bad)
    assert day_table.current_version() == v0
    assert day_table.read().count() == 3000


def test_append_computes_and_prunes(day_table, spark):
    extra = spark.range(0, 100).select(
        (F.col("id") + 10_000).alias("event_id"),
        F.lit("2024-03-05 12:00:00").cast("timestamp").alias("ts"),
        F.lit(0.0).alias("v"),
    )
    day_table.append(extra)
    rep = day_table.skipping_report(
        [("ts", ">=", datetime.datetime(2024, 3, 1))]
    )
    assert rep["rows_kept_bound"] == 100
    assert day_table.scan(
        [("ts", ">=", datetime.datetime(2024, 3, 1))]
    ).count() == 100


def test_rename_blocked_for_generated_and_source(day_table):
    with pytest.raises(ValueError, match="generated column"):
        day_table.rename_column("ts", "event_time")
    # 'day' is also a partition column; either guard firing is fine
    with pytest.raises(ValueError):
        day_table.rename_column("day", "d2")


def test_declare_after_create_rejected(spark, tmp_path):
    t = ManagedTable(spark, "late_gen", str(tmp_path / "late_gen"))
    t.overwrite(_events(spark, 50))
    with pytest.raises(ValueError, match="before the table is created"):
        t.set_generated_column("day", "CAST(ts AS DATE)")


def test_pushdown_sql_where_partition_prunes(day_table, spark):
    day_table.create_view("genday_v")
    n = spark.sql(
        "SELECT count(*) AS n FROM genday_v "
        "WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'"
    ).collect()[0].n
    assert n == day_table.read().filter(
        F.col("ts") >= datetime.datetime(2024, 1, 30)
    ).count()
    rep = day_table.last_pushdown_report()
    assert rep["files_kept"] < rep["files_total"] / 4


def test_sql_create_generated_and_insert(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    s = SqlSession(spark, base_location=str(tmp_path))
    s.sql(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, "
        "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) "
        "PARTITIONED BY (day)"
    )
    t = s.table("ev")
    assert "day" in t.generated
    # INSERT omitting the generated column: computed automatically
    s.sql(
        "INSERT INTO ev VALUES "
        "(1, TIMESTAMP '2024-05-01 10:00:00'), "
        "(2, TIMESTAMP '2024-05-02 11:00:00')"
    )
    rows = sorted(
        (r.event_id, str(r.day)) for r in s.sql("SELECT * FROM ev").collect()
    )
    assert rows == [(1, "2024-05-01"), (2, "2024-05-02")]


def test_merge_paths_compute_generated(day_table, spark):
    """The streaming-sink primitives (merge_insert_only / merge_upsert)
    compose with generated columns: a source batch omitting `day` gets
    it computed, idempotent replay stays a no-op, and the partition
    filter still derives from ts."""
    batch = spark.range(0, 20).select(
        (F.col("id") + 50_000).alias("event_id"),
        F.lit("2024-04-01 08:00:00").cast("timestamp").alias("ts"),
        F.lit(1.5).alias("v"),
    )
    day_table.merge_insert_only(batch)
    assert day_table.read().count() == 3020
    day_table.merge_insert_only(batch)  # replay: idempotent no-op
    assert day_table.read().count() == 3020
    upd = batch.withColumn("v", F.lit(99.5))  # sentinel absent from base
    day_table.merge_upsert(upd, key_columns=["event_id"])
    assert day_table.read().filter(F.col("v") == 99.5).count() == 20
    rep = day_table.skipping_report(
        [("ts", ">=", datetime.datetime(2024, 4, 1))]
    )
    assert rep["rows_kept_bound"] == 20


def test_metadata_aggregate_on_partition_column(day_table):
    """Partition values recorded as stats make metadata-only MIN/MAX
    answerable for the partition column itself."""
    agg = day_table.metadata_aggregate("day")
    assert agg["count"] == 3000
    assert agg["day"]["min"].startswith("2024-01-01")
    # 3000 events at 15-min spacing span 31.25 days
    assert agg["day"]["max"].startswith("2024-02-01")
    assert agg["day"]["null_count"] == 0


def test_month_pair_derivation_rules(spark, tmp_path):
    """month() is non-monotonic: equality derives unconditionally,
    ranges only within one year (cross-year windows must NOT derive —
    months wrap), pinned end-to-end on a (y, m) layout."""
    from databricks_data_warehouse_spark.sources.tables import (
        _derived_generated_triples as derive,
    )

    gen = {
        "y": {"expr": "year(ts)", "fn": "year", "arg": None, "src": "ts"},
        "m": {"expr": "month(ts)", "fn": "month", "arg": None, "src": "ts"},
    }
    lo = datetime.datetime(2024, 3, 5)
    hi = datetime.datetime(2024, 7, 20)
    got = dict(
        (t[0], t) for t in derive([("ts", "between", lo, hi)], gen)
    )
    assert got["y"] == ("y", "between", 2024, 2024)
    assert got["m"] == ("m", "between", 3, 7)
    # cross-year: month must NOT derive (Dec..Feb wraps), year still does
    hi2 = datetime.datetime(2025, 2, 1)
    got2 = dict(
        (t[0], t) for t in derive([("ts", "between", lo, hi2)], gen)
    )
    assert got2["y"] == ("y", "between", 2024, 2025)
    assert "m" not in got2
    # bare range ops never derive month
    assert all(
        t[0] != "m" for t in derive([("ts", ">=", lo)], gen)
    )
    # equality always derives both
    got3 = dict((t[0], t) for t in derive([("ts", "=", lo)], gen))
    assert got3["m"] == ("m", "=", 3) and got3["y"] == ("y", "=", 2024)

    # end-to-end on a (y, m) partitioned table
    from pyspark.sql.types import IntegerType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("y", IntegerType()),
            StructField("m", IntegerType()),
        ]
    )
    t = ManagedTable(
        spark, "ym", str(tmp_path / "ym"),
        schema=schema, partition_columns=["y", "m"],
    )
    t.set_generated_column("y", "year(ts)")
    t.set_generated_column("m", "month(ts)")
    t.overwrite(
        spark.range(0, 2000).select(
            F.col("id").alias("event_id"),
            (
                F.lit("2023-06-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") * 8).cast("int"))
            ).alias("ts"),  # ~22 months: mid-2023 → early 2025
        )
    )
    probe = [("ts", "between", lo, hi)]
    rep = t.skipping_report(probe)
    assert rep["files_kept"] < rep["files_total"] / 3
    assert (
        t.scan(probe).count()
        == t.read().filter(F.col("ts").between(lo, hi)).count()
        > 0
    )
    # cross-year probe: year pruning only, still exact
    probe2 = [("ts", "between", lo, hi2)]
    assert (
        t.scan(probe2).count()
        == t.read().filter(F.col("ts").between(lo, hi2)).count()
        > 0
    )


def test_merge_clauses_regenerates_per_clause(spark, tmp_path):
    """ADVICE r12 (medium): when clause A explicitly assigns generated
    column g and clause B assigns only g's INPUT, rows fired by B must
    still regenerate g — a global assigned-set union left them with the
    stale stored value (misleading CHECK abort or a persisted
    invariant-violating value)."""
    t = ManagedTable(spark, "tg", str(tmp_path / "tg"))
    t.set_generated_column("g", "v * 2")
    t.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    )
    src = spark.createDataFrame(
        [(1, 100.0), (2, 200.0)], "k long, v double"
    )
    t.merge_clauses(
        src,
        ["k"],
        matched=[
            # clause m0: explicit (consistent) assignment of g
            ("src.v >= 200", {"v": "src.v", "g": "src.v * 2"}),
            # clause m1: assigns only g's input — g must regenerate
            (None, {"v": "src.v"}),
        ],
    )
    rows = {r["k"]: (r["v"], r["g"]) for r in t.read().collect()}
    assert rows == {1: (100.0, 200.0), 2: (200.0, 400.0)}
