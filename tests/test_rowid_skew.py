"""Distribution-shape operators: scalable row numbering (no global
window) and salted skew joins (placement-only rewrite)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext.rowid import assign_row_ids
from databricks_data_warehouse_spark.functions.skew import salted_join


@pytest.fixture()
def people(spark):
    return spark.range(0, 1000).select(
        (F.col("id") * 7919 % 1000).alias("key"),  # permuted: unsorted input
        (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("p"), F.col("id")).alias("name"),
    ).repartition(8)


def test_row_ids_match_ansi_row_number(spark, people):
    got = assign_row_ids(people, ["key"])
    want = people.withColumn(
        "row_id", F.row_number().over(Window.orderBy("key"))
    )
    assert (
        got.orderBy("row_id").collect() == want.orderBy("row_id").collect()
    )


def test_row_ids_contiguous_and_deterministic(spark, people):
    a = assign_row_ids(people, ["key"]).select("key", "row_id")
    n = a.count()
    agg = a.agg(
        F.min("row_id"), F.max("row_id"), F.countDistinct("row_id")
    ).collect()[0]
    assert tuple(agg) == (1, n, n)
    b = assign_row_ids(people, ["key"]).select("key", "row_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_row_ids_avoid_single_partition_exchange(spark, people):
    """The whole point: the naive window plan funnels every row into
    one partition; the two-phase plan never does."""
    naive = people.withColumn(
        "row_id", F.row_number().over(Window.orderBy("key"))
    )
    assert "SinglePartition" in naive._jdf.queryExecution().executedPlan().toString()
    ours = assign_row_ids(people, ["key"])
    assert (
        "SinglePartition"
        not in ours._jdf.queryExecution().executedPlan().toString()
    )


def test_row_ids_multi_column_order(spark, people):
    got = assign_row_ids(people, ["grp", "key"])
    want = people.withColumn(
        "row_id", F.row_number().over(Window.orderBy("grp", "key"))
    )
    assert (
        got.orderBy("row_id").collect() == want.orderBy("row_id").collect()
    )


@pytest.fixture()
def skewed(spark):
    # 90% of rows share one key — the shape AQE's partition splitting
    # cannot spread when the key itself is hot
    return spark.range(0, 2000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 7))
        .alias("key"),
        (F.col("id") % 13).alias("v"),
    )


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [("hot", 100), ("k0", 1), ("k3", 3), ("zzz", 9)],
        "key string, w int",
    )


def test_salted_inner_equals_plain(skewed, dim):
    got = salted_join(skewed, dim, ["key"], salt_expr=F.col("rid"))
    want = skewed.join(dim, ["key"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_salted_left_keeps_unmatched(skewed, dim):
    got = salted_join(
        skewed, dim, ["key"], salt_expr=F.col("rid"), how="left"
    )
    want = skewed.join(dim, ["key"], "left")
    assert got.count() == want.count() == 2000
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_salt_spreads_hot_key(skewed, dim):
    got = salted_join(skewed, dim, ["key"], salt_expr=F.col("rid"), n_salts=8)
    # reconstruct the salt the operator assigned: 1800 'hot' rows must
    # not all share one value
    salts = (
        skewed.filter(F.col("key") == "hot")
        .select(F.pmod(F.xxhash64(F.col("rid")), F.lit(8)).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 1800 * 0.3
    assert got.filter(F.col("key") == "hot").count() == 1800
