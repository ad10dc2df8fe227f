"""Bucketed co-located join: the join over two tables bucketed on the
join key must contain NO Exchange (shuffle) in its physical plan, and
must return the same rows as the plain shuffled join."""

from __future__ import annotations

import pytest

from databricks_data_warehouse_spark.queries._util import load
from databricks_data_warehouse_spark.sources.bucketing import (
    colocated_join,
    physical_plan,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", n_buckets=4)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force SortMergeJoin so the assert is about bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        plan = physical_plan(joined.groupBy("o_custkey").count())
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # everything BELOW the join in the printed tree (the join's
        # inputs) must be shuffle-free: buckets are read directly. The
        # only exchange allowed is above the join (groupBy re-key).
        below_join = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in below_join, (
            "shuffle appeared below the join — bucketing not used:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = colocated_join(spark, lt, rt, "o_orderkey", "l_orderkey")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    assert bucketed.count() == plain.count()
    a = bucketed.groupBy("o_custkey").count().collect()
    b = plain.groupBy("o_custkey").count().collect()
    assert sorted((r[0], r[1]) for r in a) == sorted((r[0], r[1]) for r in b)
