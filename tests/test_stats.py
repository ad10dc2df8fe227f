"""Statistical aggregates: the exact-integer sufficient-statistics
formulation must agree with Spark's native corr/covar/regr to float
tolerance (the natives are the semantics; the integer path exists for
cross-engine bit-identity, not different math)."""

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.queries import managed_scan, stats
from databricks_data_warehouse_spark.queries._util import load

SF = "/root/testdata/sf0.001"


def test_corr_matches_native(spark):
    got = {r.l_returnflag: r for r in stats.stats_corr_price_qty(spark, SF).collect()}
    li = load(spark, SF, "lineitem")
    native = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(native)
    for flag, row in got.items():
        assert row.n_items == native[flag].n
        assert row.corr_qty_price == pytest.approx(native[flag].c, abs=1e-6)
        assert row.covar_qty_price == pytest.approx(native[flag].cv, rel=1e-6)


def test_regression_matches_native(spark):
    got = {
        r.o_orderpriority: r
        for r in stats.stats_delay_regression(spark, SF).collect()
    }
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_shipdate")
    orders = load(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        F.col("l_quantity").alias("x"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("double").alias("y"),
    )
    native = {
        r.o_orderpriority: r
        for r in j.groupBy("o_orderpriority")
        .agg(
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("icpt"),
            F.regr_r2("y", "x").alias("r2"),
        )
        .collect()
    }
    for prio, row in got.items():
        assert row.slope_days_per_unit == pytest.approx(native[prio].slope, abs=1e-5)
        assert row.intercept_days == pytest.approx(native[prio].icpt, abs=1e-5)
        assert row.r2 == pytest.approx(native[prio].r2, abs=1e-6)


def test_zorder_scan_equals_plain_filter(spark):
    got = sorted(managed_scan.table_zorder_scan(spark, SF).collect())
    orders = load(spark, SF, "orders")
    exp = sorted(
        orders.filter(
            F.col("o_custkey").between(100, 220)
            & F.col("o_totalprice").between(50_000.0, 200_000.0)
        )
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .collect()
    )
    assert got == exp
