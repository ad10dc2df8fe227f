"""TPC-H-style classics over the synthetic tables — bench headliners.

The reference has no analytic query corpus beyond its dashboard; these
exercise the same operator classes (multi-way join, hash agg, top-k) at
fact-table volume, which is what the sf0.1 bench measures.

Scale notes: filters sit directly on the scans (pushed to parquet),
region/nation are broadcast, aggregates are partial+final hash aggs.

Money math is integer-cents (all money columns are 2-decimal; discounts
and taxes are 2-decimal fractions): products and sums are exact BIGINTs,
so results are bit-identical to the DuckDB oracle regardless of
aggregation order — no float-summation hazard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import cents, load, rnd


def _disc_price_e4(ep: Column, disc: Column) -> Column:
    """l_extendedprice·(1-l_discount) in exact 1e-4 units."""
    return cents(ep) * (100 - cents(disc))


def _charge_e6(ep: Column, disc: Column, tax: Column) -> Column:
    """l_extendedprice·(1-l_discount)·(1+l_tax) in exact 1e-6 units."""
    return cents(ep) * (100 - cents(disc)) * (100 + cents(tax))


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report over lineitem (flagship agg)."""
    lineitem = load(spark, sf_dir, "lineitem")
    ep, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    n = F.count("*")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            (F.sum(cents(ep)) / 100).alias("sum_base_price"),
            (F.sum(_disc_price_e4(ep, disc)) / 10_000).alias("sum_disc_price"),
            (F.sum(_charge_e6(ep, disc, tax)) / 1_000_000).alias("sum_charge"),
            rnd(F.sum("l_quantity").cast("long") / n, 2).alias("avg_qty"),
            rnd(F.sum(cents(ep)) / n / 100, 2).alias("avg_price"),
            rnd(F.sum(cents(disc)) / n / 100, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue (join + agg + top-k)."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate") > cutoff),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (F.sum(_disc_price_e4(F.col("l_extendedprice"), F.col("l_discount")))
             / 10_000).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation (5-way join; nation broadcast)."""
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    return (
        orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(_disc_price_e4(F.col("l_extendedprice"), F.col("l_discount")))
             / 10_000).alias("revenue")
        )
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table filtered global agg (pushdown showcase)."""
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice")) * cents(F.col("l_discount")))
             / 10_000).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )
