"""Gold aggregate builders — the reference's Gold layer re-expressed over
the synthetic star schema (customer/orders/lineitem/nation).

Reference parity map (semantics, not data):
- gold_customer_status_by_city  ← Gold-Customer-Status-By-City.py:25-58
  (latest order per entity via rank-window [ties kept — rank, NOT
  row_number, quirk preserved], double left join, groupBy count)
- gold_customer_breakdown       ← Gold-Customer-Breakdown.py:25-39
- gold_orders_by_city           ← Gold-Orders-By-City.py:24-42
  (count + avg by geo/year/month)
- gold_orders_by_customer_week  ← Gold-Orders-By-Customer-Week.py:24-42
  (ISO weekofyear derivation)
- gold_orders_delivery_time     ← Gold-Orders-Type-Delivery-Time.py:24-41
  (datediff day bucket, groupBy type/delay/year)

Scale notes (100 TB lens): every builder prunes columns at the scan,
broadcasts the 25-row ``nation`` dim explicitly, and aggregates with
built-in hash aggs (partial + final, no UDFs). The rank-window shuffles
by its natural entity key (o_custkey) — the same partitioning a
downstream per-customer join would want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import cents, load, rnd


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: latest record per entity — rank desc by event time, keep rank 1.

    ``rank`` (not ``row_number``): date ties keep ALL tied rows, matching
    Gold-Customer-Status-By-City.py:32-33.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc())
    return (
        orders.withColumn("customer_order_rank", F.rank().over(w))
        .filter(F.col("customer_order_rank") == 1)
        .drop("customer_order_rank")
    )


def gold_customer_status_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers counted by (status of their latest order, market segment).

    Plan shape: window (shuffle by o_custkey) → left join customer on the
    same key → hash agg. Customers with no orders land in the NULL
    latest_order_status group (left join, parity with the reference).
    """
    latest = latest_order_per_customer(spark, sf_dir).select(
        F.col("o_custkey"), F.col("o_orderstatus").alias("latest_order_status")
    )
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        customer.join(latest, customer.c_custkey == latest.o_custkey, "left")
        .groupBy("latest_order_status", "c_mktsegment")
        .agg(F.count("*").alias("customer_count"))
    )


def gold_customer_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer count by (segment, nation) — groupBy two categoricals
    (Gold-Customer-Breakdown.py:29). ``nation`` is 25 rows → broadcast."""
    customer = load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count("*").alias("customer_count"))
    )


def gold_orders_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + avg order value by (nation, year, month)
    (Gold-Orders-By-City.py:30-38: count + avg by geo/period)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .withColumn("order_year", F.year("o_orderdate").cast("long"))
        .withColumn("order_month", F.month("o_orderdate").cast("long"))
        .groupBy("n_name", "order_year", "order_month")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            # integer-cents sum → exact, engine-independent average
            rnd(F.sum(cents(F.col("o_totalprice"))) / F.count("o_totalprice") / 100, 2)
            .alias("avg_total_price"),
        )
    )


def gold_orders_by_customer_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count by (customer, year, ISO week, segment)
    (Gold-Orders-By-Customer-Week.py:30-38; F.weekofyear is ISO-8601,
    matching DuckDB's weekofyear — SURVEY.md §2.H)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .withColumn("order_year", F.year("o_orderdate").cast("long"))
        .withColumn("order_week", F.weekofyear("o_orderdate").cast("long"))
        .groupBy("o_custkey", "order_year", "order_week", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


def gold_orders_delivery_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line count by (priority, ship delay in days, year)
    (Gold-Orders-Type-Delivery-Time.py:29-37: datediff-day bucket).

    The lineitem⋈orders join shuffles on o_orderkey — the fact table's
    natural key; at scale both sides would be bucketed on it.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .withColumn(
            "ship_delay_days",
            F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")).cast("long"),
        )
        .withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_orderpriority", "ship_delay_days", "order_year")
        .agg(F.count("*").alias("line_count"))
    )
