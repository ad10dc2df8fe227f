"""Dashboard queries — the reference's Seed-Store-Dashboard.py re-expressed
as Spark SQL over the synthetic star schema.

Parity map (query shape, not data):
- dash_top_nations_by_segment   ← Seed-Store-Dashboard.py:24-28 (top-k)
- dash_customer_share_by_segment ← :36-48 (windowed share-of-total)
- dash_low_order_customers      ← :64-67 (filtered week query)
- dash_avg_delivery_by_nation   ← :75-96 (weighted average over pre-agg)
- dash_late_orders_by_priority  ← :104-123 (two CTEs + join)

Determinism for the DuckDB oracle: every top-k has a total-order
tiebreaker; ratio columns divide exact integers (IEEE-identical across
engines) and ROUND(x, 2) at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._util import load

_TABLES = ("customer", "orders", "lineitem", "nation")


def _register(spark: SparkSession, sf_dir: str) -> None:
    for name in _TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def dash_top_nations_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 nations with the most BUILDING-segment customers
    (top-k: ORDER BY count DESC LIMIT 5 → TakeOrderedAndProject)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS customer_count
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY n.n_name
        ORDER BY customer_count DESC, n.n_name
        LIMIT 5
        """
    )


def dash_customer_share_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer count by (segment, nation) with each nation's share of its
    segment — SUM() OVER (PARTITION BY) share-of-total window."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        WITH counts AS (
            SELECT c.c_mktsegment, n.n_name, COUNT(*) AS customer_count
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY c.c_mktsegment, n.n_name
        )
        SELECT c_mktsegment, n_name, customer_count,
               floor(customer_count / SUM(customer_count)
                     OVER (PARTITION BY c_mktsegment) * 100 * 100 + 0.5) / 100
                   AS pct_of_segment
        FROM counts
        """
    )


def dash_low_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACHINERY customers with fewer than 5 orders in ISO week 28 of 1995
    (filtered week query: WHERE year/week/segment + HAVING count < n)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_custkey, COUNT(*) AS order_count
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE year(o.o_orderdate) = 1995
          AND weekofyear(o.o_orderdate) = 28
          AND c.c_mktsegment = 'MACHINERY'
        GROUP BY o.o_custkey
        HAVING COUNT(*) < 5
        """
    )


def dash_avg_delivery_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average ship delay per nation, recomposed from a per-
    (nation, year) pre-aggregate — SUM(avg*n)/SUM(n), the reference's
    weighted-average-over-gold pattern."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        WITH per_year AS (
            -- integer delay sums keep the weighted recomposition exact
            SELECT n.n_name, year(o.o_orderdate) AS order_year,
                   SUM(datediff(CAST(l.l_shipdate AS DATE),
                                CAST(o.o_orderdate AS DATE))) AS sum_delay,
                   COUNT(*) AS line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name, year(o.o_orderdate)
        )
        SELECT n_name,
               floor(SUM(sum_delay) / SUM(line_count) * 100 + 0.5) / 100
                   AS weighted_avg_delay,
               CAST(SUM(line_count) AS BIGINT) AS line_count
        FROM per_year
        GROUP BY n_name
        """
    )


def dash_late_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of orders with any line shipped >7 days after order date, by
    priority — two CTEs joined (the reference's CTE+join dashboard query)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        WITH total AS (
            SELECT o_orderpriority, COUNT(*) AS total_orders
            FROM orders
            GROUP BY o_orderpriority
        ),
        late AS (
            SELECT o.o_orderpriority,
                   COUNT(DISTINCT o.o_orderkey) AS late_orders
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE datediff(CAST(l.l_shipdate AS DATE),
                           CAST(o.o_orderdate AS DATE)) > 7
            GROUP BY o.o_orderpriority
        )
        SELECT t.o_orderpriority, t.total_orders, l.late_orders,
               floor(l.late_orders / t.total_orders * 100 * 100 + 0.5) / 100
                   AS late_pct
        FROM total t
        JOIN late l ON t.o_orderpriority = l.o_orderpriority
        """
    )
