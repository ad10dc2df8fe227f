"""Invariant checks for the TPC-H query corpus at sf0.001.

Exact value agreement is enforced by the DuckDB oracle gate
(scripts/check_oracle.py / the driver's CORRECTNESS run); these tests
pin the structural invariants that would silently break first under a
refactor: key uniqueness, filter semantics, and tie-break ordering.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.queries import tpch

SF_DIR = "/root/testdata/sf0.001"


def test_q4_priorities_are_unique_and_counted(spark):
    rows = tpch.tpch_q4_order_priority(spark, SF_DIR).collect()
    prios = [r["o_orderpriority"] for r in rows]
    assert len(prios) == len(set(prios))
    assert all(r["order_count"] > 0 for r in rows)


def test_q10_topk_is_ordered_with_deterministic_tiebreak(spark):
    rows = tpch.tpch_q10_returned_items(spark, SF_DIR).collect()
    assert len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    for a, b in zip(rows, rows[1:]):
        if a["revenue"] == b["revenue"]:
            assert a["c_custkey"] < b["c_custkey"]


def test_q13_distribution_conserves_customers(spark):
    from databricks_data_warehouse_spark.queries._util import load

    n_cust = load(spark, SF_DIR, "customer").count()
    rows = tpch.tpch_q13_customer_distribution(spark, SF_DIR).collect()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_q15_all_winners_share_the_max_revenue(spark):
    rows = tpch.tpch_q15_top_supplier(spark, SF_DIR).collect()
    assert len(rows) >= 1
    assert len({r["total_revenue"] for r in rows}) == 1


def test_q18_threshold_and_ordering(spark):
    rows = tpch.tpch_q18_large_volume_customers(spark, SF_DIR).collect()
    assert all(r["total_qty"] > 300 for r in rows)
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_q22_customers_have_no_recent_orders(spark):
    from pyspark.sql import functions as F

    from databricks_data_warehouse_spark.queries._util import load

    out = tpch.tpch_q22_sales_opportunity(spark, SF_DIR)
    assert set(r["nationkey"] for r in out.collect()) <= set(range(7))
    # every counted customer must genuinely lack post-1999 orders
    recent_cust = (
        load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert recent_cust > 0  # the anti-join filter is non-vacuous


def test_gapfill_dense_spine_and_locf(spark):
    from pyspark.sql import functions as F

    from databricks_data_warehouse_spark.queries.aggregates import (
        agg_daily_revenue_gapfill,
    )
    from databricks_data_warehouse_spark.queries._util import load

    out = agg_daily_revenue_gapfill(spark, SF_DIR).cache()
    orders = load(spark, SF_DIR, "orders")
    lo, hi = orders.agg(
        F.min(F.col("o_orderdate").cast("date")),
        F.max(F.col("o_orderdate").cast("date")),
    ).first()
    n_days = (hi - lo).days + 1
    n_prio = orders.select("o_orderpriority").distinct().count()
    # dense: every (priority, day) cell exists exactly once
    assert out.count() == n_days * n_prio
    assert out.select("o_orderpriority", "day").distinct().count() == n_days * n_prio
    # gap days are 0-filled and flagged; active days carry their revenue
    gaps = out.where(~F.col("has_orders"))
    assert gaps.where(F.col("daily_revenue") != 0).count() == 0
    assert gaps.count() > 0  # the spine really densified something
    # LOCF: on active days it equals daily revenue; on gap days it
    # equals the most recent active day's revenue (spot-check per group)
    active = out.where(F.col("has_orders"))
    assert active.where(
        F.col("revenue_locf") != F.col("daily_revenue")
    ).count() == 0
    rows = (
        out.where(F.col("o_orderpriority") == "1-URGENT")
        .orderBy("day")
        .select("daily_revenue", "has_orders", "revenue_locf")
        .collect()
    )
    carried = 0.0
    for r in rows:
        if r["has_orders"]:
            carried = r["daily_revenue"]
        assert r["revenue_locf"] == carried
    out.unpersist()


def test_customer_quartiles_partition_customers(spark):
    from databricks_data_warehouse_spark.queries._util import load
    from databricks_data_warehouse_spark.queries.aggregates import (
        agg_customer_quartiles,
    )

    rows = {r["quartile"]: r for r in agg_customer_quartiles(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3, 4}
    n_cust = (
        load(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    sizes = [rows[q]["n_customers"] for q in (1, 2, 3, 4)]
    assert sum(sizes) == n_cust
    assert max(sizes) - min(sizes) <= 1  # ntile balance property
    # quartile 1 holds the top spenders
    avgs = [rows[q]["avg_spend"] for q in (1, 2, 3, 4)]
    assert avgs == sorted(avgs, reverse=True)


def test_derived_partsupp_structure(spark):
    """The derived partsupp is a valid TPC-H partsupp: exactly 4 distinct
    suppliers per part, every FK resolves, values in range, and the
    derivation is deterministic (pure arithmetic, no seed)."""
    from databricks_data_warehouse_spark.queries.tpch import derived_partsupp

    sf = "/root/testdata/sf0.001"
    ps = derived_partsupp(spark, sf)
    n_parts = spark.read.parquet(f"{sf}/part.parquet").count()
    assert ps.count() == 4 * n_parts
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n")
    )
    assert per_part.filter(F.col("n") != 4).count() == 0
    supp_keys = {
        r.s_suppkey
        for r in spark.read.parquet(f"{sf}/supplier.parquet")
        .select("s_suppkey")
        .collect()
    }
    assert {r.ps_suppkey for r in ps.select("ps_suppkey").distinct().collect()} <= supp_keys
    bad = ps.filter(
        (F.col("ps_availqty") < 1) | (F.col("ps_availqty") > 9999)
        | (F.col("ps_supplycost") < 1.0) | (F.col("ps_supplycost") > 1000.0)
    )
    assert bad.count() == 0
    a = sorted(map(tuple, derived_partsupp(spark, sf).collect()))
    b = sorted(map(tuple, derived_partsupp(spark, sf).collect()))
    assert a == b
