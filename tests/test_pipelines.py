"""End-to-end medallion pipeline: bronze ingest → silver validation with
DLQ split → DLQ cleansing recovery, with conservation asserts throughout
(reference flow: Bronze-Ingestion-Customers.py → Silver-Validation-
Customers.py → Silver-DLQ-Customers.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from databricks_data_warehouse_spark.functions.cleaning import clean_string_in_df
from databricks_data_warehouse_spark.pipelines import (
    DomainRule,
    TypeRule,
    bronze_ingest,
    recover_dlq,
    validate_to_silver,
)
from databricks_data_warehouse_spark.sources.tables import ManagedTable

RAW_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("Type", StringType(), True),
        StructField("Status", StringType(), True),
        StructField("CreatedOn", StringType(), True),
    ]
)

RAW_ROWS = [
    (1, "affiliate", "regular", "2024-01-05 10:00:00"),
    (2, "individual", "VIP", "2024-01-06 11:00:00"),
    (3, " AFFILIATE ", "vip", "2024-02-01 09:00:00"),  # recoverable via cleanse
    (4, "broker", "regular", "2024-02-02 09:00:00"),  # dead: bad domain
    (5, "individual", "regular", "2024-02-03 09:00:00"),
    (5, "individual", "regular", "2024-02-03 09:00:00"),  # duplicate id
]


def _cleanse(df):
    df = clean_string_in_df(df, "type")
    df = df.withColumn("type", F.lower(F.col("type")))
    df = clean_string_in_df(df, "status")
    return df.withColumn(
        "status",
        F.when(F.length(F.col("status")) == 3, F.upper(F.col("status"))).otherwise(
            F.lower(F.col("status"))
        ),
    )


@pytest.fixture()
def pipeline_run(spark, tmp_path):
    raw = spark.createDataFrame(RAW_ROWS, RAW_SCHEMA).withColumn(
        "CreatedOn", F.col("CreatedOn").cast("timestamp")
    )
    bronze = bronze_ingest(
        spark,
        raw,
        str(tmp_path / "bronze_customers"),
        "bronze_customers",
        timestamp_column="CreatedOn",
    )
    silver = ManagedTable(
        spark,
        "silver_customers",
        str(tmp_path / "silver_customers"),
        partition_columns=["year", "month"],
    )
    counts = validate_to_silver(
        spark,
        bronze.read(),
        silver,
        str(tmp_path / "dlq_customers"),
        "dlq_customers",
        id_columns=["id"],
        ingestion_timestamp="bronze_ingestion_time",
        rename_map={"Type": "type", "Status": "status", "CreatedOn": "created_on"},
        rules=[
            TypeRule("id", "numeric"),
            DomainRule("type", ["affiliate", "individual"]),
            DomainRule("status", ["regular", "VIP"]),
            TypeRule("created_on", "timestamp"),
        ],
        silver_columns=["id", "type", "status", "created_on", "year", "month"],
        preserve_unclean=["type", "status"],
    )
    dlq = ManagedTable(spark, "dlq_customers", str(tmp_path / "dlq_customers"))
    return bronze, silver, dlq, counts


def test_bronze_ingest_idempotent(spark, tmp_path):
    raw = spark.createDataFrame(RAW_ROWS, RAW_SCHEMA).withColumn(
        "CreatedOn", F.col("CreatedOn").cast("timestamp")
    )
    loc = str(tmp_path / "b")
    t = bronze_ingest(spark, raw, loc, "b", timestamp_column="CreatedOn")
    assert t.read().count() == 6
    # window_id disambiguates exact-duplicate rows (W1)
    dup = t.read().filter(F.col("id") == 5).select("window_id").collect()
    assert sorted(r.window_id for r in dup) == [1, 2]
    # re-run: all-column merge inserts nothing
    t2 = bronze_ingest(spark, raw, loc, "b", timestamp_column="CreatedOn")
    assert t2.read().count() == 6
    # partition columns derived from the timestamp
    assert set(t.read().select("year", "month").distinct().collect()) == {
        (2024, 1),
        (2024, 2),
    }


def test_silver_split_conservation(pipeline_run):
    bronze, silver, dlq, counts = pipeline_run
    assert counts == {"batch": 6, "valid": 2, "invalid": 4}
    assert silver.read().count() == 2
    assert {r.id for r in silver.read().collect()} == {1, 2}
    dlq_rows = {
        (r.id, r.validation_status, r.is_duplicate) for r in dlq.read().collect()
    }
    # 3: domain-invalid (dirty strings); 4: dead domain; 5 (x2): duplicates
    assert dlq_rows == {
        (3, "invalid", False),
        (4, "invalid", False),
        (5, "invalid", True),
        (5, "invalid", True),
    }
    # originals preserved for the cleansing stage
    assert "unclean_type" in dlq.read().columns


def test_dlq_recovery_promotes_cleanable_rows(spark, pipeline_run):
    bronze, silver, dlq, _ = pipeline_run
    result = recover_dlq(
        spark,
        dlq,
        silver,
        bronze,
        id_columns=["id"],
        silver_columns=["id", "type", "status", "created_on", "year", "month"],
        dlq_key_columns=["id", "window_id", "unclean_type", "unclean_status"],
        cleanse=_cleanse,
        rules=[
            TypeRule("id", "numeric"),
            DomainRule("type", ["affiliate", "individual"]),
            DomainRule("status", ["regular", "VIP"]),
            TypeRule("created_on", "timestamp"),
        ],
    )
    # id=3 recovered (" AFFILIATE "/"vip" cleanses to affiliate/VIP);
    # id=4 dead domain; id=5 rows are duplicates and never recover
    assert result["silver"] == 3
    assert result["still_invalid"] == 3
    assert {r.id for r in silver.read().collect()} == {1, 2, 3}
    recovered = dlq.read().filter(F.col("id") == 3).collect()
    assert all(r.validation_status == "valid" for r in recovered)
    assert all(r.silver_ingestion_status == "ingested" for r in recovered)


def test_recovery_is_rerunnable(spark, pipeline_run):
    bronze, silver, dlq, _ = pipeline_run
    kwargs = dict(
        id_columns=["id"],
        silver_columns=["id", "type", "status", "created_on", "year", "month"],
        dlq_key_columns=["id", "window_id", "unclean_type", "unclean_status"],
        cleanse=_cleanse,
        rules=[
            TypeRule("id", "numeric"),
            DomainRule("type", ["affiliate", "individual"]),
            DomainRule("status", ["regular", "VIP"]),
            TypeRule("created_on", "timestamp"),
        ],
    )
    first = recover_dlq(spark, dlq, silver, bronze, **kwargs)
    second = recover_dlq(spark, dlq, silver, bronze, **kwargs)
    assert first["silver"] == second["silver"] == 3
    assert first["still_invalid"] == second["still_invalid"] == 3


def test_gold_build_upsert_and_conservation(spark, tmp_path):
    from databricks_data_warehouse_spark.pipelines.gold import build_gold

    silver = spark.createDataFrame(
        [(1, "A", 2024, 1), (2, "A", 2024, 1), (3, "B", 2024, 2)],
        "id long, seg string, year int, month int",
    )
    gold_df = silver.groupBy("seg", "year", "month").agg(
        F.count("*").alias("n")
    )
    t = build_gold(
        spark, gold_df, str(tmp_path / "g"), "g",
        key_columns=["seg", "year", "month"], count_column="n",
        expected_total=3, partition_columns=["year", "month"],
    )
    assert {(r.seg, r.n) for r in t.read().collect()} == {("A", 2), ("B", 1)}
    # refresh with updated counts for one group + a new group
    silver2 = silver.union(
        spark.createDataFrame(
            [(4, "A", 2024, 1), (5, "C", 2024, 3)],
            "id long, seg string, year int, month int",
        )
    )
    gold2 = silver2.groupBy("seg", "year", "month").agg(F.count("*").alias("n"))
    build_gold(
        spark, gold2, str(tmp_path / "g"), "g",
        key_columns=["seg", "year", "month"], count_column="n",
        expected_total=5, partition_columns=["year", "month"],
    )
    assert {(r.seg, r.n) for r in t.read().collect()} == {
        ("A", 3), ("B", 1), ("C", 1),
    }
    # wrong expected total -> conservation assert fires
    with pytest.raises(AssertionError, match="conservation"):
        build_gold(
            spark, gold2, str(tmp_path / "g2"), "g2",
            key_columns=["seg", "year", "month"], count_column="n",
            expected_total=99, partition_columns=["year", "month"],
        )


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    """Folding two disjoint batches incrementally equals aggregating the
    union in one pass — and refreshing one hour leaves other days'
    partitions untouched."""
    from databricks_data_warehouse_spark.pipelines.rollup import (
        refresh_hourly_rollup,
        rollup_as_view,
    )
    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    def batch(rows):
        return spark.createDataFrame(
            rows, "ts string, event_type string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b1 = batch([
        ("2024-01-01 10:05:00", "click", 1.50),
        ("2024-01-01 10:40:00", "click", 2.25),
        ("2024-01-01 11:10:00", "view", 0.75),
        ("2024-01-02 09:00:00", "click", 4.00),
    ])
    b2 = batch([
        ("2024-01-01 10:59:00", "click", 1.00),   # same hour as b1 rows
        ("2024-01-03 08:30:00", "view", 3.10),    # brand-new day
    ])
    t = ManagedTable(
        spark, "rollup", str(tmp_path / "rollup"), partition_columns=["bucket_date"]
    )
    refresh_hourly_rollup(spark, b1, t)
    day2_before = t._read_manifest(t.current_version())['["2024-01-02"]']
    refresh_hourly_rollup(spark, b2, t)
    # untouched day's partition entry is carried over, not rewritten
    assert t._read_manifest(t.current_version())['["2024-01-02"]'] == day2_before

    got = {
        (str(r.window_start), r.event_type): (r.event_count, r.sum_value)
        for r in rollup_as_view(t).collect()
    }
    full = (
        b1.unionByName(b2)
        .withColumn("window_start", F.date_trunc("hour", F.col("ts")))
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    want = {
        (str(r.window_start), r.event_type): (r.n, r.s) for r in full.collect()
    }
    assert got == want


@pytest.mark.slow
def test_full_medallion_flow_on_real_orders(spark, tmp_path):
    """The reference's complete flow over the real testdata orders table:
    bronze ingest -> silver validation with domain + FK rules -> DLQ,
    conservation holding at every stage (sf0.001: 1500 orders)."""
    from databricks_data_warehouse_spark.queries._util import load

    sf = "/root/testdata/sf0.001"
    orders_raw = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    customers = load(spark, sf, "customer").select("c_custkey")
    bronze = bronze_ingest(
        spark,
        orders_raw,
        str(tmp_path / "bronze_orders"),
        "bronze_orders",
        timestamp_column="o_orderdate",
        dedup_columns=["o_orderkey"],
    )
    n_bronze = bronze.read().count()
    assert n_bronze == 1500

    from databricks_data_warehouse_spark.pipelines import FkRule

    silver = ManagedTable(
        spark,
        "silver_orders",
        str(tmp_path / "silver_orders"),
        partition_columns=["year", "month"],
    )
    counts = validate_to_silver(
        spark,
        bronze.read(),
        silver,
        str(tmp_path / "dlq_orders"),
        "dlq_orders",
        id_columns=["order_id"],
        ingestion_timestamp="bronze_ingestion_time",
        rename_map={"o_orderkey": "order_id"},
        rules=[DomainRule("o_orderstatus", ["O", "F"])],
        fk_rules=[FkRule("o_custkey", customers, "c_custkey")],
        silver_columns=["order_id", "o_custkey", "o_orderstatus",
                        "o_orderdate", "year", "month"],
    )
    assert counts["batch"] == n_bronze
    assert counts["valid"] + counts["invalid"] == n_bronze
    # P-status orders are the invalid ones (FKs are all satisfied)
    n_p = orders_raw.filter(F.col("o_orderstatus") == "P").count()
    assert counts["invalid"] == n_p
    assert silver.read().count() == counts["valid"]
    # re-run the whole validation: silver merge is idempotent on ids
    validate_to_silver(
        spark,
        bronze.read(),
        silver,
        str(tmp_path / "dlq_orders"),
        "dlq_orders",
        id_columns=["order_id"],
        ingestion_timestamp="bronze_ingestion_time",
        rename_map={"o_orderkey": "order_id"},
        rules=[DomainRule("o_orderstatus", ["O", "F"])],
        fk_rules=[FkRule("o_custkey", customers, "c_custkey")],
        silver_columns=["order_id", "o_custkey", "o_orderstatus",
                        "o_orderdate", "year", "month"],
    )
    assert silver.read().count() == counts["valid"]


def test_training_corpus_build_conserves_and_is_idempotent(spark, tmp_path):
    from databricks_data_warehouse_spark.pipelines.corpus import build_training_corpus

    sf = "/root/testdata/sf0.001"
    loc = str(tmp_path / "corpus")
    table, counts = build_training_corpus(spark, sf, loc)
    assert counts["rejected"] + counts["dup_dropped"] + counts["final"] == counts["docs"]
    assert counts["final"] > 0
    out = table.read()
    # every row landed in a real split partition
    assert set(r["split"] for r in out.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }
    # re-run: pure function of the input -> identical content
    table2, counts2 = build_training_corpus(spark, sf, loc)
    assert counts2 == counts
    a = sorted(r["doc_id"] for r in table2.read().collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b


def test_bronze_keyed_dedup_rerun_is_idempotent(spark, tmp_path):
    """Round-12 review 5: keyed dedup ordered only by the key columns,
    so window_id among distinct same-key rows depended on input
    partitioning — re-ingesting the identical batch could flip ids,
    defeat the all-column anti-join, and duplicate the batch."""
    import datetime

    from databricks_data_warehouse_spark.pipelines.bronze import (
        bronze_ingest,
    )

    ts = datetime.datetime(2024, 3, 1)
    rows = [(1, "alpha", ts), (1, "beta", ts)]
    loc = str(tmp_path / "bk")
    df1 = spark.createDataFrame(rows, "id long, s string, ts timestamp")
    t = bronze_ingest(spark, df1, loc, "bk", "ts", dedup_columns=["id"])
    assert t.read().count() == 2
    # identical batch, adversarial partitioning/order
    df2 = spark.createDataFrame(
        list(reversed(rows)), "id long, s string, ts timestamp"
    ).repartition(7)
    bronze_ingest(spark, df2, loc, "bk", "ts", dedup_columns=["id"])
    assert t.read().count() == 2  # re-run ingested NOTHING


def test_gold_null_group_key_folds_and_reconciles(spark, tmp_path):
    """Round-12 review 5: a NULL group key (legal GROUP BY output) used
    to fail the post-merge check AFTER committing, and a re-run then
    appended a duplicate NULL-key row — conservation violated."""
    from databricks_data_warehouse_spark.pipelines.gold import build_gold

    gold_df = spark.createDataFrame(
        [("x", 2), (None, 3)], "city string, n long"
    )
    loc = str(tmp_path / "gn")
    t = build_gold(spark, gold_df, loc, "gn", ["city"], "n", 5)
    assert t.read().count() == 2
    # re-run with the same aggregate: folds, never duplicates
    t = build_gold(spark, gold_df, loc, "gn", ["city"], "n", 5)
    rows = sorted(
        ((r["city"], r["n"]) for r in t.read().collect()),
        key=lambda x: (x[0] is None, x[0] or ""),
    )
    assert rows == [("x", 2), (None, 3)]
