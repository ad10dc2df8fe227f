"""Operator-parity queries: the CommonFunctions composite operators
(C1-C5, SURVEY.md §2.J) exercised over the synthetic tables so the
driver's DuckDB oracle can hash-check them on real data.

Each function stages realistic inputs (derived deterministically from
table columns), runs the library operator, and projects a hash-stable
output: scalar columns only, arrays joined to strings, and — where the
operator's row_number can tie (identify_duplicates) — aggregates that
are invariant to tie-breaking order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_string_in_df
from ..functions.validation import (
    check_ingestion_status,
    identify_duplicates,
    validate_column,
    validate_relationship,
)
from ..pipelines.silver import DomainRule, FkRule, validate_batch
from ._util import load


def op_clean_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 over documents.text: default-mode cleanse (tab→space, strip
    non-letters, initcap, collapse whitespace, trim)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return clean_string_in_df(docs, "text", new_column="clean_text").select(
        "doc_id", "clean_text"
    )


def op_clean_string_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 address mode over part names + sizes (keeps digits and the
    between-digits slash)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_size")
    staged = part.withColumn(
        "raw", F.concat_ws(" ", F.col("p_name"), F.lit("#"), F.col("p_size"), F.lit("1/2 /"))
    )
    return clean_string_in_df(staged, "raw", new_column="clean_name", is_address=True).select(
        "p_partkey", "clean_name"
    )


def _events_with_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events staged for validation: mixed-validity payload columns +
    the audit columns every validator requires."""
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .withColumn(
            "payload_num",
            F.when(F.col("event_type") == "error", F.col("event_type")).otherwise(
                F.col("user_id").cast("string")
            ),
        )
        .withColumn(
            "payload_ts",
            F.when(F.col("event_type") == "signup", F.lit("2024-01-01 10:00:00")).otherwise(
                F.col("event_type")
            ),
        )
        .withColumn("validation_status", F.lit(""))
        .withColumn("invalid_columns", F.array().cast("array<string>"))
    )


def op_validate_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 over events: numeric validation on a mixed column ('error' rows
    carry a non-numeric payload), then timestamp validation — exercising
    the accumulate-into-one-element-array quirk on real data."""
    staged = _events_with_audit(spark, sf_dir)
    out = validate_column(staged, "payload_num", "numeric")
    out = validate_column(out, "payload_ts", "timestamp")
    return out.select(
        "event_id",
        "validation_status",
        F.array_join("invalid_columns", ";").alias("invalid_cols"),
    )


def op_validate_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 accepted-values mode: customers outside three known segments are
    flagged (the reference's domain validation, e.g. type ∈ {affiliate,…})."""
    staged = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("validation_status", F.lit(""))
        .withColumn("invalid_columns", F.array().cast("array<string>"))
    )
    out = validate_column(
        staged,
        "c_mktsegment",
        "string",
        accepted_values=["BUILDING", "AUTOMOBILE", "MACHINERY"],
    )
    return out.select(
        "c_custkey",
        "validation_status",
        F.array_join("invalid_columns", ";").alias("invalid_cols"),
    )


def op_validate_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 FK-orphan marking: events.user_id against a restricted parent set
    (non-MACHINERY customers) so real orphans exist."""
    events = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .withColumn("validation_status", F.lit(""))
        .withColumn("invalid_relationship", F.array().cast("array<string>"))
    )
    parents = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") != "MACHINERY")
        .select("c_custkey")
    )
    out = validate_relationship(events, "user_id", parents, "c_custkey")
    return out.select(
        "event_id",
        "validation_status",
        F.array_join("invalid_relationship", ";").alias("invalid_rel"),
    )


def op_ingestion_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 composite-key membership labeling: orders labeled by whether
    (o_custkey, o_orderkey) appears in a deterministic 'already ingested'
    subset (orderkey divisible by 3)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ingested = orders.filter(F.col("o_orderkey") % 3 == 0)
    out = check_ingestion_status(
        orders, ingested, ["o_custkey", "o_orderkey"], "silver_ingestion_status"
    )
    return out.select("o_orderkey", "silver_ingestion_status")


def op_identify_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 duplicate marking over lineitem keyed by l_orderkey (multi-line
    orders are 'duplicates' under that key — a real-data analogue of the
    reference's duplicate matrix).

    Output is aggregated per key: which row of a timestamp tie gets
    row_number 1 is engine-dependent, but the NUMBER of marked rows per
    key is invariant, so the aggregate hash-matches the oracle.
    """
    staged = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .withColumn("validation_status", F.lit(""))
        .withColumn("invalid_columns", F.array().cast("array<string>"))
        .withColumn(
            "silver_ingestion_status",
            F.when(F.col("l_orderkey") % 2 == 0, F.lit("ingested")).otherwise(
                F.lit("not_ingested")
            ),
        )
    )
    out = identify_duplicates(
        staged, ["l_orderkey"], "l_shipdate", "silver_ingestion_status"
    )
    return out.groupBy("l_orderkey").agg(
        F.sum(F.col("is_duplicate").cast("long")).alias("dup_rows"),
        F.sum((F.col("validation_status") == "invalid").cast("long")).alias("invalid_rows"),
        F.count("*").alias("n_rows"),
    )


def op_pipeline_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 composed: the full silver validation chain (rename → audit init
    → ingestion labeling → duplicate marking → domain rule → FK rule →
    final valid marking) over orders, as one pipeline
    (pipelines/silver.py:validate_batch; reference
    Silver-Validation-Orders.py:47-116)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    ingested = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("order_id")
    )
    parents = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") != "MACHINERY")
        .select("c_custkey")
    )
    out = validate_batch(
        orders,
        ingested,
        id_columns=["order_id"],
        ingestion_timestamp="o_orderdate",
        rename_map={"o_orderkey": "order_id"},
        rules=[DomainRule("o_orderstatus", ["O", "F"])],
        fk_rules=[FkRule("o_custkey", parents, "c_custkey")],
    )
    return out.select(
        "order_id",
        "validation_status",
        F.array_join("invalid_columns", ";").alias("invalid_cols"),
        F.array_join("invalid_relationship", ";").alias("invalid_rel"),
        "silver_ingestion_status",
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """ANALYZE-style column profile: one output row per column with null
    count, exact distinct count, and min/max (stringified so any column
    type fits one schema).

    Single pass over the data: all per-column aggregates are computed in
    ONE hash-agg stage (Catalyst evaluates them together), then unpivoted
    driver-free with ``stack``. At 100 TB this is a scan + one partial+
    final agg — same cost profile as `ANALYZE TABLE ... COMPUTE STATISTICS
    FOR COLUMNS` minus the catalog write. Distinct counts are exact here
    (oracle-checkable); swap in approx_count_distinct for the
    constant-memory variant at scale.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def op_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the customer table (every column)."""
    return profile_table(load(spark, sf_dir, "customer"))


def op_pipeline_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLT-style expectations over orders: one warn rule (violations
    kept), one drop rule, one fail rule that passes, plus a NULL-
    evaluating warn rule pinning the DLT NULL→violation convention.
    Output: per-rule metrics with the post-enforcement kept count —
    both the one-pass metric aggregation and the drop filter are
    inside the hash.  (pipelines/expectations.py; modern spelling of
    the reference's validate-and-split, Silver-Validation-Orders.py:
    47-155.)"""
    from ..pipelines.expectations import (
        expect,
        expect_or_drop,
        expect_or_fail,
        run_expectations,
    )

    orders = load(spark, sf_dir, "orders")
    exps = [
        expect("price_over_1000", "o_totalprice > 1000"),
        # NULLIF makes the predicate NULL for 'P' rows → violation
        expect("status_nullable", "NULLIF(o_orderstatus, 'P') IN ('O','F')"),
        expect_or_drop("priority_not_low", "o_orderpriority <> '5-LOW'"),
        expect_or_fail("key_present", "o_orderkey IS NOT NULL"),
    ]
    kept, metrics = run_expectations(orders, exps)
    n_kept = kept.count()
    return metrics.withColumn("rows_kept", F.lit(n_kept).cast("bigint")).orderBy(
        "rule"
    )


def op_pipeline_expectations_oracle() -> str:
    return """
        WITH counts AS (
            SELECT
                COUNT(*) AS rows_total,
                SUM(CASE WHEN NOT COALESCE(o_totalprice > 1000, FALSE)
                    THEN 1 ELSE 0 END) AS v_price,
                SUM(CASE WHEN NOT COALESCE(
                        NULLIF(o_orderstatus, 'P') IN ('O','F'), FALSE)
                    THEN 1 ELSE 0 END) AS v_status,
                SUM(CASE WHEN NOT COALESCE(o_orderpriority <> '5-LOW', FALSE)
                    THEN 1 ELSE 0 END) AS v_priority,
                SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_key,
                SUM(CASE WHEN COALESCE(o_orderpriority <> '5-LOW', FALSE)
                         AND o_orderkey IS NOT NULL
                    THEN 1 ELSE 0 END) AS rows_kept
            FROM orders
        )
        SELECT r.rule, r.action,
               CAST(CASE r.rule
                      WHEN 'price_over_1000' THEN v_price
                      WHEN 'status_nullable' THEN v_status
                      WHEN 'priority_not_low' THEN v_priority
                      ELSE v_key
                    END AS BIGINT) AS violations,
               CAST(rows_total AS BIGINT) AS rows_total,
               CAST(rows_kept AS BIGINT) AS rows_kept
        FROM counts, (
            VALUES ('price_over_1000', 'warn'),
                   ('status_nullable', 'warn'),
                   ('priority_not_low', 'drop'),
                   ('key_present', 'fail')
        ) AS r(rule, action)
        ORDER BY r.rule
    """
