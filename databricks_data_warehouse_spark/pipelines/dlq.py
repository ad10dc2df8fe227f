"""DLQ recovery pipeline (C8): cleanse → re-validate → promote.

Reference semantics (Silver-DLQ-Customers.py:30-116, same shape ×5):
1. reset ``validation_status`` / ``invalid_columns`` /
   ``silver_ingestion_status`` on the whole DLQ table;
2. re-label ingestion status vs the current silver table (C4);
3. re-invalidate ``is_duplicate`` carriers (duplicates never recover);
4. cleanse (caller-provided chain: C1 ``clean_string_in_df`` + H2
   domain normalization — lower/upper/length branches);
5. re-validate columns (C2 rules);
6. remainder → valid; valid rows projected to silver columns, stamped
   ``silver_ingestion_time`` and MERGE-inserted into silver
   (all-column idempotent condition);
7. ingestion status refreshed vs the post-merge silver;
8. DLQ rows updated in place via MERGE update keyed on the DLQ row
   identity (id + original ``unclean_*`` values + ``window_id``), so
   recovered rows show ``ingested``/``valid`` while dead rows stay
   ``invalid``;
9. conservation: silver + still-invalid DLQ == bronze.

Scale: every step is a column projection, semi-join or partition-scoped
merge — recovery cost tracks the DLQ size (small by construction), not
the silver table.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.validation import check_ingestion_status, validate_column
from ..sources.tables import ManagedTable
from .silver import DomainRule, TypeRule


def recover_dlq(
    spark: SparkSession,
    dlq_table: ManagedTable,
    silver_table: ManagedTable,
    bronze_table: ManagedTable,
    id_columns: Sequence[str],
    silver_columns: Sequence[str],
    dlq_key_columns: Sequence[str],
    cleanse: Callable[[DataFrame], DataFrame] | None = None,
    rules: Sequence[TypeRule | DomainRule] = (),
) -> dict[str, int]:
    """Run one recovery pass; returns the conservation counts."""
    dlq = dlq_table.read()
    id_cols_str = ", ".join(id_columns)

    # 1. reset statuses
    df = (
        dlq.withColumn("validation_status", F.lit(""))
        .withColumn("invalid_columns", F.array().cast("array<string>"))
        .withColumn("silver_ingestion_status", F.lit(""))
    )
    # 2. re-label vs current silver
    df = check_ingestion_status(df, silver_table.read(), id_columns)
    # 3. duplicates never recover
    dup = F.col("is_duplicate")
    df = df.withColumn(
        "validation_status",
        F.when(dup, F.lit("invalid")).otherwise(F.col("validation_status")),
    ).withColumn(
        "invalid_columns",
        F.when(
            dup, F.array(F.concat_ws(", ", F.lit(id_cols_str), F.col("invalid_columns")))
        ).otherwise(F.col("invalid_columns")),
    )
    # 4. cleanse
    if cleanse is not None:
        df = cleanse(df)
    # 5. re-validate
    for rule in rules:
        if isinstance(rule, TypeRule):
            df = validate_column(df, rule.column, rule.datatype)
        else:
            df = validate_column(
                df, rule.column, "string", accepted_values=list(rule.accepted_values)
            )
    # 6. promote valid rows
    df = df.withColumn(
        "validation_status",
        F.when(F.col("validation_status") == "", F.lit("valid")).otherwise(
            F.col("validation_status")
        ),
    ).cache()
    try:
        promoted = (
            df.filter(F.col("validation_status") == "valid")
            .select(*silver_columns)
            .withColumn("silver_ingestion_time", F.current_timestamp())
        )
        silver_table.merge_insert_only(promoted)
        # 7. refresh ingestion labels vs post-merge silver
        df_refreshed = check_ingestion_status(
            df.drop("silver_ingestion_status"), silver_table.read(), id_columns
        )
        # 8. update DLQ rows in place (all columns, keyed on row identity)
        dlq_table.merge_update(df_refreshed, key_columns=list(dlq_key_columns))
        # 9. conservation
        n_bronze = bronze_table.read().count()
        n_silver = silver_table.read().count()
        n_dead = (
            dlq_table.read().filter(F.col("validation_status") == "invalid").count()
        )
        if n_silver + n_dead != n_bronze:
            raise AssertionError(
                f"conservation violated after recovery: silver {n_silver} + "
                f"still-invalid DLQ {n_dead} != bronze {n_bronze}"
            )
        return {"bronze": n_bronze, "silver": n_silver, "still_invalid": n_dead}
    finally:
        df.unpersist()
