"""Shared row-level operators (the reference's CommonFunctions surface).

Parity functions re-implemented Spark-first:

- :func:`clean_string_in_df` — C1, string cleansing.
- :func:`validate_column` — C2, type/domain validation.
- :func:`validate_relationship` — C3, FK orphan marking (anti-join, no collect).
- :func:`check_ingestion_status` — C4, ingested/not_ingested labeling (semi-join, no UDF).
- :func:`identify_duplicates` — C5, windowed duplicate marking.
- :func:`condition_builder`, :func:`build_insert_columns_dict` — S8/S9 merge helpers.
"""

from databricks_data_warehouse_spark.functions.cleaning import clean_string_in_df
from databricks_data_warehouse_spark.functions.merge_helpers import (
    build_insert_columns_dict,
    condition_builder,
)
from databricks_data_warehouse_spark.functions.validation import (
    check_ingestion_status,
    identify_duplicates,
    validate_column,
    validate_relationship,
)

__all__ = [
    "clean_string_in_df",
    "validate_column",
    "validate_relationship",
    "check_ingestion_status",
    "identify_duplicates",
    "condition_builder",
    "build_insert_columns_dict",
]
