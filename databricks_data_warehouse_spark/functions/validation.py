"""Validation / DLQ-labeling operators (reference parity: CommonFunctions.py:123-313).

Behavioral parity notes (ground truth: TestCommonFunctions.py):

- ``validate_column`` overwrites ``invalid_columns`` with a ONE-element
  array whose string accumulates previous content comma-joined
  (``["name, id"]`` — TestCommonFunctions.py:94). Quirk preserved.
- string+comparison mode: a NULL value yields a NULL predicate → the
  row is left untouched (stays valid). numeric/timestamp modes mark
  NULL invalid (cast NULL → isNull). Quirk preserved.
- ``validate_relationship`` / ``check_ingestion_status`` were
  collect-to-driver + broadcast list + Python UDF in the reference
  (CommonFunctions.py:187, 228-237) — that breaks past driver memory.
  REWRITTEN as distributed joins with identical labeling semantics
  (SURVEY.md §2 J4/J5): no driver round-trip, no Python worker, the
  small side is hash-joined (AQE/broadcast picks the strategy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, TimestampType
from pyspark.sql.window import Window

_ALLOWED_DATATYPES = ("string", "numeric", "timestamp")


def _mark_invalid(df: DataFrame, invalid_condition, audit_col: str, audit_value):
    """Set validation_status='invalid' and overwrite the audit column where
    the condition holds; leave other rows untouched (NULL condition falls
    through the ``when`` → row untouched, as in the reference)."""
    return df.withColumn(
        "validation_status",
        F.when(invalid_condition, F.lit("invalid")).otherwise(F.col("validation_status")),
    ).withColumn(
        audit_col,
        F.when(invalid_condition, audit_value).otherwise(F.col(audit_col)),
    )


def validate_column(
    dataframe: DataFrame,
    column_to_validate: str,
    datatype: str,
    comparison_column: str | None = None,
    accepted_values: Sequence | None = None,
) -> DataFrame:
    """Type/domain validation of one column (CommonFunctions.py:123-169).

    - ``string`` + ``comparison_column``: invalid if empty or differs from
      the comparison column (NULL → untouched).
    - ``string`` + ``accepted_values``: invalid if not in the list.
    - ``numeric``: invalid if not castable to long (NULL → invalid).
    - ``timestamp``: invalid if not castable to timestamp (NULL → invalid).

    Requires ``validation_status`` and ``invalid_columns`` columns to exist.
    """
    target = F.col(column_to_validate)
    if datatype == "string":
        if comparison_column is None and accepted_values is None:
            raise ValueError(
                "string validation needs comparison_column or accepted_values"
            )
        if comparison_column:
            invalid = (target == "") | (target != F.col(comparison_column))
        else:
            invalid = ~target.isin(list(accepted_values))
    elif datatype == "numeric":
        # try_cast, not cast: under Spark 4 ANSI mode a plain cast on a
        # malformed value throws CAST_INVALID_INPUT instead of yielding
        # NULL — the operator exists to FLAG bad data, not crash on it.
        invalid = target.try_cast(LongType()).isNull()
    elif datatype == "timestamp":
        invalid = target.try_cast(TimestampType()).isNull()
    else:
        raise ValueError(f"datatype must be one of {_ALLOWED_DATATYPES}")

    # quirk-parity: 1-element array of "col, <previous contents joined>"
    audit_value = F.array(
        F.concat_ws(", ", F.lit(column_to_validate), F.col("invalid_columns"))
    )
    return _mark_invalid(dataframe, invalid, "invalid_columns", audit_value)


def validate_relationship(
    dataframe1: DataFrame,
    id_col_1: str,
    dataframe2: DataFrame,
    id_col_2: str,
) -> DataFrame:
    """FK orphan marking via distributed anti-join semantics
    (rewrite of CommonFunctions.py:174-198; same labeled output).

    A row is invalid iff its ``id_col_1`` is non-NULL and has no match in
    ``distinct(dataframe2.id_col_2)``. NULL child ids are left untouched —
    that mirrors the reference's ``~isin(list)`` NULL fall-through.

    Known divergence (deliberate): when the PARENT key column contains
    NULLs, the reference's ``~isin(list-containing-None)`` yields NULL for
    every unmatched child, silently disabling FK validation for the whole
    table. We filter NULL parents instead, so unmatched children are still
    marked — strictly more correct; documented rather than replicated.

    Scale: the reference collected parent ids to the driver; here the
    distinct parent-key set stays distributed and Catalyst/AQE picks
    broadcast-hash vs shuffled-hash join. Output preserves the input
    column order (the reference keeps it; positional consumers rely on it).
    """
    parents = (
        dataframe2.select(F.col(id_col_2).alias(id_col_1))
        .where(F.col(id_col_1).isNotNull())
        .distinct()
        .withColumn("__fk_match", F.lit(True))
    )
    joined = dataframe1.join(parents, on=id_col_1, how="left")
    invalid = F.col(id_col_1).isNotNull() & F.col("__fk_match").isNull()
    audit_value = F.array(F.concat_ws(", ", F.lit(id_col_1)))
    return _mark_invalid(joined, invalid, "invalid_relationship", audit_value).select(
        *dataframe1.columns
    )


def _with_concat_id(df: DataFrame, id_columns: Sequence[str]) -> DataFrame:
    """Fold (composite) key columns into one string key exactly as the
    reference does (iterative concat_ws("|", ...) starting from "",
    CommonFunctions.py:219-225) — NULL components vanish, so
    (1, NULL) and (1,) collide identically to the reference."""
    out = F.lit("")
    for c in id_columns:
        out = F.concat_ws("|", out, F.col(c))
    return df.withColumn("concat_id", out)


def check_ingestion_status(
    validation_df: DataFrame,
    ingested_df: DataFrame,
    id_columns: Sequence[str],
    ingestion_status_col: str = "silver_ingestion_status",
) -> DataFrame:
    """Label rows 'ingested'/'not_ingested' by (composite) key membership
    in the target table (rewrite of CommonFunctions.py:203-241).

    Scale rewrite: driver collect + broadcast list + Python UDF →
    distributed left join against the distinct ingested-key set
    (semi-join with a kept label). Identical labels, no driver memory
    ceiling, no JVM→Python boundary.
    """
    validation_df = _with_concat_id(validation_df, id_columns)
    ingested_keys = (
        _with_concat_id(ingested_df, id_columns)
        .select("concat_id")
        .distinct()
        .withColumn("__ingested", F.lit(True))
    )
    out = (
        validation_df.join(ingested_keys, on="concat_id", how="left")
        .withColumn(
            ingestion_status_col,
            F.when(F.col("__ingested").isNotNull(), F.lit("ingested")).otherwise(
                F.lit("not_ingested")
            ),
        )
        .drop("concat_id", "__ingested")
    )
    return out


def identify_duplicates(
    validation_df: DataFrame,
    id_columns: Sequence[str],
    ingestion_timestamp: str,
    ingestion_status_col: str = "silver_ingestion_status",
) -> DataFrame:
    """Windowed duplicate marking (parity with CommonFunctions.py:249-313).

    Per id-group (composite keys supported):
    - id **not_ingested** with >1 rows → ALL rows invalid + is_duplicate.
    - id **ingested** with >1 rows → all but the earliest (by ingestion
      timestamp) invalid + is_duplicate; the earliest row untouched.
    - unique ids → untouched.
    Both invalid branches overwrite ``invalid_columns`` with
    ``["id1, id2"]`` (the joined id-column names). A boolean
    ``is_duplicate`` column is added (false where untouched).

    Scale note: the window shuffles by the id columns — the natural key
    distribution. (The reference's Bronze-side all-columns window is a
    different operator; see bronze pipeline.)
    """
    id_cols_str = ", ".join(id_columns)
    w_order = Window.partitionBy(*id_columns).orderBy(F.col(ingestion_timestamp))
    w_count = Window.partitionBy(*id_columns)

    df = (
        validation_df.withColumn("__rn", F.row_number().over(w_order))
        .withColumn("__cnt", F.count("*").over(w_count))
    )

    status = F.col(ingestion_status_col)
    dup_new = (status == "not_ingested") & (F.col("__cnt") > 1)
    dup_ingested = (
        (status == "ingested") & (F.col("__cnt") > 1) & (F.col("__rn") > 1)
    )
    is_dup = dup_new | dup_ingested
    audit_value = F.array(F.concat_ws(", ", F.lit(id_cols_str)))

    df = _mark_invalid(df, is_dup, "invalid_columns", audit_value)
    df = df.withColumn(
        "is_duplicate", F.coalesce(is_dup, F.lit(False)).cast(BooleanType())
    )
    return df.drop("__rn", "__cnt")
