"""Port of reference fixtures TestCommonFunctions.py:65-302.

Covers the quirky observable behaviors SURVEY.md §7 flags:
- ``invalid_columns`` accumulates as a 1-element array ``["name, id"]``.
- numeric/timestamp modes must flag malformed values (NOT crash under
  Spark 4 ANSI mode — regression test for the round-1 try_cast bug).
- validate_relationship keeps the input column order.
- identify_duplicates full ingested/not_ingested matrix, 1- and 2-col keys.
"""

import pytest
from pyspark.testing import assertDataFrameEqual
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.functions.validation import (
    check_ingestion_status,
    identify_duplicates,
    validate_column,
    validate_relationship,
)

VALIDATE_SCHEMA = StructType(
    [
        StructField("id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("correct_name", StringType(), True),
        StructField("age", IntegerType(), True),
        StructField("date", StringType(), True),
        StructField("validation_status", StringType(), True),
        StructField("invalid_columns", ArrayType(StringType()), True),
    ]
)


def _validate_df(spark):
    data = [
        ("1", "Alice", "Alice", 25, "5", "", []),
        ("2", "Bob", "Bob", 30, "test", "", []),
        ("a", "Chartie", "Charlie", 35, "2013-06-15T18:14:57.000+0000", "", []),
    ]
    return spark.createDataFrame(data, VALIDATE_SCHEMA)


def test_validate_numeric(spark):
    out = validate_column(_validate_df(spark), "id", "numeric")
    expected = spark.createDataFrame(
        [
            ("1", "Alice", "Alice", 25, "5", "", []),
            ("2", "Bob", "Bob", 30, "test", "", []),
            ("a", "Chartie", "Charlie", 35, "2013-06-15T18:14:57.000+0000", "invalid", ["id"]),
        ],
        VALIDATE_SCHEMA,
    )
    assertDataFrameEqual(out, expected)


def test_validate_string_accumulates_quirk(spark):
    """Second validation appends into the SAME 1-element array: ["name, id"]."""
    numeric_df = validate_column(_validate_df(spark), "id", "numeric")
    expected = spark.createDataFrame(
        [
            ("1", "Alice", "Alice", 25, "5", "", []),
            ("2", "Bob", "Bob", 30, "test", "", []),
            ("a", "Chartie", "Charlie", 35, "2013-06-15T18:14:57.000+0000", "invalid", ["name, id"]),
        ],
        VALIDATE_SCHEMA,
    )
    by_comparison = validate_column(
        numeric_df, column_to_validate="name", datatype="string", comparison_column="correct_name"
    )
    assertDataFrameEqual(by_comparison, expected)
    by_accepted = validate_column(
        numeric_df,
        column_to_validate="name",
        datatype="string",
        accepted_values=["Alice", "Bob", "Charlie"],
    )
    assertDataFrameEqual(by_accepted, expected)


def test_validate_timestamp_ansi_safe(spark):
    """Malformed timestamp strings are flagged, not a CAST_INVALID_INPUT crash."""
    out = validate_column(_validate_df(spark), column_to_validate="date", datatype="timestamp")
    expected = spark.createDataFrame(
        [
            ("1", "Alice", "Alice", 25, "5", "invalid", ["date"]),
            ("2", "Bob", "Bob", 30, "test", "invalid", ["date"]),
            ("a", "Chartie", "Charlie", 35, "2013-06-15T18:14:57.000+0000", "", []),
        ],
        VALIDATE_SCHEMA,
    )
    assertDataFrameEqual(out, expected)


def test_validate_bad_datatype_raises(spark):
    with pytest.raises(ValueError):
        validate_column(_validate_df(spark), "id", "decimal")
    with pytest.raises(ValueError):
        validate_column(_validate_df(spark), "id", "string")  # needs comparison/accepted


REL_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("value", StringType(), True),
        StructField("validation_status", StringType(), True),
        StructField("invalid_relationship", ArrayType(StringType()), True),
    ]
)


def test_validate_relationship(spark):
    df1 = spark.createDataFrame(
        [(1, "A", "", []), (2, "B", "", []), (3, "C", "", []), (4, "D", "", [])],
        REL_SCHEMA,
    )
    df2 = spark.createDataFrame(
        [(1, "X", "", []), (2, "Y", "", []), (3, "Z", "", [])], REL_SCHEMA
    )
    expected = spark.createDataFrame(
        [
            (1, "A", "", []),
            (2, "B", "", []),
            (3, "C", "", []),
            (4, "D", "invalid", ["id"]),
        ],
        REL_SCHEMA,
    )
    out = validate_relationship(df1, "id", df2, "id")
    # column order must be preserved (reference keeps input order)
    assert out.columns == df1.columns
    assertDataFrameEqual(out, expected)


INGEST_SCHEMA = StructType(
    [
        StructField("id1", IntegerType(), True),
        StructField("id2", IntegerType(), True),
        StructField("name", StringType(), True),
        StructField("age", IntegerType(), True),
        StructField("city", StringType(), True),
        StructField("ingestion_timestamp", StringType(), True),
        StructField("validation_status", StringType(), True),
        StructField("invalid_columns", ArrayType(StringType()), True),
        StructField("silver_ingestion_status", StringType(), True),
    ]
)


def test_check_ingestion_status(spark):
    data_to_ingest = [
        (1, 1, "John", 22, "New York", "2024-02-13 12:00:00", "", [], ""),
        (2, 1, "Doe", 28, "Seattle", "2024-02-14 12:01:00", "", [], ""),
        (3, 1, "Smith", 22, "San Francisco", "2024-02-14 12:02:00", "", [], ""),
        (1, 1, "John", 22, "New York", "2024-02-14 12:03:00", "", [], ""),
        (1, 2, "Tony", 22, "New York", "2024-02-14 12:00:00", "", [], ""),
        (4, 1, "John", 22, "New York", "2024-02-14 12:03:00", "invalid", ["id1"], ""),
    ]
    ingested = [
        (1, 1, "John", 22, "New York", "2024-02-13 12:00:00", "", [], ""),
        (2, 1, "Doe", 28, "Seattle", "2024-02-14 12:01:00", "", [], ""),
    ]
    test_df = spark.createDataFrame(data_to_ingest, INGEST_SCHEMA)
    ingested_df = spark.createDataFrame(ingested, INGEST_SCHEMA)

    def expect(statuses):
        rows = [
            r[:-1] + (s,) for r, s in zip(data_to_ingest, statuses)
        ]
        return spark.createDataFrame(rows, INGEST_SCHEMA)

    out1 = check_ingestion_status(test_df, ingested_df, ["id1"], "silver_ingestion_status")
    assertDataFrameEqual(
        out1,
        expect(["ingested", "ingested", "not_ingested", "ingested", "ingested", "not_ingested"]),
    )
    out2 = check_ingestion_status(
        test_df, ingested_df, ["id1", "id2"], "silver_ingestion_status"
    )
    assertDataFrameEqual(
        out2,
        expect(["ingested", "ingested", "not_ingested", "ingested", "not_ingested", "not_ingested"]),
    )


DUP_SCHEMA = StructType(
    [
        StructField("id1", IntegerType(), True),
        StructField("id2", IntegerType(), True),
        StructField("ingestion_timestamp", StringType(), True),
        StructField("validation_status", StringType(), True),
        StructField("invalid_columns", ArrayType(StringType()), True),
        StructField("silver_ingestion_status", StringType(), True),
        StructField("is_duplicate", BooleanType(), True),
    ]
)


def _dup_df(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], None if r[6] == "" else r[6] == "True") for r in rows],
        DUP_SCHEMA,
    )


def test_identify_duplicates_1_col(spark):
    test_rows = [
        (1, 1, "2024-01-13 12:00:00", "", [], "ingested", ""),
        (2, 1, "2024-02-14 12:01:00", "", [], "not_ingested", ""),
        (3, 1, "2024-02-14 12:02:00", "", [], "not_ingested", ""),
        (1, 1, "2024-02-14 12:03:00", "", [], "ingested", ""),
        (1, 2, "2024-02-14 12:00:00", "", [], "ingested", ""),
        (4, 1, "2024-02-14 12:03:00", "invalid", ["name"], "not_ingested", ""),
        (2, 1, "2024-02-14 12:01:00", "", [], "not_ingested", ""),
    ]
    expected_rows = [
        (1, 1, "2024-01-13 12:00:00", "", [], "ingested", "False"),
        (2, 1, "2024-02-14 12:01:00", "invalid", ["id1"], "not_ingested", "True"),
        (3, 1, "2024-02-14 12:02:00", "", [], "not_ingested", "False"),
        (1, 1, "2024-02-14 12:03:00", "invalid", ["id1"], "ingested", "True"),
        (1, 2, "2024-02-14 12:00:00", "invalid", ["id1"], "ingested", "True"),
        (4, 1, "2024-02-14 12:03:00", "invalid", ["name"], "not_ingested", "False"),
        (2, 1, "2024-02-14 12:01:00", "invalid", ["id1"], "not_ingested", "True"),
    ]
    out = identify_duplicates(
        validation_df=_dup_df(spark, test_rows),
        id_columns=["id1"],
        ingestion_timestamp="ingestion_timestamp",
        ingestion_status_col="silver_ingestion_status",
    )
    assertDataFrameEqual(out, _dup_df(spark, expected_rows))


def test_identify_duplicates_2_col(spark):
    test_rows = [
        (1, 1, "2024-02-13 12:00:00", "", [], "ingested", ""),
        (2, 1, "2024-02-14 12:01:00", "", [], "not_ingested", ""),
        (3, 1, "2024-02-14 12:02:00", "", [], "not_ingested", ""),
        (1, 1, "2024-02-14 12:03:00", "", [], "ingested", ""),
        (1, 2, "2024-02-14 12:00:00", "", [], "ingested", ""),
        (4, 1, "2024-02-14 12:03:00", "invalid", ["name"], "not_ingested", ""),
        (2, 1, "2024-02-14 12:01:00", "", [], "not_ingested", ""),
    ]
    expected_rows = [
        (1, 1, "2024-02-13 12:00:00", "", [], "ingested", "False"),
        (2, 1, "2024-02-14 12:01:00", "invalid", ["id1, id2"], "not_ingested", "True"),
        (3, 1, "2024-02-14 12:02:00", "", [], "not_ingested", "False"),
        (1, 1, "2024-02-14 12:03:00", "invalid", ["id1, id2"], "ingested", "True"),
        (1, 2, "2024-02-14 12:00:00", "", [], "ingested", "False"),
        (4, 1, "2024-02-14 12:03:00", "invalid", ["name"], "not_ingested", "False"),
        (2, 1, "2024-02-14 12:01:00", "invalid", ["id1, id2"], "not_ingested", "True"),
    ]
    out = identify_duplicates(
        validation_df=_dup_df(spark, test_rows),
        id_columns=["id1", "id2"],
        ingestion_timestamp="ingestion_timestamp",
        ingestion_status_col="silver_ingestion_status",
    )
    assertDataFrameEqual(out, _dup_df(spark, expected_rows))


def test_validate_string_comparison_mode(spark):
    """String + comparison_column (TestCommonFunctions.py:85-96): invalid
    when empty or differing from the comparison column; a NULL value makes
    the predicate NULL and the row stays untouched (quirk preserved)."""
    df = spark.createDataFrame(
        [
            ("1", "ana", "ana", 30, "2020-01-01", "", []),
            ("2", "bob", "bob2", 30, "2020-01-01", "", []),
            ("3", "", "carl", 30, "2020-01-01", "", []),
            ("4", None, "dora", 30, "2020-01-01", "", []),
        ],
        VALIDATE_SCHEMA,
    )
    out = validate_column(df, "name", "string", comparison_column="correct_name")
    got = {r.id: (r.validation_status, list(r.invalid_columns)) for r in out.collect()}
    assert got["1"] == ("", [])
    assert got["2"] == ("invalid", ["name"])
    assert got["3"] == ("invalid", ["name"])
    # NULL falls through the when() -> untouched (reference behavior)
    assert got["4"] == ("", [])


def test_validate_string_requires_mode(spark):
    df = spark.createDataFrame([("1", "a", "a", 1, "x", "", [])], VALIDATE_SCHEMA)
    with pytest.raises(ValueError, match="comparison_column or accepted_values"):
        validate_column(df, "name", "string")
