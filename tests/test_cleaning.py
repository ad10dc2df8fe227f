"""Port of reference fixtures TestCommonFunctions.py:36-61 (clean_string_in_df)."""

from pyspark.sql import Row
from pyspark.testing import assertDataFrameEqual

from databricks_data_warehouse_spark.functions.cleaning import clean_string_in_df


def _test_df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, string="  test #   1231phrase 1/2   /"),
            Row(id=2, string="   test!!!! 989   "),
        ]
    )


def test_clean_default_mode(spark):
    out = clean_string_in_df(_test_df(spark), "string")
    expected = spark.createDataFrame(
        [Row(id=1, string="Test Phrase"), Row(id=2, string="Test")]
    )
    assertDataFrameEqual(out, expected)


def test_clean_new_column(spark):
    out = clean_string_in_df(_test_df(spark), column_to_clean="string", new_column="new_col")
    expected = spark.createDataFrame(
        [
            Row(id=1, string="  test #   1231phrase 1/2   /", new_col="Test Phrase"),
            Row(id=2, string="   test!!!! 989   ", new_col="Test"),
        ]
    )
    assertDataFrameEqual(out, expected)


def test_clean_address_mode(spark):
    out = clean_string_in_df(_test_df(spark), column_to_clean="string", is_address=True)
    expected = spark.createDataFrame(
        [Row(id=1, string="Test 1231phrase 1/2"), Row(id=2, string="Test 989")]
    )
    assertDataFrameEqual(out, expected)
