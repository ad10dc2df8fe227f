"""Port of reference fixtures TestCommonFunctions.py:13-31."""

from databricks_data_warehouse_spark.functions.merge_helpers import (
    build_insert_columns_dict,
    condition_builder,
)


def test_condition_builder_skips_ingestion_time():
    condition = condition_builder(
        ["OrderId", "ItemId", "Quantity", "WindowId", "bronze_ingestion_time"],
        "ingested_data",
        "updates",
    )
    expected = (
        "ingested_data.OrderId = updates.OrderId AND "
        "ingested_data.ItemId = updates.ItemId AND "
        "ingested_data.Quantity = updates.Quantity AND "
        "ingested_data.WindowId = updates.WindowId"
    )
    assert condition == expected


def test_condition_builder_substring_match_quirk():
    # the reference skips any column whose NAME CONTAINS ingestion_time
    condition = condition_builder(["a", "my_ingestion_time_utc"], "t", "s")
    assert condition == "t.a = s.a"


def test_build_insert_columns_dict():
    assert build_insert_columns_dict(["column1", "column2", "column3"], "updates") == {
        "column1": "updates.column1",
        "column2": "updates.column2",
        "column3": "updates.column3",
    }
