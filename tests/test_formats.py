"""Format round-trips: CSV and JSON preserve values and types when read
back through the explicit schema (never inference)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.formats import read_table, write_table


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [
            (1, "alpha, with comma", 3.5, "2024-01-05 10:00:00"),
            (2, 'quote " inside', -0.25, "2024-06-30 23:59:59"),
            (3, None, 0.0, None),
        ],
        "id long, name string, score double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_preserves_values_and_types(spark, tmp_path, sample, fmt):
    path = str(tmp_path / fmt)
    write_table(sample, path, fmt)
    back = read_table(spark, path, fmt, schema=sample.schema)
    assert back.schema == sample.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_non_self_describing_formats_require_schema(spark, tmp_path, sample):
    path = str(tmp_path / "c")
    write_table(sample, path, "csv")
    with pytest.raises(ValueError, match="not self-describing"):
        read_table(spark, path, "csv")


def test_unknown_format_rejected(spark, tmp_path, sample):
    with pytest.raises(ValueError, match="format must be"):
        write_table(sample, str(tmp_path / "x"), "xml")
