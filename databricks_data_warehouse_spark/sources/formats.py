"""Multi-format batch sources/sinks.

The reference reads parquet only (SURVEY.md §2.A: "No JDBC, CSV, JSON,
Kafka, or socket connectors"); Spark provides the rest natively. These
helpers make the non-self-describing formats safe:

- CSV/JSON always round-trip through an EXPLICIT schema — inference is
  both slow at scale (extra full read) and lossy (CSV types, JSON ints
  vs doubles), so it is opt-in, never the default;
- timestamps are written in UTC ISO-8601 (session timezone is UTC);
- readers push filters/projections down exactly like parquet readers
  (CSV/JSON scans still benefit from column pruning on parse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# orc is self-describing like parquet (columnar, embedded schema,
# predicate pushdown via min/max stripes); avro is NOT bundled in
# this Spark build (external spark-avro module) and is rejected
# with the standard unknown-format error rather than stubbed
_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
        )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    if fmt not in ("parquet", "orc") and schema is None:
        raise ValueError(
            f"{fmt} is not self-describing: pass the schema explicitly "
            "(inference costs a second full scan and loses types)"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
