"""Catalog layer: database DDL (S10) + testdata table registration.

Scans are plain ``spark.read.parquet`` → full predicate pushdown +
column pruning + vectorized reader for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..queries._util import load

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_database(spark: SparkSession, name: str) -> None:
    """S10: CREATE DATABASE IF NOT EXISTS + set as current
    (Bronze-Ingestion-Customers.py:16-17 — every reference notebook
    opens with this pair)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    spark.catalog.setCurrentDatabase(name)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every synthetic table as a DataFrame keyed by name (via the
    type-normalizing loader — events.ts nanos handling included)."""
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load + register each table as a temp view (for spark.sql queries)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
