"""Shared helpers for the query layer."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one synthetic table (TESTDATA.md).

    Plain ``spark.read.parquet`` → vectorized reader, predicate pushdown
    and column pruning all apply; callers ``select`` the columns they
    need right away so ReadSchema stays minimal.

    ``events.ts`` is stored as TIMESTAMP(NANOS), which Spark reads as a
    nanosecond long under ``spark.sql.legacy.parquet.nanosAsLong``;
    convert to a microsecond timestamp here (integer div — no double
    round-trip, nanos exceed 2^53).
    """
    if name == "events":
        # set defensively at runtime: the DRIVER's SparkSession (which
        # calls queries() entries) does not carry our session factory's
        # config, and without this flag the nanos read hard-fails with
        # PARQUET_TYPE_ILLEGAL (verified on a bare local session).
        # UTC likewise: event-time windowing/year() interpret TIMESTAMP
        # in session tz, and the DuckDB oracle is tz-free.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # micro-precision parquet (e.g. written by another engine)
            # arrives as TIMESTAMP_NTZ, which event-time watermarking
            # rejects; the values are UTC wall-clock and the session tz
            # is UTC, so the cast is instant-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def rnd(col: Column, decimals: int = 2) -> Column:
    """Cross-engine-deterministic rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Spark's ROUND rounds the *shortest decimal repr* of a double
    (BigDecimal.valueOf) while DuckDB rounds the exact binary value —
    they disagree whenever the shortest repr lands on .xx5 (common for
    exact integer ratios like 179/40). This explicit IEEE expression is
    bit-identical in any engine given identical input.
    """
    scale = 10 ** decimals
    return F.floor(col * scale + F.lit(0.5)) / scale


def rnd_sql(expr: str, decimals: int = 2) -> str:
    """DuckDB twin of :func:`rnd` — keep both in sync."""
    scale = 10 ** decimals
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def cents(col: Column) -> Column:
    """Exact integer representation of a 2-decimal double (money columns
    in the testdata are all 2dp). Integer sums/products are then exact
    and engine-independent — no float-summation-order hazard at all.
    """
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def cents_sql(expr: str) -> str:
    """DuckDB twin of :func:`cents`."""
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"
