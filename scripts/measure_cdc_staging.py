"""Measure the round-10/11 CDC cost shape for SCALE.md:

1. write-side change staging (`delta.enableChangeDataFeed`): the extra
   commit-time cost of `_stage_change_data`'s one net-count shuffle on
   a rewrite, at 1M and 10M rows;
2. the read-side derived-diff cache: first CDF read of a bucketed
   (>2M-row) non-CDF rewrite pair derives + persists, second read
   serves staged files.

Usage: python scripts/measure_cdc_staging.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.session import get_spark


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:58s} {dt:8.2f} s")
    return out, dt


def main() -> int:
    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="measure-cdc-staging",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    root = tempfile.mkdtemp(prefix="cdc_staging_")
    try:
        for rows in (1_000_000, 10_000_000):
            base = spark.range(0, rows).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("g"),
                (F.col("id") * 7 % 1001 / 10.0).alias("v"),
            )
            up = spark.range(0, rows, 100).select(  # 1% of keys
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("g"),
                F.lit(-1.0).alias("v"),
            )
            for cdf in (False, True):
                name = f"t{rows}_{'cdf' if cdf else 'plain'}"
                t = ManagedTable(spark, name, os.path.join(root, name))
                t.overwrite(base.repartitionByRange(16, "k"))
                if cdf:
                    t.set_properties(
                        {"delta.enableChangeDataFeed": "true"}
                    )
                timed(
                    f"merge_upsert 1% of {rows:,} rows, CDF={'on' if cdf else 'off'}",
                    lambda: t.merge_upsert(up, ["k"]),
                )
            # read-side: derived-diff cache on the NON-CDF pair
            from databricks_data_warehouse_spark.sources import (
                datasource as ds,
            )

            loc = os.path.join(root, f"t{rows}_plain")

            def schema_of():
                from pyspark.sql.types import (
                    LongType, DoubleType, StringType, StructField,
                    StructType, TimestampType,
                )

                tt = ManagedTable(spark, "x", loc)
                sch = tt._load_schema()
                return StructType(
                    list(sch.fields)
                    + [
                        StructField("_change_type", StringType()),
                        StructField("_commit_version", LongType()),
                        StructField("_commit_timestamp", TimestampType()),
                    ]
                )

            def drain():
                r = ds.ManagedTableStreamReader(
                    schema_of(),
                    {"location": loc, "readChangeFeed": "true"},
                )
                parts = r.partitions({"version": 0}, {"version": 1})
                n = 0
                kinds = {}
                for p in parts:
                    kinds[type(p).__name__] = kinds.get(type(p).__name__, 0) + 1
                    for b in r.read(p):
                        n += b.num_rows
                return n, kinds

            (n1, k1), d1 = timed(f"CDF first read (derive+cache), {rows:,}", drain)
            (n2, k2), d2 = timed(f"CDF second read (cached), {rows:,}", drain)
            print(f"  rows {n1} == {n2}: {n1 == n2}; parts first={k1} second={k2}")
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
