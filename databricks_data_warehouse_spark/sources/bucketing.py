"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
each bucket is sorted, so a later join is a zip of matching buckets —
SortMergeJoin with **no Exchange on either side** (asserted in
tests/test_bucketing.py against the physical plan).

Spark specifics worth knowing (vs e.g. Hive bucketing):
- ``bucketBy`` requires ``saveAsTable`` (a catalog table, not a bare
  path) — the bucket spec lives in the catalog;
- both sides must have the same bucket count (or a divisor) on the
  same key for the exchange to be elided;
- ``spark.sql.sources.bucketing.enabled`` (default true) governs use.
"""

from __future__ import annotations

import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _table_info(spark: SparkSession, table_name: str) -> tuple[str | None, str | None]:
    """(location, table_type) of ``table_name`` from the catalog, or
    (None, None) if the table does not exist. Asking the catalog
    (instead of string-building ``{warehouse}/{name}``) stays correct
    for non-default databases, where Spark stores data under
    ``<db>.db/<tbl>``.

    DESCRIBE EXTENDED output has two sections — the schema rows, then a
    ``# Detailed Table Information`` block. Only the second section is
    scanned, so a data column literally named ``Location`` or ``Type``
    can't shadow the table metadata.
    """
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    except Exception:  # noqa: BLE001 — table absent
        return None, None
    loc: str | None = None
    typ: str | None = None
    in_detail = False
    for r in rows:
        if r.col_name.startswith("# Detailed Table"):
            in_detail = True
            continue
        if not in_detail:
            continue
        if r.col_name == "Location":
            loc = urlparse(r.data_type).path
        elif r.col_name == "Type":
            typ = r.data_type
    return loc, typ


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a parquet catalog table bucketed + sorted on
    ``bucket_key`` (the write performs the one-time shuffle).

    Drops any previous table AND its leftover warehouse directory first:
    a managed-table location orphaned by a dropped catalog (e.g. a prior
    session without Hive metastore persistence) makes ``saveAsTable``
    fail with LOCATION_ALREADY_EXISTS. The location is resolved from the
    catalog, never string-built, and because the name feeds both SQL and
    a destructive rmtree only simple unqualified identifiers are
    accepted. Local-FS cleanup only — an object-store deployment would
    version locations instead.
    """
    if not _NAME_RE.match(table_name):
        raise ValueError(
            f"write_bucketed: table name must be a simple unqualified "
            f"identifier, got {table_name!r}"
        )
    spark = df.sparkSession
    loc, typ = _table_info(spark, table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if loc is None and typ is None:
        # table not in catalog — an orphaned managed location may remain
        # from a dropped metastore; default-database layout only
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = f"{warehouse}/{table_name}"
    if typ == "EXTERNAL":
        # DROP TABLE on an EXTERNAL table intentionally preserves its
        # data; deleting it here would silently widen the blast radius.
        loc = None
    if loc:
        shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With
    bucketing metadata present, Catalyst plans a SortMergeJoin over the
    existing bucket files — zero runtime shuffle."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan as text (for shuffle-free asserts)."""
    return df._jdf.queryExecution().executedPlan().toString()
