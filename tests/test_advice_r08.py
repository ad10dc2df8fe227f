"""Regression tests for the round-7 ADVICE defects.

1. Pushdown pruning on date/timestamp-PARTITIONED tables: ``_augment``
   must encode the hive path value exactly as ``_stat_scalar`` encodes
   the filter literal, or the min=max compare wrongly proves emptiness
   and prunes every matching file (silent missing rows on the default
   SQL/pushdown path).
2. DV keys for paths with URI-escapable chars (space, hive-escaped %XX,
   '+'): ``_file_key`` must percent-decode ``_metadata.file_path`` so
   DV rows live in the same key space as manifest stats — otherwise the
   carry-over filter in ``_stage_and_commit`` drops the vectors on the
   next commit and deleted rows resurrect.
3. Append-entry base-key extraction with '@' in a partition VALUE:
   ``split('@', 1)`` truncated the JSON base key, so a partition-scoped
   merge failed to retire the partition's earlier append entries and
   the snapshot held duplicates.
"""

from __future__ import annotations
import pytest

import datetime

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import (
    ManagedTable,
    _base_key,
)


def _tbl(spark, tmp_path, name, **kw):
    return ManagedTable(spark, name, str(tmp_path / name), **kw)


# ----------------------------------------------------- 1: date partitions
@pytest.mark.slow
def test_pushdown_date_partition_filter(spark, tmp_path):
    t = _tbl(spark, tmp_path, "dpart", partition_columns=["d"])
    df = spark.range(0, 300).select(
        F.col("id"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 3).cast("int")
        ).alias("d"),
    )
    t.overwrite(df)
    probe = datetime.date(2024, 1, 1)
    exp = t.read().filter(F.col("d") == F.lit(probe)).count()
    got = t.read_pushdown().filter(F.col("d") == F.lit(probe)).count()
    assert exp > 0 and got == exp
    # the matching partition's files must actually be KEPT, and the two
    # non-matching date partitions pruned
    rep = t.last_pushdown_report()
    assert rep["files_kept"] > 0
    assert rep["files_kept"] < rep["files_total"]


def test_pushdown_timestamp_partition_filter(spark, tmp_path):
    t = _tbl(spark, tmp_path, "tspart", partition_columns=["ts"])
    df = spark.range(0, 200).select(
        F.col("id"),
        F.to_timestamp(
            F.when(F.col("id") % 2 == 0, "2024-06-01 12:00:00")
            .otherwise("2024-06-02 06:30:00")
        ).alias("ts"),
    )
    t.overwrite(df)
    probe = datetime.datetime(2024, 6, 1, 12, 0, 0)
    exp = t.read().filter(F.col("ts") == F.lit(probe)).count()
    got = t.read_pushdown().filter(F.col("ts") == F.lit(probe)).count()
    assert exp > 0 and got == exp
    rep = t.last_pushdown_report()
    assert 0 < rep["files_kept"] < rep["files_total"]


def test_pushdown_date_partition_range(spark, tmp_path):
    t = _tbl(spark, tmp_path, "dpartr", partition_columns=["d"])
    df = spark.range(0, 300).select(
        F.col("id"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 5).cast("int")
        ).alias("d"),
    )
    t.overwrite(df)
    lo = datetime.date(2024, 1, 2)
    exp = t.read().filter(F.col("d") >= F.lit(lo)).count()
    got = t.read_pushdown().filter(F.col("d") >= F.lit(lo)).count()
    assert exp > 0 and got == exp


# ------------------------------------------- 2: DV keys with escaped paths
def _escaped_partition_table(spark, tmp_path, name):
    # space (URI %20), hive-escaped ':' and '%', literal '+' — every
    # class of path byte whose URI spelling differs from the raw one
    t = _tbl(spark, tmp_path, name, partition_columns=["p"])
    df = spark.range(0, 40).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("a b"), F.lit("c:d"), F.lit("e%f"), F.lit("g+h")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("p"),
    )
    t.overwrite(df)
    return t


def test_dv_survives_next_commit_with_escaped_partition(spark, tmp_path):
    t = _escaped_partition_table(spark, tmp_path, "esc")
    t.delete_where(F.col("id") < 8)  # 2 per partition, as DVs
    assert t.read().filter(F.col("id") < 8).count() == 0
    # the next commit's carry-over must keep the vectors: append rows
    # into a fresh id range and re-check the deleted ones stay deleted
    t.append(
        spark.range(100, 110).select(
            F.col("id"), F.lit("a b").alias("p")
        )
    )
    assert t.read().filter(F.col("id") < 8).count() == 0
    assert t.read().count() == 40 - 8 + 10
    # merge-on-read pushdown path applies the same DVs
    assert t.read_pushdown().filter(F.col("id") < 8).count() == 0


def test_dv_counts_match_with_escaped_partition(spark, tmp_path):
    t = _escaped_partition_table(spark, tmp_path, "esc2")
    t.delete_where(F.col("id") % 10 == 3)
    n_read = t.read().count()
    n_pd = t.read_pushdown().count()
    assert n_read == n_pd == 40 - 4


# ----------------------------------------------- 3: '@' in partition value
def test_base_key_strip_is_suffix_anchored():
    assert _base_key('["a@b"]@data/w=3-0123abcd') == '["a@b"]'
    assert _base_key('["a@b"]') == '["a@b"]'
    assert _base_key('["x"]@data/w=12-deadbeef') == '["x"]'
    # a VALUE containing the suffix pattern mid-string is untouched
    assert (
        _base_key('["u@data/w=1-aaaaaaaa"]') == '["u@data/w=1-aaaaaaaa"]'
    )


def test_merge_retires_append_entries_under_at_partition(spark, tmp_path):
    t = _tbl(spark, tmp_path, "atp", partition_columns=["p"])
    base = spark.range(0, 5).select(F.col("id"), F.lit("a@b").alias("p"))
    t.overwrite(base)
    t.append(
        spark.range(5, 10).select(F.col("id"), F.lit("a@b").alias("p"))
    )
    assert t.read().count() == 10
    # partition-scoped upsert restages partition 'a@b'; the earlier
    # append entry ('["a@b"]@data/w=2-…') must be retired with it
    src = spark.range(0, 10).select(
        F.col("id"), F.lit("a@b").alias("p")
    )
    t.merge_upsert(src, ["p", "id"])
    assert t.read().count() == 10
    assert (
        t.read().groupBy("id").count().filter(F.col("count") > 1).count()
        == 0
    )
