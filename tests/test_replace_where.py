"""replaceWhere + INSERT OVERWRITE (dynamic/static) — Delta's
selective-overwrite write modes.

Pins the three-way file classification (drop metadata-only / carry
byte-untouched / rewrite remainder), the Delta predicate contract
(incoming rows must match; NULL-predicate rows are kept), deletion
vectors applied during remainder rewrite, atomicity via single-commit
history, and both SQL spellings.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="rw", partition=("g",), rows=200):
    t = ManagedTable(
        spark, name, str(tmp_path / name), partition_columns=list(partition)
    )
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 10).cast("double").alias("v"),
    )
    t.overwrite(df)
    return t


def _files(t):
    return {
        os.path.relpath(p, t.location): os.stat(p).st_ino
        for p in glob.glob(t.location + "/data/**/*.parquet", recursive=True)
    }


def _live_files(t):
    """Data files the CURRENT manifest references."""
    entries = t._read_manifest(t.current_version())
    out = set()
    for rel in entries.values():
        for p in glob.glob(
            os.path.join(t.location, rel) + "/**/*.parquet", recursive=True
        ):
            out.add(os.path.relpath(p, t.location))
    return out


def test_partition_aligned_replace_drops_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0_live = _live_files(t)
    new = spark.createDataFrame(
        [(1000, 1, 1.5), (1001, 1, 2.5)], "k long, g long, v double"
    )
    v = t.replace_where(new, [("g", "=", 1)])
    assert v == 1
    got = {(r["k"], r["g"], r["v"]) for r in t.read().filter("g = 1").collect()}
    assert got == {(1000, 1, 1.5), (1001, 1, 2.5)}
    assert t.read().filter("g != 1").count() == 150
    # untouched partitions' files survive byte-identical (same inodes)
    before, after = _files(t), _live_files(t)
    untouched = {f for f in v0_live if "/g=1/" not in f and "\\g=1\\" not in f}
    assert untouched <= after
    # the replaced partition's old files left the manifest
    replaced_old = v0_live - untouched
    assert replaced_old.isdisjoint(after)
    assert t.history()[0]["operation"] == "REPLACE WHERE"


def test_straddling_predicate_rewrites_remainder_exactly(spark, tmp_path):
    # predicate on a NON-partition column: files straddle, the
    # non-matching remainder must survive row-for-row
    t = _mk(spark, tmp_path, partition=())
    new = spark.createDataFrame([(5000, 9, 999.0)], "k long, g long, v double")
    t.replace_where(new, [("k", ">=", 150)])
    kept = t.read().filter("k < 150")
    assert kept.count() == 150
    assert t.read().filter("k >= 150").count() == 1
    assert t.read().count() == 151


def test_predicate_violation_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bad = spark.createDataFrame([(1, 2, 0.0)], "k long, g long, v double")
    with pytest.raises(ValueError, match="must match the predicate"):
        t.replace_where(bad, [("g", "=", 1)])
    assert t.current_version() == 0  # nothing committed


def test_empty_replacement_is_conditional_delete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    empty = spark.createDataFrame([], "k long, g long, v double")
    t.replace_where(empty, [("g", "in", [0, 2])])
    assert t.read().count() == 100
    assert t.read().filter("g in (0, 2)").count() == 0


def test_dv_dead_rows_do_not_resurrect(spark, tmp_path):
    # a DV-deleted row inside a straddling file must stay dead after
    # the remainder rewrite
    t = _mk(spark, tmp_path, partition=())
    t.delete_where(F.col("k") == 10)  # DV path, file untouched
    new = spark.createDataFrame([(9000, 0, 0.0)], "k long, g long, v double")
    t.replace_where(new, [("k", ">=", 100)])
    assert t.read().filter("k = 10").count() == 0
    assert t.read().filter("k < 100").count() == 99
    assert t.read().filter("k >= 100").count() == 1


def test_null_predicate_rows_are_kept(spark, tmp_path):
    t = ManagedTable(spark, "rwn", str(tmp_path / "rwn"))
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "k long, v double"
    )
    t.overwrite(df)
    new = spark.createDataFrame([(9, 99.0)], "k long, v double")
    t.replace_where(new, [("v", ">", 10.0)])
    got = {r["k"] for r in t.read().collect()}
    assert got == {1, 2, 9}  # NULL-v row kept (predicate not TRUE on it)


def test_replace_where_equals_delete_plus_insert(spark, tmp_path):
    # semantic oracle: replace_where(P, D) ≡ (table where ~P) ∪ D
    t = _mk(spark, tmp_path)
    before = t.read()
    expect = {
        tuple(r)
        for r in before.filter(
            ~F.coalesce(F.col("g").between(1, 2), F.lit(False))
        ).collect()
    } | {(7777, 1, 3.25)}
    new = spark.createDataFrame([(7777, 1, 3.25)], "k long, g long, v double")
    t.replace_where(new, [("g", "between", 1, 2)])
    assert {tuple(r) for r in t.read().collect()} == expect


def test_insert_overwrite_dynamic_replaces_touched_partitions_only(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    v0_live = _live_files(t)
    new = spark.createDataFrame(
        [(1, 3, 1.0), (2, 3, 2.0)], "k long, g long, v double"
    )
    t.insert_overwrite(new, dynamic=True)
    assert t.read().filter("g = 3").count() == 2
    assert t.read().filter("g != 3").count() == 150
    after = _live_files(t)
    untouched = {f for f in v0_live if "/g=3/" not in f}
    assert untouched <= after
    assert t.history()[0]["operation"] == "INSERT OVERWRITE (DYNAMIC)"


def test_insert_overwrite_static_replaces_everything(spark, tmp_path):
    t = _mk(spark, tmp_path)
    new = spark.createDataFrame([(1, 3, 1.0)], "k long, g long, v double")
    t.insert_overwrite(new, dynamic=False)
    assert t.read().count() == 1


def test_sql_replace_where_and_insert_overwrite(spark, tmp_path):
    t = _mk(spark, tmp_path, name="sqlrw")
    s = SqlSession(spark)
    s.register(t)
    out = s.sql(
        "INSERT INTO sqlrw REPLACE WHERE g = 2 "
        "VALUES (600, 2, 6.0), (601, 2, 6.1)"
    ).collect()[0]
    assert out["operation"] == "REPLACE WHERE"
    assert t.read().filter("g = 2").count() == 2
    assert t.read().count() == 152

    # static PARTITION spec: query supplies the non-partition columns
    s.sql(
        "INSERT OVERWRITE sqlrw PARTITION (g = 0) VALUES (700, 7.0)"
    )
    assert t.read().filter("g = 0").count() == 1
    assert t.read().filter("g = 0").collect()[0]["k"] == 700

    # bare INSERT OVERWRITE: full table swap
    s.sql("INSERT OVERWRITE sqlrw VALUES (1, 1, 1.0)")
    assert t.read().count() == 1


def test_sql_insert_overwrite_rejects_non_partition_spec(spark, tmp_path):
    t = _mk(spark, tmp_path, name="sqlrw2")
    s = SqlSession(spark)
    s.register(t)
    with pytest.raises(ValueError, match="not a .*partition column"):
        s.sql("INSERT OVERWRITE sqlrw2 PARTITION (k = 1) VALUES (3, 1.0)")


def test_replace_where_skips_reading_untouched_partitions(spark, tmp_path):
    # the scale claim itself: a partition-aligned predicate classifies
    # every non-matching dir as provably-untouched and every matching
    # dir as provably-all-match — NOTHING is rewritten, the commit is
    # pure metadata + the staged new data
    t = _mk(spark, tmp_path)
    stats_before = t._read_stats(t.current_version())
    new = spark.createDataFrame([(1, 1, 1.0)], "k long, g long, v double")
    t.replace_where(new, [("g", "=", 1)])
    stats_after = t._read_stats(t.current_version())
    carried = set(stats_before) & set(stats_after)
    # every untouched file's stats entry carried over identically
    # (rewrites would mint new file paths)
    for f in carried:
        assert stats_before[f] == stats_after[f]
    dropped = set(stats_before) - set(stats_after)
    assert dropped  # the g=1 files left
    added = set(stats_after) - set(stats_before)
    # only the new write's files were added — remainder rewrite would
    # have re-staged ~150 rows across fresh files
    total_added_rows = sum(stats_after[f]["rows"] for f in added)
    assert total_added_rows == 1
