"""ALTER TABLE RENAME COLUMN via column mapping (VERDICT r07 item 5).

Delta's columnMapping.mode=name semantics: the physical name in data
files never changes; a rename is a metadata-only commit that redirects
the logical name. Pinned here: the round trip (rename → reads correct →
old-version read correct → restore), writes after a rename (physical
names on disk), DV deletes after a rename, stats skipping and pushdown
under the mapped name, clone/CDF preservation, the SQL spelling, and
the refusal guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="rn", **kw):
    t = ManagedTable(spark, name, str(tmp_path / name), **kw)
    t.overwrite(
        spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 10).alias("grp"),
            (F.col("id") * 2).alias("val"),
        )
    )
    return t


def test_rename_round_trip_and_restore(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.current_version()
    t.rename_column("val", "amount")
    assert set(t.read().columns) == {"id", "grp", "amount"}
    assert t.read().agg(F.sum("amount")).collect()[0][0] == sum(
        i * 2 for i in range(100)
    )
    # old-version read resolves through the CURRENT mapping (rename is
    # retroactive on read, Delta behavior)
    assert set(t.read(version=v_before).columns) == {"id", "grp", "amount"}
    # RESTORE replays the restored version's metadata — schema AND
    # column mapping revert with the data (Delta RestoreTableCommand)
    t.restore(v_before)
    assert set(t.read().columns) == {"id", "grp", "val"}
    assert t.read().agg(F.sum("val")).collect()[0][0] == sum(
        i * 2 for i in range(100)
    )


def test_write_after_rename_keeps_physical_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("val", "amount")
    t.append(
        spark.range(100, 110).select(
            F.col("id"), (F.col("id") % 10).alias("grp"),
            (F.col("id") * 2).alias("amount"),
        )
    )
    df = t.read()
    assert df.count() == 110
    # every row (old files and new) carries the logical name with
    # correct values — i.e. the new files were written under the
    # PHYSICAL name and read back through the mapping
    assert df.filter(F.col("amount") != F.col("id") * 2).count() == 0
    # a second rename chains back to the original physical name
    t.rename_column("amount", "total")
    assert t.read().filter(F.col("total") != F.col("id") * 2).count() == 0
    # renaming BACK to the physical name clears the mapping entry
    t.rename_column("total", "val")
    assert t.renames == {}
    assert t.read().filter(F.col("val") != F.col("id") * 2).count() == 0


def test_dv_delete_and_merge_after_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("val", "amount")
    t.delete_where(F.col("amount") < 20)  # logical name in predicate
    assert t.read().count() == 90
    t.merge_upsert(
        spark.range(0, 5).select(
            F.col("id"), (F.col("id") % 10).alias("grp"),
            F.lit(999).alias("amount"),
        ),
        ["id"],
    )
    got = t.read()
    assert got.filter(F.col("amount") == 999).count() == 5
    assert got.count() == 95


def test_scan_skipping_and_pushdown_use_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.compact(zorder_by=["val"], target_files=4)
    t.rename_column("val", "amount")
    # stats are keyed by the physical name; a logical-name triple must
    # still prune and return exact rows
    assert t.scan([("amount", ">", 150)]).count() == 24
    rep = t.skipping_report([("amount", ">", 150)])
    assert rep["files_kept"] < rep["files_total"]
    got = t.read_pushdown().filter(F.col("amount") > 150)
    assert got.count() == 24
    rep2 = t.last_pushdown_report()
    assert rep2["files_kept"] < rep2["files_total"]


def test_metadata_aggregate_after_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("val", "amount")
    agg = t.metadata_aggregate("amount")
    assert agg["count"] == 100
    assert agg["amount"]["min"] == 0 and agg["amount"]["max"] == 198


def test_clone_and_cdf_preserve_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("val", "amount")
    c = t.clone("rn_clone", str(tmp_path / "rn_clone"))
    assert set(c.read().columns) == {"id", "grp", "amount"}
    assert c.read().agg(F.sum("amount")).collect()[0][0] == sum(
        i * 2 for i in range(100)
    )
    # change feed after the rename reports rows under the logical name
    t.delete_where(F.col("amount") >= 190)
    ch = t.changes_by_version(t.current_version() - 1, t.current_version())
    rows = ch.filter(F.col("_change_type") == "delete").collect()
    assert {r["amount"] for r in rows} == {190, 192, 194, 196, 198}


def test_rename_guards(spark, tmp_path):
    t = ManagedTable(
        spark, "rg", str(tmp_path / "rg"), partition_columns=["grp"]
    )
    t.overwrite(
        spark.range(0, 20).select(
            F.col("id"), (F.col("id") % 2).alias("grp")
        )
    )
    with pytest.raises(ValueError, match="partition/sort"):
        t.rename_column("grp", "g2")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("id", "grp")
    t.add_constraint("pos_id", "id >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("id", "ident")


def test_sql_spelling(spark, tmp_path):
    t = _mk(spark, tmp_path, name="rsql")
    sess = SqlSession(spark)
    sess.register(t)
    out = sess.sql("ALTER TABLE rsql RENAME COLUMN val TO amount")
    assert out.collect()[0]["operation"] == "RENAME COLUMN"
    assert set(t.read().columns) == {"id", "grp", "amount"}


def test_rename_survives_optimize_and_reorg(spark, tmp_path):
    t = ManagedTable(
        spark, "rno", str(tmp_path / "rno"), partition_columns=["p"]
    )
    t.overwrite(
        spark.range(0, 40).select(
            F.col("id"), (F.col("id") % 2).alias("p"),
            (F.col("id") * 3).alias("val"),
        )
    )
    t.rename_column("val", "amount")
    # fragment one partition, then bin-pack: the rewrite must write
    # PHYSICAL names so old and new files stay schema-compatible
    for i in range(3):
        t.append(
            spark.range(100 + i, 101 + i).select(
                F.col("id"), F.lit(0).alias("p"),
                (F.col("id") * 3).alias("amount"),
            )
        )
    t.optimize()
    got = t.read()
    assert got.count() == 43
    assert got.filter(F.col("amount") != F.col("id") * 3).count() == 0
    # DV + reorg after the rename: materialization keeps the mapping
    t.delete_where(F.col("id") % 5 == 0)
    before = got.filter(F.col("id") % 5 != 0).count()
    t.reorg(min_dv_fraction=0.0)
    assert t.read().count() == before
    assert t.read().filter(F.col("amount") != F.col("id") * 3).count() == 0
    # rename back after all the rewrites still resolves
    t.rename_column("amount", "val")
    assert t.read().filter(F.col("val") != F.col("id") * 3).count() == 0


def test_physical_name_cannot_be_reused(spark, tmp_path):
    t = _mk(spark, tmp_path, name="pnr")
    t.rename_column("val", "amount")  # physical 'val' still in files
    # adding a column named like the physical identity would put two
    # same-named fields into the parquet read schema
    with pytest.raises(ValueError, match="physical name"):
        t.add_column("val", "bigint")
    # a fresh name is fine, and reads resolve both
    t.add_column("extra", "bigint")
    assert set(t.read().columns) == {"id", "grp", "amount", "extra"}
    assert t.read().filter(F.col("amount") != F.col("id") * 2).count() == 0


def test_pushdown_time_travel_before_rename(spark, tmp_path):
    # pushdown read of a version committed BEFORE the rename must still
    # resolve the renamed column (mapping is retroactive on read)
    t = _mk(spark, tmp_path, name="rtt")
    v0 = t.current_version()
    t.rename_column("val", "amount")
    t.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 10).alias("grp"),
            (F.col("id") * 2).alias("amount"),
        )
    )
    old = t.read_pushdown(version=v0)
    assert old.count() == 100
    assert old.filter(F.col("amount").isNull()).count() == 0
    assert old.filter(F.col("amount") != F.col("id") * 2).count() == 0
