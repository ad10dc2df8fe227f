"""TBLPROPERTIES — versioned with the manifest, restore-aware, with
the two functional keys Delta interprets: delta.appendOnly (enforced
on every row-removing commit) and delta.autoOptimize.autoCompact."""

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path):
    t = ManagedTable(spark, "tp", str(tmp_path / "tp"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
        )
    )
    return t


def test_set_show_unset_roundtrip_sql(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sess = SqlSession(spark)
    sess.register(t)
    sess.sql(
        "ALTER TABLE tp SET TBLPROPERTIES "
        "('owner' = 'data-eng', 'pipelines.version' = 3)"
    )
    rows = {
        r["key"]: r["value"]
        for r in sess.sql("SHOW TBLPROPERTIES tp").collect()
    }
    assert rows == {"owner": "data-eng", "pipelines.version": "3"}
    one = sess.sql("SHOW TBLPROPERTIES tp ('owner')").collect()
    assert [(r["key"], r["value"]) for r in one] == [("owner", "data-eng")]
    sess.sql("ALTER TABLE tp UNSET TBLPROPERTIES ('owner')")
    assert "owner" not in t.properties
    with pytest.raises(ValueError, match="no such"):
        t.unset_properties(["nope"], if_exists=False)
    sess.sql("ALTER TABLE tp UNSET TBLPROPERTIES IF EXISTS ('nope')")


def test_properties_persist_and_reopen(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_properties({"owner": "x"})
    reopened = ManagedTable(spark, "tp", t.location)
    assert reopened.properties == {"owner": "x"}
    assert t.history()[0]["operation"] == "SET TBLPROPERTIES"


def test_restore_restores_properties(spark, tmp_path):
    t = _mk(spark, tmp_path)  # v0
    t.set_properties({"owner": "a"})  # v1
    t.set_properties({"owner": "b"})  # v2
    t.restore(1)
    assert t.properties["owner"] == "a"


def test_append_only_blocks_mutations_allows_appends(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_properties({"delta.appendOnly": "true"})
    with pytest.raises(ValueError, match="append-only"):
        t.delete_where(F.col("k") == 1)
    with pytest.raises(ValueError, match="append-only"):
        t.update_where({"v": "v + 1"}, F.lit(True))
    with pytest.raises(ValueError, match="append-only"):
        t.overwrite(spark.createDataFrame([(9, 9.0)], "k long, v double"))
    with pytest.raises(ValueError, match="append-only"):
        t.replace_where(
            spark.createDataFrame([], "k long, v double"), [("k", "=", 1)]
        )
    with pytest.raises(ValueError, match="append-only"):
        t.merge_upsert(
            spark.createDataFrame([(1, 99.0)], "k long, v double"), ["k"]
        )
    # appends and insert-only merges stay allowed
    t.append(spark.createDataFrame([(4, 40.0)], "k long, v double"))
    t.merge_insert_only(
        spark.createDataFrame([(5, 50.0)], "k long, v double"),
        match_columns=["k"],
    )
    assert t.read().count() == 5
    # unset re-enables mutation
    t.unset_properties(["delta.appendOnly"])
    t.delete_where(F.col("k") == 1)
    assert t.read().count() == 4


def test_append_only_blocks_sql_dml_subquery_path(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sess = SqlSession(spark)
    sess.register(t)
    sess.sql("ALTER TABLE tp SET TBLPROPERTIES ('delta.appendOnly' = 'true')")
    with pytest.raises(ValueError, match="append-only"):
        sess.sql("DELETE FROM tp WHERE k IN (SELECT k FROM tp)")


def test_autocompact_property_toggles_behavior(spark, tmp_path):
    t = ManagedTable(
        spark, "tc", str(tmp_path / "tc"), auto_compact_min_files=2
    )
    t.overwrite(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    assert not t.auto_compact
    t.set_properties({"delta.autoOptimize.autoCompact": "true"})
    assert t.auto_compact
    reopened = ManagedTable(spark, "tc", t.location)
    assert reopened.auto_compact
    t.set_properties({"delta.autoOptimize.autoCompact": "false"})
    assert not t.auto_compact


def test_concurrent_append_only_binds_on_other_handle(spark, tmp_path):
    """A property set through one handle binds another handle's next
    mutation (the guard reads the live manifest, not the cached map)."""
    t1 = _mk(spark, tmp_path)
    t2 = ManagedTable(spark, "tp", t1.location)
    t1.set_properties({"delta.appendOnly": "true"})
    # t2's in-memory map is stale, but the guard reads the manifest
    with pytest.raises(ValueError, match="append-only"):
        t2.overwrite(spark.createDataFrame([(9, 9.0)], "k long, v double"))


def test_show_create_table_roundtrip(spark, tmp_path):
    """SHOW CREATE TABLE emits re-runnable DDL carrying partitioning,
    clustering, NOT NULL, DEFAULT, properties, and constraints."""
    sess = SqlSession(spark, base_location=str(tmp_path))
    sess.sql(
        "CREATE TABLE sct (k BIGINT, s STRING, v DOUBLE) "
        "PARTITIONED BY (s) CLUSTER BY (k)"
    )
    sess.sql("ALTER TABLE sct ALTER COLUMN v SET DEFAULT 1.5")
    sess.sql("ALTER TABLE sct ALTER COLUMN k SET NOT NULL")
    sess.sql("ALTER TABLE sct SET TBLPROPERTIES ('owner' = 'me')")
    sess.sql("ALTER TABLE sct ADD CONSTRAINT pos CHECK (v >= 0)")
    ddl = sess.sql("SHOW CREATE TABLE sct").collect()[0]["createtab_stmt"]
    assert "PARTITIONED BY (s)" in ddl
    assert "CLUSTER BY (k)" in ddl
    assert "k BIGINT" in ddl and "NOT NULL" in ddl
    assert "DEFAULT 1.5" in ddl
    assert "TBLPROPERTIES ('owner' = 'me')" in ddl
    assert "ADD CONSTRAINT pos CHECK (v >= 0)" in ddl
