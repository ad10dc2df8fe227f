"""Column DEFAULTs, NOT NULL, and named-column INSERT."""

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path):
    t = ManagedTable(spark, "td", str(tmp_path / "td"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0)], "k long, s string, v double"
        )
    )
    sess = SqlSession(spark)
    sess.register(t)
    return t, sess


def test_named_column_insert_fills_null(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    sess.sql("INSERT INTO td (k, v) VALUES (2, 20.0)")
    row = t.read().where("k = 2").collect()[0]
    assert row["s"] is None and row["v"] == 20.0


def test_default_applied_when_omitted(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    sess.sql("ALTER TABLE td ALTER COLUMN s SET DEFAULT 'unknown'")
    sess.sql("INSERT INTO td (k, v) VALUES (2, 20.0)")
    assert t.read().where("k = 2").collect()[0]["s"] == "unknown"
    # listed columns ignore the default
    sess.sql("INSERT INTO td (k, s, v) VALUES (3, 'x', 30.0)")
    assert t.read().where("k = 3").collect()[0]["s"] == "x"
    sess.sql("ALTER TABLE td ALTER COLUMN s DROP DEFAULT")
    sess.sql("INSERT INTO td (k, v) VALUES (4, 40.0)")
    assert t.read().where("k = 4").collect()[0]["s"] is None


def test_default_expression_not_just_literal(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    sess.sql("ALTER TABLE td ALTER COLUMN v SET DEFAULT 2.0 + 3.0")
    sess.sql("INSERT INTO td (k, s) VALUES (2, 'b')")
    assert t.read().where("k = 2").collect()[0]["v"] == 5.0


def test_defaults_persist_and_restore(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)  # v0
    t.set_column_default("s", "'d1'")  # v1
    reopened = ManagedTable(spark, "td", t.location)
    assert reopened.defaults == {"s": "'d1'"}
    t.drop_column_default("s")  # v2
    t.restore(1)
    assert t.defaults == {"s": "'d1'"}


def test_set_not_null_validates_existing_and_enforces(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    sess.sql("ALTER TABLE td ALTER COLUMN s SET NOT NULL")
    with pytest.raises(ValueError, match="constraint"):
        t.append(
            spark.createDataFrame(
                [(9, None, 1.0)], "k long, s string, v double"
            )
        )
    # named-column INSERT omitting a NOT NULL column (no default) fails
    with pytest.raises(ValueError, match="constraint"):
        sess.sql("INSERT INTO td (k, v) VALUES (9, 9.0)")
    sess.sql("ALTER TABLE td ALTER COLUMN s DROP NOT NULL")
    sess.sql("INSERT INTO td (k, v) VALUES (9, 9.0)")
    assert t.read().where("k = 9").count() == 1


def test_set_not_null_rejected_when_existing_rows_violate(spark, tmp_path):
    t = ManagedTable(spark, "tn", str(tmp_path / "tn"))
    t.overwrite(
        spark.createDataFrame([(1, None)], "k long, s string")
    )
    sess = SqlSession(spark)
    sess.register(t)
    with pytest.raises(ValueError, match="existing rows violate"):
        sess.sql("ALTER TABLE tn ALTER COLUMN s SET NOT NULL")


def test_default_on_generated_column_rejected(spark, tmp_path):
    t = ManagedTable(spark, "tg", str(tmp_path / "tg"))
    t.set_identity_column("rid")
    t.overwrite(spark.createDataFrame([("a",)], "s string"))
    with pytest.raises(ValueError, match="generated/identity"):
        t.set_column_default("rid", "1")


def test_named_insert_unknown_column_rejected(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown column"):
        sess.sql("INSERT INTO td (k, nope) VALUES (2, 1)")
