"""DELETE / UPDATE with subquery WHERE predicates (IN / EXISTS /
scalar, incl. correlated) — resolved as real Spark SQL over the
positioned snapshot, committed merge-on-read like any DV mutation."""

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path):
    t = ManagedTable(spark, "tq", str(tmp_path / "tq"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0)],
            "k long, g string, v double",
        )
    )
    sess = SqlSession(spark)
    sess.register(t)
    return t, sess


def test_delete_in_subquery(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    spark.createDataFrame([(1,), (3,)], "k long").createOrReplaceTempView(
        "doomed_keys"
    )
    sess.sql("DELETE FROM tq WHERE k IN (SELECT k FROM doomed_keys)")
    assert sorted(r["k"] for r in t.read().collect()) == [2, 4]
    assert t.history()[0]["operation"] == "DELETE (DV)"


def test_delete_correlated_exists(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    spark.createDataFrame([("a",)], "g string").createOrReplaceTempView(
        "bad_groups"
    )
    sess.sql(
        "DELETE FROM tq WHERE EXISTS "
        "(SELECT 1 FROM bad_groups b WHERE b.g = tq.g)"
    )
    assert sorted(r["k"] for r in t.read().collect()) == [2, 4]


@pytest.mark.slow
def test_delete_scalar_subquery(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    sess.sql("DELETE FROM tq WHERE v > (SELECT AVG(v) FROM tq)")
    # avg = 25 → rows 30, 40 deleted
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]


def test_update_in_subquery_merge_on_read(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    spark.createDataFrame([(2,), (4,)], "k long").createOrReplaceTempView(
        "upd_keys"
    )
    sess.sql(
        "UPDATE tq SET v = v + 100 WHERE k IN (SELECT k FROM upd_keys)"
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: 10.0, 2: 120.0, 3: 30.0, 4: 140.0}
    assert t.history()[0]["operation"] == "UPDATE (DV)"


def test_update_set_subquery_rejected(spark, tmp_path):
    t, sess = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="SET expressions"):
        sess.sql(
            "UPDATE tq SET v = (SELECT MAX(v) FROM tq) "
            "WHERE k IN (SELECT k FROM tq)"
        )


def test_subquery_sees_other_managed_tables(spark, tmp_path):
    """The subquery can target another registered ManagedTable's
    pushdown view, not just temp views."""
    t, sess = _mk(spark, tmp_path)
    other = ManagedTable(spark, "refk", str(tmp_path / "refk"))
    other.overwrite(spark.createDataFrame([(2,), (3,)], "k long"))
    sess.register(other)
    sess.sql("DELETE FROM tq WHERE k IN (SELECT k FROM refk)")
    assert sorted(r["k"] for r in t.read().collect()) == [1, 4]
