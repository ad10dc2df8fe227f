"""Delta 4 type widening: ALTER COLUMN c TYPE <wider> is metadata-only
(upcast-on-read, no rewrite), narrowing/cross-family refused, writes
after the widen land in the new type, and skipping/DML still work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def test_widen_int_to_long_metadata_only(spark, tmp_path):
    t = ManagedTable(spark, "w1", str(tmp_path / "w1"))
    t.overwrite(spark.createDataFrame([(1, 1.5), (2, 2.5)], "k int, v float"))
    files_before = set(t._read_manifest(t.current_version()).values())
    v = t.widen_column("k", "bigint")
    t.widen_column("v", "double")
    # metadata-only: no data files moved
    assert set(t._read_manifest(t.current_version()).values()) == files_before
    got = t.read()
    assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, 1.5), (2, 2.5)]
    # writes after the widen: values beyond int range land fine
    t.append(spark.createDataFrame([(3_000_000_000, 9.5)], "k long, v double"))
    assert t.read().where("k > 2147483647").count() == 1
    # history + restore compose (schema is versioned)
    t.restore(v - 1)
    assert dict(t.read().dtypes)["k"] == "int"


def test_widen_refuses_narrowing_and_cross_family(spark, tmp_path):
    t = ManagedTable(spark, "w2", str(tmp_path / "w2"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, s string"))
    for bad in ("int", "float", "string"):
        with pytest.raises(ValueError, match="lossless widening"):
            t.widen_column("k", bad)
    with pytest.raises(ValueError, match="lossless widening"):
        t.widen_column("s", "bigint")


def test_widen_decimal_rules(spark, tmp_path):
    t = ManagedTable(spark, "w3", str(tmp_path / "w3"))
    t.overwrite(
        spark.createDataFrame([(1,)], "k int").select(
            F.col("k").cast("decimal(10,2)").alias("d")
        )
    )
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("d", "decimal(10,3)")  # integer digits shrink
    t.widen_column("d", "decimal(14,4)")      # both grow: fine
    assert dict(t.read().dtypes)["d"] == "decimal(14,4)"
    # int -> decimal needs >= 10 integer digits
    t2 = ManagedTable(spark, "w3b", str(tmp_path / "w3b"))
    t2.overwrite(spark.createDataFrame([(5,)], "k int"))
    with pytest.raises(ValueError, match="lossless"):
        t2.widen_column("k", "decimal(9,0)")
    t2.widen_column("k", "decimal(12,2)")
    assert t2.read().collect()[0]["k"] == 5


def test_widen_refuses_bloom_indexed_column(spark, tmp_path):
    t = ManagedTable(spark, "w4", str(tmp_path / "w4"))
    t.overwrite(spark.createDataFrame([(i,) for i in range(50)], "k int"))
    t.set_bloom_index("k")
    with pytest.raises(ValueError, match="BLOOMFILTER"):
        t.widen_column("k", "bigint")


def test_widen_sql_spelling_and_dml_after(spark, tmp_path):
    sql = SqlSession(spark, base_location=str(tmp_path))
    sql.sql("CREATE TABLE w5 (k INT, v DOUBLE)")
    sql.sql("INSERT INTO w5 VALUES (1, 1.0), (2, 2.0)")
    r = sql.sql("ALTER TABLE w5 ALTER COLUMN k TYPE BIGINT")
    t = sql.table("w5")
    assert dict(t.read().dtypes)["k"] == "bigint"
    assert t.history()[0]["operation"] == "ALTER COLUMN TYPE"
    sql.sql("UPDATE w5 SET v = v + 10 WHERE k = 1")
    sql.sql("DELETE FROM w5 WHERE k = 2")
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(1, 11.0)}
