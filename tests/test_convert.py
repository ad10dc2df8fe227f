"""CONVERT TO MANAGED — adopt a plain-parquet directory in place
(no rewrite), with stats harvested, DML working on top, and vacuum
never touching the adopted files."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import (
    ManagedTable,
    convert_to_managed,
)


def _src(spark, tmp_path, partitioned=False):
    d = str(tmp_path / "rawpq")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 2.0).alias("v"),
    )
    w = df.repartitionByRange(4, "k").write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("g")
    w.parquet(d)
    return d, df


def test_convert_unpartitioned_zero_copy(spark, tmp_path):
    d, df = _src(spark, tmp_path)
    inodes = {
        p: os.stat(p).st_ino
        for p in glob.glob(d + "/**/*.parquet", recursive=True)
    }
    t = convert_to_managed(spark, "cv", str(tmp_path / "cv"), d)
    assert sorted(r["k"] for r in t.read().collect()) == list(range(1000))
    # zero-copy: source files untouched, table location holds no data
    for p, ino in inodes.items():
        assert os.stat(p).st_ino == ino
    assert not glob.glob(str(tmp_path / "cv") + "/data/**/*.parquet",
                         recursive=True)


def test_convert_harvests_stats_for_skipping(spark, tmp_path):
    d, _ = _src(spark, tmp_path)
    t = convert_to_managed(spark, "cs", str(tmp_path / "cs"), d)
    rep = t.skipping_report([("k", "between", 0, 100)])
    assert rep["files_total"] == 4
    assert rep["files_kept"] < 4  # range layout prunes immediately
    got = t.scan([("k", "between", 0, 100)]).count()
    assert got == 101


def test_convert_partitioned_layout_adopted(spark, tmp_path):
    d, df = _src(spark, tmp_path, partitioned=True)
    t = convert_to_managed(
        spark, "cp", str(tmp_path / "cp"), d, partition_columns=["g"]
    )
    assert t.read().count() == 1000
    rep = t.skipping_report([("g", "=", 1)])
    assert rep["files_kept"] < rep["files_total"]  # partition prune


def test_dml_on_converted_table(spark, tmp_path):
    d, _ = _src(spark, tmp_path)
    t = convert_to_managed(spark, "cd", str(tmp_path / "cd"), d)
    t.delete_where(F.col("k") < 10)  # DV path over absolute keys
    assert t.read().count() == 990
    t.append(
        spark.createDataFrame([(5000, 0, 1.0)], "k long, g long, v double")
    )
    assert t.read().count() == 991
    # the adopted files are still byte-identical
    assert glob.glob(d + "/**/*.parquet", recursive=True)


def test_vacuum_never_deletes_adopted_files(spark, tmp_path):
    d, _ = _src(spark, tmp_path)
    t = convert_to_managed(spark, "cvac", str(tmp_path / "cvac"), d)
    t.compact()  # materializes into the table's own location
    t.vacuum(keep=1)
    assert glob.glob(d + "/**/*.parquet", recursive=True)  # source intact
    assert t.read().count() == 1000


def test_sql_convert_spelling(spark, tmp_path):
    d, _ = _src(spark, tmp_path)
    sess = SqlSession(spark, base_location=str(tmp_path))
    res = sess.sql(f"CONVERT TO MANAGED PARQUET '{d}' AS adopted").collect()
    assert res[0]["operation"] == "CONVERT"
    assert sess.sql("SELECT COUNT(*) AS n FROM adopted").collect()[0]["n"] == 1000


def test_convert_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        convert_to_managed(
            spark, "x", str(tmp_path / "x"), str(tmp_path / "nope")
        )
    d, _ = _src(spark, tmp_path)
    with pytest.raises(ValueError, match="not found"):
        convert_to_managed(
            spark, "y", str(tmp_path / "y"), d, partition_columns=["zz"]
        )
