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


# ------------------------------------------- round 12 (VERDICT r11 item 7):
# widening through the CDF and streaming readers


def test_widen_through_cdf_changes(spark, tmp_path):
    """changes() spanning a widen commit: pre-widen files are read
    through the widened schema, the metadata-only commit itself diffs
    empty, and post-widen rows carry the wide values."""
    t = ManagedTable(spark, "wc", str(tmp_path / "wc"))
    t.overwrite(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"))
    wv = t.widen_column("v", "bigint")
    t.append(spark.createDataFrame([(3, 5_000_000_000)], "k int, v long"))
    ch = t.changes(0)
    assert dict(ch.dtypes)["v"] == "bigint"
    ins = {
        (r["k"], r["v"])
        for r in ch.where("_change_type = 'insert'").collect()
    }
    assert ins == {(3, 5_000_000_000)}
    assert ch.where("_change_type = 'delete'").count() == 0
    # the widen commit alone is a zero-row diff
    assert t.changes(wv - 1, wv).count() == 0


def test_widen_through_cdf_rewrite_attribution(spark, tmp_path):
    """A copy-on-write UPDATE after a widen: the delete preimages come
    from PRE-widen files and must surface upcast, next to insert
    postimages holding values only the widened type can carry."""
    t = ManagedTable(spark, "wr", str(tmp_path / "wr"))
    t.overwrite(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"))
    t.widen_column("v", "bigint")
    v_upd = t.update_where(
        {"v": "v + 5000000000"}, F.col("k") == 1, deletion_vectors=False
    )
    ch = t.changes(v_upd - 1, v_upd)
    assert dict(ch.dtypes)["v"] == "bigint"
    got = {
        (r["_change_type"], r["k"], r["v"]) for r in ch.collect()
    }
    assert got == {("delete", 1, 10), ("insert", 1, 5_000_000_010)}


def test_stream_across_widen_commit(spark, tmp_path):
    """A single availableNow drain whose offsets straddle the widen
    commit: the backfill's pre-widen files and the post-widen append
    deliver under ONE widened schema."""
    t = ManagedTable(spark, "ws", str(tmp_path / "ws"))
    t.overwrite(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"))
    t.widen_column("v", "bigint")
    t.append(spark.createDataFrame([(3, 5_000_000_000)], "k int, v long"))
    q = (
        t.read_stream()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out_ws"))
        .option("checkpointLocation", str(tmp_path / "ckpt_ws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.schema("k int, v long").parquet(
        str(tmp_path / "out_ws")
    )
    assert dict(got.dtypes)["v"] == "bigint"
    assert {(r["k"], r["v"]) for r in got.collect()} == {
        (1, 10), (2, 20), (3, 5_000_000_000),
    }


def test_stream_resumes_over_widen_commit(spark, tmp_path):
    """A checkpointed stream drained BEFORE the widen resumes AFTER
    it: the widen commit itself is a zero-row metadata version (no
    ignoreChanges needed — nothing was rewritten) and the next append
    flows with the wide values."""
    t = ManagedTable(spark, "wres", str(tmp_path / "wres"))
    t.overwrite(spark.createDataFrame([(1, 10)], "k int, v int"))

    def drain():
        q = (
            t.read_stream()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out_wres"))
            .option("checkpointLocation", str(tmp_path / "ckpt_wres"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    t.widen_column("v", "bigint")
    t.append(spark.createDataFrame([(2, 6_000_000_000)], "k int, v long"))
    drain()
    # the sink dir holds one int-typed file (pre-widen run) and one
    # long-typed file; the explicit schema reads both upcast — the
    # same read path the table itself uses after a widen
    got = spark.read.schema("k int, v long").parquet(
        str(tmp_path / "out_wres")
    )
    assert {(r["k"], r["v"]) for r in got.collect()} == {
        (1, 10), (2, 6_000_000_000),
    }
