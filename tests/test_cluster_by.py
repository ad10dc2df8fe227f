"""Liquid-clustering analogue — CLUSTER BY keys + incremental
OPTIMIZE: only unclustered files rewrite; clustered files carry over
byte-untouched (inode-pinned). Content is invariant throughout."""

import glob
import os

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("a"),
        (F.col("id") % 89).alias("b"),
    )


def _inodes(t):
    return {
        os.path.relpath(p, t.location): os.stat(p).st_ino
        for p in glob.glob(t.location + "/data/**/*.parquet", recursive=True)
    }


def _live(t):
    entries = t._read_manifest(t.current_version())
    out = {}
    for rel in set(entries.values()):
        for p in glob.glob(
            os.path.join(t.location, rel) + "/**/*.parquet", recursive=True
        ):
            rp = os.path.relpath(p, t.location)
            out[rp] = os.stat(p).st_ino
    return out


def test_incremental_cluster_touches_only_new_files(spark, tmp_path):
    t = ManagedTable(
        spark, "tc", str(tmp_path / "tc"), cluster_by=["a", "b"]
    )
    t.overwrite(_df(spark, 0, 2000))
    v1 = t.cluster()
    assert t.history()[0]["operation"] == "OPTIMIZE CLUSTER"
    first_round = _live(t)
    # fully clustered: second run is a commit-free no-op
    assert t.cluster() == v1
    # new data arrives
    t.append(_df(spark, 2000, 3000))
    t.cluster()
    after = _live(t)
    # every file of the first round that's still live is inode-identical
    for rp, ino in first_round.items():
        if rp in after:
            assert after[rp] == ino, f"clustered file {rp} was rewritten"
    # the first round's files all survived (only the append rewrote)
    assert set(first_round) <= set(after)
    # content invariant
    assert sorted(r["k"] for r in t.read().collect()) == list(range(3000))


def test_cluster_improves_pruning(spark, tmp_path):
    t = ManagedTable(
        spark, "tp", str(tmp_path / "tp"), cluster_by=["a", "b"]
    )
    # write in k-order: a/b values are scattered across every file
    t.overwrite(_df(spark, 0, 20000).repartitionByRange(8, "k"))
    before = t.skipping_report([("a", "=", 5), ("b", "=", 13)])
    assert before["files_kept"] == before["files_total"]  # nothing prunes
    t.cluster()
    after = t.skipping_report([("a", "=", 5), ("b", "=", 13)])
    assert after["files_kept"] < after["files_total"]
    got = t.scan([("a", "=", 5), ("b", "=", 13)]).count()
    want = (
        _df(spark, 0, 20000)
        .where((F.col("a") == 5) & (F.col("b") == 13))
        .count()
    )
    assert got == want


def test_changing_keys_resets_clustered_state(spark, tmp_path):
    t = ManagedTable(spark, "tr", str(tmp_path / "tr"), cluster_by=["a"])
    t.overwrite(_df(spark, 0, 1000))
    t.cluster()
    assert t.clustered_rels
    t.set_cluster_by(["b"])
    assert t.clustered_rels == []
    v = t.cluster()  # re-lays out everything under the new keys
    assert t.history()[0]["operation"] == "OPTIMIZE CLUSTER"
    assert t.current_version() == v


def test_cluster_materializes_dvs_of_rewritten_files(spark, tmp_path):
    t = ManagedTable(spark, "tdv", str(tmp_path / "tdv"), cluster_by=["a"])
    t.overwrite(_df(spark, 0, 1000))
    t.delete_where(F.col("k") < 10)  # DV on the unclustered file
    t.cluster()
    dv, _ = t._read_dv(t.current_version())
    assert dv == {}  # materialized
    assert t.read().count() == 990


def test_sql_create_cluster_by_and_optimize_routing(spark, tmp_path):
    sess = SqlSession(spark, base_location=str(tmp_path))
    sess.sql(
        "CREATE TABLE ct (k BIGINT, a BIGINT, b BIGINT) CLUSTER BY (a, b)"
    )
    t = sess.table("ct")
    assert t.cluster_by == ["a", "b"]
    sess.sql("INSERT INTO ct SELECT id, id % 7, id % 5 FROM RANGE(100)")
    sess.sql("OPTIMIZE ct")
    assert t.history()[0]["operation"] == "OPTIMIZE CLUSTER"
    sess.sql("ALTER TABLE ct CLUSTER BY NONE")
    assert t.cluster_by == []
    sess.sql("OPTIMIZE ct")  # plain bin-packing path again
    assert t.history()[0]["operation"] != "OPTIMIZE CLUSTER"


def test_cluster_state_survives_reopen_and_restore(spark, tmp_path):
    t = ManagedTable(spark, "ts", str(tmp_path / "ts"), cluster_by=["a"])
    t.overwrite(_df(spark, 0, 500))  # v0
    t.cluster()  # v1
    re1 = ManagedTable(spark, "ts", t.location)
    assert re1.cluster_by == ["a"] and re1.clustered_rels
    t.append(_df(spark, 500, 600))  # v2 — new unclustered rel
    t.restore(1)
    assert t.clustered_rels  # the restored version's set
    assert t.cluster() == t.current_version()  # fully clustered again
