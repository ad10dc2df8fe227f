"""Deletion vectors: merge-on-read deletes (VERDICT r06 item 4).

Delta's DV contract re-created over the manifest MVCC: delete_where /
merge_delete mark row positions in a parquet sidecar instead of
rewriting data files; every read path (read, scan, pushdown datasource)
applies the DVs; compact() materializes them away; RESTORE resurrects;
vacuum honors DV liveness; metadata_aggregate stays exact for COUNT and
refuses bounds it can no longer prove.
"""

import glob
import os

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="dv", **kw):
    t = ManagedTable(spark, name, str(tmp_path / name), **kw)
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 10).alias("g"))
    t.overwrite(df.repartitionByRange(4, "id"))
    return t


def _data_files(t):
    return {
        p: (os.stat(p).st_ino, os.stat(p).st_mtime_ns)
        for p in glob.glob(t.location + "/data/**/*.parquet", recursive=True)
    }


def test_delete_where_writes_dv_not_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _data_files(t)
    v = t.delete_where(F.col("id").between(100, 149))
    assert v == 1
    assert _data_files(t) == before  # zero data files rewritten
    assert t.history()[0]["operation"] == "DELETE (DV)"
    assert t.read().count() == 950
    assert sorted(r.id for r in t.read().filter("id < 102").collect()) == list(
        range(100)
    ) + [100, 101][2:]  # 0..99 only
    # scan sees the same snapshot
    assert t.scan([("id", "<", 200)]).count() == 150
    # second delete over the same file unions positions
    t.delete_where(F.col("id") == 150)
    assert t.read().count() == 949
    # deleting an already-deleted row is a no-op commit
    v2 = t.current_version()
    assert t.delete_where(F.col("id") == 150) == v2


def test_null_predicate_keeps_rows(spark, tmp_path):
    t = ManagedTable(spark, "dvnull", str(tmp_path / "dvnull"))
    t.overwrite(
        spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "id long, v string")
    )
    t.delete_where(F.col("v") == "a")  # NULL predicate rows must stay
    assert sorted(r.id for r in t.read().collect()) == [2, 3]


def test_merge_delete_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dvmd")
    before = _data_files(t)
    t.merge_delete(spark.createDataFrame([(5,), (7,)], "id long"), ["id"])
    assert _data_files(t) == before
    assert t.history()[0]["operation"] == "MERGE DELETE (DV)"
    assert t.read().count() == 998
    # no match → commit-free no-op
    v = t.current_version()
    assert t.merge_delete(
        spark.createDataFrame([(10**9,)], "id long"), ["id"]
    ) == v


def test_pushdown_read_applies_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dvpd")
    t.delete_where(F.col("id") < 100)
    pdf = t.read_pushdown()
    assert pdf.count() == 900
    assert pdf.filter(pdf.id < 200).count() == 100
    assert sorted(pdf.collect()) == sorted(t.read().collect())


def test_time_travel_and_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dvtt")
    t.delete_where(F.col("id").between(0, 9))
    assert t.read(version=0).count() == 1000  # pre-delete snapshot intact
    ch = t.changes(0, 1)
    agg = {r["_change_type"]: r["count"] for r in
           ch.groupBy("_change_type").count().collect()}
    assert agg == {"delete": 10}


def test_metadata_aggregate_dv_count_exact_bounds_refused(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dvma")
    t.delete_where(F.col("id") >= 990)
    assert t.metadata_aggregate()["count"] == 990
    try:
        t.metadata_aggregate("id")
        assert False, "bounds over a DV'd snapshot must refuse"
    except ValueError as e:
        assert "deletion vectors" in str(e)


def test_compact_materializes_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dvc")
    t.delete_where(F.col("id") < 500)
    t.compact()
    assert t._read_dv(t.current_version())[0] == {}
    assert t.read().count() == 500
    assert [r.id for r in t.read().orderBy("id").limit(3).collect()] == [
        500, 501, 502,
    ]


def test_restore_resurrects_deleted_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dvr")
    t.delete_where(F.col("id") < 500)
    assert t.read().count() == 500
    t.restore(0)
    assert t.read().count() == 1000
    # and restoring the DV'd version brings the DV set back
    t.restore(1)
    assert t.read().count() == 500


def test_merge_upsert_over_dv_snapshot(spark, tmp_path):
    """A keyed merge after a DV delete must not resurrect DV'd rows:
    the rewrite reads the VISIBLE snapshot."""
    t = _mk(spark, tmp_path, name="dvm")
    t.delete_where(F.col("id") < 10)
    src = spark.createDataFrame([(5, 99), (2000, 1)], "id long, g long")
    t.merge_upsert(src, key_columns=["id"])
    got = {r.id: r.g for r in t.read().filter("id in (1, 5, 2000)").collect()}
    assert got == {5: 99, 2000: 1}  # id=1 stays deleted; 5 re-inserted


def test_partition_scoped_merge_carries_dv_of_untouched_partitions(
    spark, tmp_path
):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    t = ManagedTable(spark, "dvp", str(tmp_path / "dvp"),
                     partition_columns=["g"])
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 10).alias("g"))
    t.overwrite(df)
    t.delete_where(F.col("id") < 100)  # 10 per partition, DV across all
    assert t.read().count() == 900
    # scoped insert rewrites only partition g=0: its DV'd rows vanish
    # physically (read is DV-applied), the other partitions keep DVs
    t.merge_insert_only(spark.createDataFrame([(5000, 0)], "id long, g long"))
    dv, dv_n = t._read_dv(t.current_version())
    assert dv and all("g=0" not in f for f in dv)
    assert t.read().count() == 901
    assert t.read().filter("id < 100").count() == 0


def test_vacuum_honors_dv_liveness(spark, tmp_path):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    t = ManagedTable(spark, "dvv", str(tmp_path / "dvv"),
                     partition_columns=["g"])
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 10).alias("g"))
    t.overwrite(df)
    t.delete_where(F.col("id") < 100)  # v1 + dv dir A (all partitions)
    dv_dirs = lambda: set(os.listdir(os.path.join(t.location, "_dv")))
    assert len(dv_dirs()) == 1
    t.merge_insert_only(
        spark.createDataFrame([(5000, 1)], "id long, g long")
    )  # v2: partition g=1 rewritten, dir A still referenced by g!=1
    t.delete_where(F.col("id") == 5000)  # v3: dv dirs A + B
    assert len(dv_dirs()) == 2
    t.vacuum(keep=1)  # only v3 alive: BOTH dirs still referenced
    assert len(dv_dirs()) == 2
    assert t.read().count() == 900  # 1000 − 100 + 5000-row − its delete
    t.compact()  # v4: DVs materialized away
    t.vacuum(keep=1)
    assert not dv_dirs()
    assert t.read().count() == 900  # 5000 deleted, id<100 deleted


def test_clone_carries_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dvsrc")
    t.delete_where(F.col("id") < 250)
    c = t.clone("dvclone", str(tmp_path / "dvclone"))
    assert c.read().count() == 750
    assert sorted(c.read().collect()) == sorted(t.read().collect())
    # clone's DVs are its own: deleting more in the clone leaves the
    # source untouched
    c.delete_where(F.col("id") < 300)
    assert c.read().count() == 700
    assert t.read().count() == 750


def test_reorg_purges_only_dvd_dirs(spark, tmp_path):
    # 4 range files over id; delete hits only low ids → only the dirs
    # holding them are rewritten, cold files stay byte-identical
    t = _mk(spark, tmp_path, name="ro")
    t.delete_where(F.col("id") < 100)  # ~1 of 4 range files touched
    before = _data_files(t)
    v = t.reorg()
    assert v == 2
    after = _data_files(t)
    # no DVs remain; visible rows unchanged
    assert t._read_dv(v)[0] == {}
    assert t.read().count() == 900
    assert t.read().filter("id < 100").count() == 0
    # cold files untouched: every surviving old file is byte-identical
    untouched = set(before) & set(after)
    assert untouched and all(after[p] == before[p] for p in untouched)
    # the purged dir's files are gone from the manifest (replaced)
    assert len(set(before) - set(after) | set()) >= 0
    assert t.history()[0]["operation"] == "REORG (PURGE)"


def test_reorg_threshold_skips_lightly_deleted_dirs(spark, tmp_path):
    t = _mk(spark, tmp_path, name="rot")
    t.delete_where(F.col("id") == 0)  # ~0.4% of one file's dir
    v1 = t.current_version()
    assert t.reorg(min_dv_fraction=0.5) == v1  # no dir qualifies: no-op
    assert t._read_dv(v1)[0] != {}
    v2 = t.reorg(min_dv_fraction=0.001)
    assert v2 == v1 + 1
    assert t._read_dv(v2)[0] == {}
    assert t.read().count() == 999


def test_reorg_no_dv_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path, name="ron")
    assert t.reorg() == 0


def test_reorg_then_changes_and_scan(spark, tmp_path):
    t = _mk(spark, tmp_path, name="roc")
    t.delete_where(F.col("id") < 50)
    t.reorg()
    # reorg is a rewrite: content diff vs v0 is still just the deletes
    diff = t.changes(0)
    got = sorted((r["id"], r["_change_type"]) for r in diff.collect())
    assert got == [(i, "delete") for i in range(50)]
    # stats-pruned scan still equals plain filter over the reorged table
    assert (
        t.scan([("id", ">=", 900)]).count()
        == t.read().filter("id >= 900").count()
        == 100
    )


def test_clone_dv_reorg_update_roundtrip(spark, tmp_path):
    # a shallow clone's manifest holds ABSOLUTE source paths; the DV,
    # reorg, scan and update paths must all handle that key space
    t = _mk(spark, tmp_path, name="csrc")
    t.delete_where(F.col("id") < 100)
    c = t.clone("cdst", str(tmp_path / "cdst"))
    assert c.read().count() == 900
    v = c.reorg()  # materializes the carried DV, re-owns the rows
    assert c._read_dv(v)[0] == {}
    assert c.read().count() == 900
    assert c.scan([("id", ">=", 500)]).count() == 500
    c.update_where({"g": "g + 100"}, F.col("id") == 500)
    assert c.read().filter("g >= 100").count() == 1
    assert c.read().count() == 900
    # the source is untouched throughout
    assert t.read().count() == 900 and t._read_dv(t.current_version())[0] != {}


import pytest as _pytest


@_pytest.mark.parametrize(
    "cond",
    [
        "id < 250",
        "g = 7",
        "id % 3 = 0 AND g >= 5",
        "id > 2000",            # matches nothing
        "id >= 0",              # matches everything
        "CASE WHEN g = 0 THEN NULL ELSE id < 50 END",  # NULL predicate rows
    ],
)
def test_dv_delete_equals_cow_delete(spark, tmp_path, cond):
    # merge-on-read and copy-on-write must reach the same visible state
    # for ANY predicate — the DV bookkeeping equivalence property
    import hashlib

    h = hashlib.md5(cond.encode()).hexdigest()[:6]
    a = _mk(spark, tmp_path, name=f"pa{h}")
    b = _mk(spark, tmp_path, name=f"pb{h}")
    a.delete_where(F.expr(cond))
    b.delete_where(F.expr(cond), deletion_vectors=False)
    assert sorted(map(tuple, a.read().collect())) == sorted(
        map(tuple, b.read().collect())
    )


@_pytest.mark.parametrize(
    "cond", ["id < 100", "g = 3 AND id > 500", "id > 2000"]
)
def test_dv_update_equals_cow_update(spark, tmp_path, cond):
    import hashlib

    h = hashlib.md5(cond.encode()).hexdigest()[:6]
    a = _mk(spark, tmp_path, name=f"ua{h}")
    b = _mk(spark, tmp_path, name=f"ub{h}")
    assigns = {"g": "g + 1000", "id": "id * 2"}
    a.update_where(assigns, F.expr(cond))
    b.update_where(assigns, F.expr(cond), deletion_vectors=False)
    assert sorted(map(tuple, a.read().collect())) == sorted(
        map(tuple, b.read().collect())
    )


def test_concurrent_dv_deletes_first_writer_wins(spark, tmp_path):
    """The DV-path analog of the staged-write race: two delete_where
    calls racing for the same version — the loser's cleanup removes
    only ITS OWN dv dir, the winner's committed vector stays intact,
    and the loser's retry composes both deletes."""
    import pytest
    from databricks_data_warehouse_spark.sources.tables import (
        ConcurrentWriteError,
    )

    loc = str(tmp_path / "dvrace")
    t1 = _mk(spark, tmp_path, name="dvrace")
    t2 = ManagedTable(spark, "dvrace", loc)

    # interleave just before t1's manifest claim (its target version
    # is already fixed): t2 commits a full DV delete for that version
    orig = t1._read_txn
    fired = {}

    def hook(version):
        if not fired:
            fired["x"] = 1
            t2.delete_where(F.col("id") < 5)
        return orig(version)

    t1._read_txn = hook
    with pytest.raises(ConcurrentWriteError):
        t1.delete_where(F.col("id").isin([100, 101]))
    fresh = ManagedTable(spark, "dvrace", loc)
    assert fresh.read().count() == 995  # winner's delete intact
    assert fresh.read().filter("id < 5").count() == 0
    # retry lands on top of the winner's version
    fresh.delete_where(F.col("id").isin([100, 101]))
    assert fresh.read().count() == 993
    assert fresh.read().filter("id IN (100, 101)").count() == 0
