"""Row tracking (delta.enableRowTracking): durable per-row ids —
fresh rows mint from a monotone watermark (manifest file→base map,
id = base + position), DV deletes leave survivors' ids untouched,
and maintenance rewrites (OPTIMIZE / ZORDER / CLUSTER) MATERIALIZE
the ids into the rewritten files so they survive the move."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name):
    t = ManagedTable(spark, name, str(tmp_path / name))
    t.overwrite(
        spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        )
    )
    t.set_properties({"delta.enableRowTracking": "true"})
    return t


def _ids(t):
    return {
        r["k"]: r["_row_id"] for r in t.read_with_row_ids().collect()
    }


def test_row_ids_unique_and_monotone_across_appends(spark, tmp_path):
    t = _mk(spark, tmp_path, "rt1")
    # pre-tracking rows have no bases: enabling tracking mid-life
    # assigns ids on the NEXT rewrite; simplest here — compact once
    t.compact()
    ids0 = _ids(t)
    assert len(set(ids0.values())) == 100  # unique
    t.append(
        spark.range(100, 120).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        )
    )
    ids1 = _ids(t)
    assert len(set(ids1.values())) == 120
    # old rows keep their ids; new rows mint strictly above
    assert all(ids1[k] == v for k, v in ids0.items())
    new_ids = {v for k, v in ids1.items() if k >= 100}
    assert min(new_ids) > max(ids0.values()) - 1


def test_row_ids_survive_dv_delete(spark, tmp_path):
    t = _mk(spark, tmp_path, "rt2")
    t.compact()
    before = _ids(t)
    t.delete_where(F.col("k") % 10 == 0)  # merge-on-read
    after = _ids(t)
    assert set(after) == {k for k in before if k % 10 != 0}
    assert all(after[k] == before[k] for k in after)


def test_row_ids_survive_optimize_and_zorder(spark, tmp_path):
    t = _mk(spark, tmp_path, "rt3")
    t.compact()
    before = _ids(t)
    # fragment with small appends, then bin-pack
    for lo in (100, 110, 120):
        t.append(
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k"), (F.col("id") % 5).alias("g")
            )
        )
    mid = _ids(t)
    assert all(mid[k] == v for k, v in before.items())
    t.optimize(min_small_files=2)
    after = _ids(t)
    assert after == mid  # ids moved WITH the rows
    # the rewritten files carry materialized ids (no base entries)
    rb, mat, _ = t._read_row_base(t.current_version())
    stats = t._read_stats(t.current_version())
    assert set(rb) < set(stats) or rb == {}  # some files id-in-data
    t.compact(zorder_by=["k", "g"])
    assert _ids(t) == after


def test_row_ids_survive_cluster(spark, tmp_path):
    t = ManagedTable(
        spark, "rt4", str(tmp_path / "rt4"), cluster_by=["k"]
    ) if "cluster_by" in ManagedTable.__init__.__code__.co_varnames else None
    if t is None:
        pytest.skip("no cluster_by ctor")
    t.overwrite(
        spark.range(0, 80).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
    )
    t.set_properties({"delta.enableRowTracking": "true"})
    t.compact()
    before = _ids(t)
    t.append(
        spark.range(80, 90).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
    )
    t.cluster()
    after = _ids(t)
    assert all(after[k] == v for k, v in before.items())


def test_row_ids_restore_and_truncate_watermark(spark, tmp_path):
    t = _mk(spark, tmp_path, "rt5")
    t.compact()
    v_ids = _ids(t)
    v = t.current_version()
    t.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        )
    )
    high_after_append = max(_ids(t).values())
    t.restore(v)
    assert _ids(t) == v_ids  # ids came back with the snapshot
    t.append(
        spark.range(200, 202).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        )
    )
    # rolled-back ids are never re-minted
    fresh = {i for k, i in _ids(t).items() if k >= 200}
    assert min(fresh) > high_after_append - 1
    hi = max(_ids(t).values())
    t.truncate()
    t.append(
        spark.range(300, 302).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        )
    )
    assert min(_ids(t).values()) > hi - 1


def test_row_ids_preserved_through_merge_rewrite(spark, tmp_path):
    """Round 12 closes the r11 divergence: a MERGE's copy-on-write
    rewrite PRESERVES ids — carried rows keep theirs in-data, a source
    row replacing a matched key INHERITS that key's id, and fresh keys
    mint new ones (Delta row tracking's DML behavior)."""
    t = _mk(spark, tmp_path, "rt6")
    t.compact()
    before = _ids(t)
    t.merge_upsert(
        spark.createDataFrame([(5, 99), (200, 1)], "k long, g long"), ["k"]
    )
    after = _ids(t)
    assert after[5] == before[5]                     # matched key inherited
    assert all(after[k] == before[k] for k in before)  # carried rows kept
    assert after[200] not in before.values()         # fresh key minted
    ids = list(after.values())
    assert len(ids) == len(set(ids)) == 101


def test_row_ids_preserved_through_cow_update_delete(spark, tmp_path):
    """Copy-on-write UPDATE and DELETE materialize the surviving rows'
    ids into the rewritten files — every id stable, none re-minted."""
    t = _mk(spark, tmp_path, "rt7")
    before = _ids(t)
    t.update_where({"g": "g + 100"}, F.col("k") % 3 == 0,
                   deletion_vectors=False)
    assert _ids(t) == before
    t.delete_where(F.col("k") >= 90, deletion_vectors=False)
    assert _ids(t) == {k: v for k, v in before.items() if k < 90}


def test_row_ids_preserved_through_dv_update(spark, tmp_path):
    """Merge-on-read UPDATE: the replacement rows carry the matched
    rows' ids into the appended file; the old versions die via DV."""
    t = _mk(spark, tmp_path, "rt8")
    before = _ids(t)
    t.update_where({"g": "g + 1000"}, F.col("k") < 10)  # DV path
    after = _ids(t)
    assert after == before
    vals = {r["k"]: r["g"] for r in t.read().collect()}
    assert vals[0] == 1000 and vals[50] == 0


def test_row_ids_preserved_through_replace_where(spark, tmp_path):
    """replaceWhere: the straddling dirs' remainder keeps its ids
    in-data; the incoming region's rows mint fresh ones."""
    t = ManagedTable(
        spark, "rt9", str(tmp_path / "rt9"), partition_columns=["g"]
    )
    t.overwrite(
        spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("g")
        )
    )
    t.set_properties({"delta.enableRowTracking": "true"})
    t.append(spark.createDataFrame([(100, 9)], "k long, g long"))  # backfill
    before = _ids(t)
    t.replace_where(
        spark.createDataFrame([(777, 1)], "k long, g long"), [("g", "=", 1)]
    )
    after = _ids(t)
    untouched = {k: v for k, v in before.items() if k % 4 != 1 or k == 100}
    assert all(after[k] == untouched[k] for k in untouched)
    assert after[777] not in before.values()
    ids = list(after.values())
    assert len(ids) == len(set(ids))


def _vers(t):
    return {
        r["k"]: r["_row_commit_version"]
        for r in t.read_with_row_ids(with_commit_versions=True).collect()
    }


def test_row_commit_versions_lifecycle(spark, tmp_path):
    """Row tracking's second field (Delta row_commit_version): the
    version that last inserted or updated each row — backfilled at the
    enable commit, bumped by appends/updates/merges that touch the
    row, PRESERVED through maintenance rewrites and for untouched
    rows in DML rewrites."""
    t = _mk(spark, tmp_path, "rv1")          # v0 data, v1 enable
    assert set(_vers(t).values()) == {1}     # backfill at the enable
    t.append(spark.createDataFrame([(100, 0)], "k long, g long"))  # v2
    vers = _vers(t)
    assert vers[100] == 2 and vers[0] == 1
    t.optimize(min_small_files=1)            # v3: maintenance
    assert _vers(t) == vers                  # versions survive the move
    t.update_where({"g": "g + 1"}, F.col("k") % 2 == 0,
                   deletion_vectors=False)   # v4: CoW update
    v4 = _vers(t)
    assert v4[2] == 4 and v4[100] == 4       # matched rows bumped
    assert v4[1] == 1 and v4[3] == 1         # untouched rows preserved
    t.update_where({"g": "g + 1"}, F.col("k") == 3)  # v5: DV update
    v5 = _vers(t)
    assert v5[3] == 5 and v5[1] == 1
    t.merge_upsert(
        spark.createDataFrame([(1, 9), (200, 1)], "k long, g long"), ["k"]
    )                                        # v6: merge
    v6 = _vers(t)
    assert v6[1] == 6                        # matched key bumped...
    ids = _ids(t)
    assert v6[200] == 6                      # ...insert stamped
    assert v6[5] == 1 and v6[2] == 4         # kept rows preserved
    # ids stayed stable through every step above
    assert len(set(ids.values())) == len(ids)
    assert ids[1] is not None and ids[200] not in list(ids.values())[:0]


def test_row_commit_versions_cluster_and_replace_where(spark, tmp_path):
    t = ManagedTable(
        spark, "rv2", str(tmp_path / "rv2"), partition_columns=["g"]
    )
    t.overwrite(
        spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("g")
        )
    )                                        # v0
    t.set_properties({"delta.enableRowTracking": "true"})  # v1 backfill
    t.replace_where(
        spark.createDataFrame([(777, 1)], "k long, g long"), [("g", "=", 1)]
    )                                        # v2
    vers = _vers(t)
    assert vers[777] == 2                    # incoming region stamped
    assert vers[0] == 1 and vers[2] == 1     # untouched partition kept

def test_row_commit_versions_survive_restore(spark, tmp_path):
    """RESTORE brings row commit versions back with the snapshot (the
    manifest's row_ver map must be carried like row_base/row_mat —
    omitting it resolved every restored row to the 0 fallback)."""
    t = _mk(spark, tmp_path, "rv3")          # v0 data, v1 enable
    t.append(spark.createDataFrame([(100, 0)], "k long, g long"))  # v2
    before = _vers(t)
    assert before[100] == 2 and before[0] == 1
    t.update_where({"g": "g + 1"}, F.col("k") == 0,
                   deletion_vectors=False)   # v3 bumps k=0
    assert _vers(t)[0] == 3
    t.restore(2)                             # roll back the update
    after = _vers(t)
    assert after == before                   # versions restored exactly
    ids = _ids(t)
    assert len(set(ids.values())) == len(ids)  # ids intact too

def test_row_ids_unique_with_duplicate_key_merge_source(spark, tmp_path):
    """merge_upsert keeps every source row, including duplicate keys —
    but only ONE of a key's copies may inherit the matched target id;
    the rest must mint fresh ids, or the durable id materializes on
    multiple rows."""
    t = _mk(spark, tmp_path, "rvdup")
    t.merge_upsert(
        spark.createDataFrame(
            [(1, 111), (1, 222), (200, 1)], "k long, g long"
        ),
        ["k"],
    )
    ids = [r["_row_id"] for r in t.read_with_row_ids().collect()]
    assert len(set(ids)) == len(ids)  # globally unique, duplicates too


def test_row_ids_preserved_through_reorg_purge(spark, tmp_path):
    """Round 13: REORG PURGE was the last re-minting rewrite — the
    restaged files must now materialize every survivor's id (and
    commit version), Delta's preserve-by-materializing rule."""
    t = _mk(spark, tmp_path, "rt_reorg")
    t.compact()
    t.delete_where(F.col("k") % 10 == 0)  # merge-on-read: DVs only
    before = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in t.read_with_row_ids(with_commit_versions=True).collect()
    }
    v = t.reorg(0.01)  # every dir qualifies: purge all DVs
    assert v == t.current_version()
    dv, _n = t._read_dv(v)
    assert not dv  # DVs gone — rows physically dropped
    after = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in t.read_with_row_ids(with_commit_versions=True).collect()
    }
    assert after == before


def test_row_ids_through_merge_on_read_merge(spark, tmp_path):
    """Round 13: merge_clauses(deletion_vectors=True) — updated rows
    KEEP their ids (materialized into the appended rewrite), inserts
    mint fresh ones above the watermark, untouched rows' files are
    never rewritten."""
    t = _mk(spark, tmp_path, "rt_mor")
    t.compact()
    before = _ids(t)
    src = spark.createDataFrame(
        [(3, 99), (1000, 0)], "k long, g long"
    )
    t.merge_clauses(
        src,
        ["k"],
        matched=[(None, {"g": "src.g"})],
        not_matched=[(None, "insert_all")],
        deletion_vectors=True,
    )
    after = _ids(t)
    assert set(after) == set(before) | {1000}
    assert all(after[k] == before[k] for k in before)  # incl. updated k=3
    assert after[1000] > max(before.values())  # fresh mint, never reused
    g = {r["k"]: r["g"] for r in t.read().collect()}
    assert g[3] == 99 and g[1000] == 0
