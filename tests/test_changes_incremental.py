"""Incremental Change-Data-Feed: when versions evolved by append / DV
delete / DV update only, ``changes()`` must diff manifests and DV
position sets — O(changed rows) — instead of two full-table EXCEPT
ALLs, and must return exactly what the full diff returns.
"""

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="cdf", rows=100):
    t = ManagedTable(spark, name, str(tmp_path / name))
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    t.overwrite(df.repartitionByRange(4, "k"))
    return t


def _full_diff(t, v_from, v_to):
    old, new = t.read(v_from), t.read(v_to)
    return sorted(
        [(*r, "insert") for r in new.exceptAll(old).collect()]
        + [(*r, "delete") for r in old.exceptAll(new).collect()]
    )


def _got(t, v_from, v_to=None):
    return sorted(map(tuple, t.changes(v_from, v_to).collect()))


def test_dv_delete_changes_incremental(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where(F.expr("k < 7"))
    got = _got(t, 0)
    assert t.last_changes_strategy == "incremental"
    assert got == _full_diff(t, 0, 1)
    assert len(got) == 7 and all(r[-1] == "delete" for r in got)


def test_append_changes_incremental(spark, tmp_path):
    t = _mk(spark, tmp_path, "ap")
    t.append(
        spark.createDataFrame([(1000, 0, 1.5)], "k long, g long, v double")
    )
    got = _got(t, 0)
    assert t.last_changes_strategy == "incremental"
    assert got == [(1000, 0, 1.5, "insert")]


def test_dv_update_changes_incremental(spark, tmp_path):
    t = _mk(spark, tmp_path, "up")
    t.update_where({"v": "v + 0.25"}, F.expr("k IN (3, 4)"))
    got = _got(t, 0)
    assert t.last_changes_strategy == "incremental"
    assert got == _full_diff(t, 0, 1)
    assert {r[-1] for r in got} == {"insert", "delete"}
    assert len(got) == 4


def test_append_then_delete_of_appended_rows_nets_out(spark, tmp_path):
    # rows inserted AND deleted inside the window were visible at
    # neither endpoint: the feed must show only the survivors and the
    # deletes of ORIGINAL rows
    t = _mk(spark, tmp_path, "net", rows=10)
    t.append(
        spark.createDataFrame(
            [(100, 0, 1.0), (101, 0, 2.0)], "k long, g long, v double"
        )
    )
    t.delete_where(F.expr("k = 100 OR k = 5"))
    got = _got(t, 0)
    assert t.last_changes_strategy == "incremental"
    assert got == _full_diff(t, 0, 2)
    assert got == [(5, 0, 5.0, "delete"), (101, 0, 2.0, "insert")]


def test_restore_within_dv_history_resurrects(spark, tmp_path):
    t = _mk(spark, tmp_path, "res", rows=10)
    t.delete_where(F.expr("k < 3"))  # v1
    t.restore(0)  # v2: same entries, DV set reverts to empty
    got = _got(t, 1, 2)
    assert t.last_changes_strategy == "incremental"
    assert got == _full_diff(t, 1, 2)
    assert len(got) == 3 and all(r[-1] == "insert" for r in got)


def test_rewrite_falls_back_to_full_diff(spark, tmp_path):
    t = _mk(spark, tmp_path, "rw", rows=10)
    t.overwrite(
        spark.createDataFrame([(999, 0, 9.0)], "k long, g long, v double")
    )
    got = _got(t, 0)
    assert t.last_changes_strategy == "diff"
    assert len(got) == 11  # 10 deletes + 1 insert


def test_noop_window_is_empty(spark, tmp_path):
    t = _mk(spark, tmp_path, "nop", rows=10)
    assert _got(t, 0, 0) == []
    assert t.last_changes_strategy == "incremental"


def test_changes_by_version_attribution(spark, tmp_path):
    t = _mk(spark, tmp_path, "attr", rows=10)
    t.append(
        spark.createDataFrame([(100, 0, 1.0)], "k long, g long, v double")
    )  # v1
    t.delete_where(F.expr("k < 2"))  # v2 (DV)
    t.update_where({"v": "v + 0.5"}, F.expr("k = 5"))  # v3 (DV + append)
    feed = t.changes_by_version(0)
    rows = {(r["k"], r["_change_type"], r["_commit_version"]) for r in feed.collect()}
    assert (100, "insert", 1) in rows
    assert (0, "delete", 2) in rows and (1, "delete", 2) in rows
    assert (5, "delete", 3) in rows and (5, "insert", 3) in rows
    assert len(rows) == 5
    # timestamps are the commit instants, non-decreasing in version
    ts = {
        r["_commit_version"]: r["_commit_timestamp"] for r in feed.collect()
    }
    assert ts[1] <= ts[2] <= ts[3]
    # per-pair sum equals the two-endpoint diff content-wise (update's
    # delete+insert of the SAME row collapses in the 0..3 endpoint diff
    # only if values were equal — here they differ, so both remain)
    flat = sorted(
        (r["k"], r["_change_type"]) for r in t.changes(0).collect()
    )
    assert sorted((k, c) for k, c, _v in rows) == flat


def test_changes_by_version_empty_window(spark, tmp_path):
    t = _mk(spark, tmp_path, "attr0", rows=3)
    assert t.changes_by_version(0, 0).count() == 0


def test_touched_dirs_cover_every_dv_delta_dir(spark, tmp_path):
    """ADVICE r15: _changes_incremental derives the content-fetch dir
    set ON THE DRIVER from the DV mappings, relying on the invariant
    that a file's position set can only change when its dv-dir
    reference changes (dv dirs are immutable once written). If a
    writer ever rewrote a dv dir in place, deletes/restores would be
    silently DROPPED from the feed. Pin the invariant: across a
    DV-evolving history, every (file, pos) delta's carried-over dir
    must be a member of the driver-computed touched set."""
    t = _mk(spark, tmp_path, "inv")
    t.delete_where(F.expr("k < 7"))                       # v1: DV delete
    t.update_where({"v": "v + 0.5"}, F.expr("k IN (8, 9)"))  # v2: DV update
    t.delete_where(F.expr("k = 50"))                      # v3: second delete
    for v_from in range(0, 3):
        v_to = v_from + 1
        old_e = t._read_manifest(v_from)
        dv_old, _ = t._read_dv(v_from)
        dv_new, _ = t._read_dv(v_to)
        old_dir_set = set(old_e.values())

        def touched(changed_keys):
            dirs = {k.rsplit("/", 1)[0] for k in changed_keys if "/" in k}
            return {d for d in dirs if d in old_dir_set}

        changed_new = [f for f, d in dv_new.items() if dv_old.get(f) != d]
        changed_old = [f for f, d in dv_old.items() if dv_new.get(f) != d]
        # the actual position-set delta, computed exhaustively from the
        # DV parquet (what the semi-join fetches content for)
        import pyarrow.parquet as pq
        import os

        def positions(dv):
            out = {}
            for f, d in dv.items():
                p = d if os.path.isabs(d) else os.path.join(t.location, d)
                tb = pq.read_table(p, filters=[("file", "==", f)])
                out[f] = set(tb.column("pos").to_pylist())
            return out

        po, pn = positions(dv_old), positions(dv_new)
        delta_files = {
            f
            for f in set(po) | set(pn)
            if po.get(f, set()) != pn.get(f, set())
            and f.rsplit("/", 1)[0] in old_dir_set
        }
        got = touched(changed_new) | touched(changed_old)
        need = {f.rsplit("/", 1)[0] for f in delta_files}
        assert need <= got, (v_from, need - got)
