"""RESTORE / SHALLOW CLONE / CHECK constraints — the Delta table-admin
surface (Delta RESTORE TABLE, CREATE TABLE … SHALLOW CLONE, ALTER TABLE
ADD CONSTRAINT) over the manifest-MVCC ManagedTable."""

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, amt double")


def test_restore_moves_history_forward(spark, tmp_path):
    t = ManagedTable(spark, "r", str(tmp_path / "r"))
    t.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))      # v0
    t.merge_upsert(_df(spark, [(2, "BAD", -9.0)]), key_columns=["id"])  # v1
    assert {r.v for r in t.read().collect()} == {"a", "BAD"}
    v = t.restore(0)                                             # v2 == v0
    assert v == 2
    assert sorted((r.id, r.v) for r in t.read().collect()) == [(1, "a"), (2, "b")]
    # the bad version stays inspectable (history moves forward)
    assert {r.v for r in t.read(1).collect()} == {"a", "BAD"}
    # restore carries stats: pruning still proves emptiness
    assert t.skipping_report([("id", ">", 100)])["files_kept"] == 0


def test_restore_reverts_evolved_schema(spark, tmp_path):
    """RESTORE replays the restored version's METADATA including its
    schema (Delta's RestoreTableCommand does the same) — rolling back
    across a schema evolution or a CREATE OR REPLACE returns the old
    shape, and a fresh handle sees it too."""
    t = ManagedTable(spark, "re", str(tmp_path / "re"))
    t.overwrite(_df(spark, [(1, "a", 1.0)]))
    t.merge_insert_only(
        spark.createDataFrame([(9, "z", 3.0, "x@y")], "id long, v string, amt double, email string"),
        merge_schema=True,
    )
    t.restore(0)
    df = t.read()
    assert df.columns == ["id", "v", "amt"]
    assert df.count() == 1
    reopened = ManagedTable(spark, "re", t.location)
    assert [f.name for f in reopened.schema.fields] == ["id", "v", "amt"]
    # the evolution can be replayed on top of the restored state
    t.merge_insert_only(
        spark.createDataFrame(
            [(9, "z", 3.0, "x@y")],
            "id long, v string, amt double, email string",
        ),
        merge_schema=True,
    )
    assert t.read().columns == ["id", "v", "amt", "email"]


def test_shallow_clone_is_metadata_only_and_independent(spark, tmp_path):
    src = ManagedTable(spark, "src", str(tmp_path / "src"))
    src.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    clone = src.clone("dst", str(tmp_path / "dst"))
    assert sorted(clone.read().collect()) == sorted(src.read().collect())
    # no data files under the clone's location — manifest only
    import os
    assert not os.path.isdir(os.path.join(clone.location, "data"))
    # diverge: writes to the clone don't touch the source and vice versa
    clone.merge_insert_only(_df(spark, [(3, "c", 3.0)]))
    src.merge_insert_only(_df(spark, [(4, "d", 4.0)]))
    assert {r.id for r in clone.read().collect()} == {1, 2, 3}
    assert {r.id for r in src.read().collect()} == {1, 2, 4}
    # skipping works through the cloned absolute-path stats
    assert clone.skipping_report([("id", "=", 3)])["files_kept"] >= 1
    assert sorted(r.id for r in clone.scan([("id", "<", 3)]).collect()) == [1, 2]


def test_vacuum_on_clone_never_deletes_source_files(spark, tmp_path):
    src = ManagedTable(spark, "src2", str(tmp_path / "src2"))
    src.overwrite(_df(spark, [(1, "a", 1.0)]))
    clone = src.clone("dst2", str(tmp_path / "dst2"))
    # push the clone far enough ahead that v0's entries leave retention
    for i in range(2, 6):
        clone.overwrite(_df(spark, [(i, "x", float(i))]))
    clone.vacuum(keep=1)
    # source still fully readable — its files were never touched
    assert [r.id for r in src.read().collect()] == [1]
    assert [r.id for r in clone.read().collect()] == [5]


def test_clone_refuses_to_overwrite_existing_table(spark, tmp_path):
    src = ManagedTable(spark, "src3", str(tmp_path / "src3"))
    src.overwrite(_df(spark, [(1, "a", 1.0)]))
    src.clone("dst3", str(tmp_path / "dst3"))
    with pytest.raises(FileExistsError):
        src.clone("dst3", str(tmp_path / "dst3"))


def test_check_constraint_blocks_bad_writes_atomically(spark, tmp_path):
    t = ManagedTable(spark, "c", str(tmp_path / "c"))
    t.overwrite(_df(spark, [(1, "a", 5.0)]))
    t.add_constraint("amt_positive", "amt > 0")
    t.add_constraint("v_nonempty", "length(v) > 0")
    v_before = t.current_version()
    with pytest.raises(ValueError, match="amt_positive"):
        t.merge_insert_only(_df(spark, [(2, "b", -1.0)]))
    # aborted transaction: no version committed, table unchanged
    assert t.current_version() == v_before
    assert [r.id for r in t.read().collect()] == [1]
    # a clean write still goes through
    t.merge_insert_only(_df(spark, [(3, "c", 7.0)]))
    assert sorted(r.id for r in t.read().collect()) == [1, 3]


def test_check_constraint_null_passes(spark, tmp_path):
    t = ManagedTable(spark, "cn", str(tmp_path / "cn"))
    t.overwrite(_df(spark, [(1, "a", 5.0)]))
    t.add_constraint("amt_positive", "amt > 0")
    # SQL CHECK: NULL predicate passes (only FALSE violates)
    t.merge_insert_only(
        spark.createDataFrame([(2, "b", None)], "id long, v string, amt double")
    )
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = ManagedTable(spark, "cv", str(tmp_path / "cv"))
    t.overwrite(_df(spark, [(1, "a", -5.0)]))
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint("amt_positive", "amt > 0")
    # constraint was NOT installed
    assert "amt_positive" not in t.constraints
    t2 = ManagedTable(spark, "cv", t.location)
    assert t2.constraints == {}


def test_constraints_persist_and_clone_inherits(spark, tmp_path):
    t = ManagedTable(spark, "cp", str(tmp_path / "cp"))
    t.overwrite(_df(spark, [(1, "a", 5.0)]))
    t.add_constraint("amt_positive", "amt > 0")
    # fresh handle reloads from disk
    t2 = ManagedTable(spark, "cp", t.location)
    assert t2.constraints == {"amt_positive": "amt > 0"}
    clone = t.clone("cp2", str(tmp_path / "cp2"))
    with pytest.raises(ValueError, match="amt_positive"):
        clone.merge_insert_only(_df(spark, [(2, "b", -1.0)]))
    t.drop_constraint("amt_positive")
    assert ManagedTable(spark, "cp", t.location).constraints == {}


def test_txn_watermark_commits_with_data(spark, tmp_path):
    t = ManagedTable(spark, "tx", str(tmp_path / "tx"))
    t.overwrite(_df(spark, [(1, "a", 1.0)]))
    assert t.last_txn("app") == -1
    t.merge_upsert(_df(spark, [(2, "b", 2.0)]), key_columns=["id"],
                   txn=("app", 0))
    assert t.last_txn("app") == 0
    t.merge_upsert(_df(spark, [(3, "c", 3.0)]), key_columns=["id"],
                   txn=("app", 1))
    assert t.last_txn("app") == 1
    # watermark is snapshot-scoped: the pre-txn version reads -1
    assert int(t._read_txn(1).get("app", -1)) == 0
    # survives a restore (forward-moving)
    t.restore(1)
    assert t.last_txn("app") == 1
    # other writes carry the watermark untouched
    t.merge_insert_only(_df(spark, [(9, "z", 9.0)]))
    assert t.last_txn("app") == 1


def test_stream_gold_aggregate_is_exactly_once_additive(spark, tmp_path):
    from databricks_data_warehouse_spark.streaming import (
        stream_gold_aggregate,
    )

    src = str(tmp_path / "land")
    rows = [
        (i, f"t{i % 2}", float(i))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    import datetime as _dt
    df = df.withColumn(
        "ts",
        F.lit(_dt.datetime(2024, 1, 1)) + F.make_interval(hours=F.col("event_id") % 48),
    )
    df.coalesce(2).write.parquet(src)
    table = ManagedTable(spark, "g", str(tmp_path / "g"))
    stream_gold_aggregate(spark, src, table, str(tmp_path / "ck1"))
    first = {
        (r.event_type, r.day): (r.n_events, r.value_cents)
        for r in table.read().collect()
    }
    # exact totals: additive merging across micro-batches reconstructs
    # the global aggregate
    exp = {
        (r.event_type, r.day): (r.n, r.c)
        for r in df.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"),
             F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("c"))
        .collect()
    }
    assert first == exp
    # full re-drain from a FRESH checkpoint: every batch replays, the
    # txn watermarks skip them all — no double-add, version unchanged
    v = table.current_version()
    stream_gold_aggregate(spark, src, table, str(tmp_path / "ck2"))
    assert table.current_version() == v
    second = {
        (r.event_type, r.day): (r.n_events, r.value_cents)
        for r in table.read().collect()
    }
    assert second == first


def test_concurrent_commit_first_writer_wins(spark, tmp_path):
    """Optimistic concurrency (Delta ConcurrentAppendException parity):
    two handles race to commit the same next version — the loser raises,
    discards its staged files, and the table holds exactly the winner's
    rows."""
    import os
    from databricks_data_warehouse_spark.sources.tables import (
        ConcurrentWriteError,
    )

    loc = str(tmp_path / "cc")
    t1 = ManagedTable(spark, "cc", loc)
    t1.overwrite(_df(spark, [(1, "a", 1.0)]))
    t2 = ManagedTable(spark, "cc", loc)
    # writer 2 commits version 1 first
    t2.merge_insert_only(_df(spark, [(2, "b", 2.0)]))
    # writer 1 still believes current=0 and tries to claim version 1:
    # simulate by calling its stage path directly against the stale view
    stale_next = t1._manifest_path(1)
    assert os.path.exists(stale_next)
    with pytest.raises(ConcurrentWriteError):
        t1._write_manifest(1, {}, {}, {})
    # winner's state intact; loser's retry against the NEW version works
    t1b = ManagedTable(spark, "cc", loc)
    t1b.merge_insert_only(_df(spark, [(3, "c", 3.0)]))
    assert sorted(r.id for r in t1b.read().collect()) == [1, 2, 3]
    # no stray tmp files
    assert not [f for f in os.listdir(loc) if ".tmp." in f]


def test_constraint_survives_empty_overwrite(spark, tmp_path):
    """A zero-row write has nothing to violate — and an empty staged
    dir has no schema to infer; enforcement must not crash on it."""
    t = ManagedTable(spark, "ce", str(tmp_path / "ce"))
    t.overwrite(_df(spark, [(1, "a", 5.0)]))
    t.add_constraint("amt_positive", "amt > 0")
    t.overwrite(_df(spark, []).filter("1=0"))
    assert t.read().count() == 0
    # and the constraint still bites on the next real write
    with pytest.raises(ValueError, match="amt_positive"):
        t.overwrite(_df(spark, [(2, "b", -1.0)]))


def test_history_records_operations(spark, tmp_path):
    """DESCRIBE HISTORY parity: every version records what produced it."""
    t = ManagedTable(spark, "h", str(tmp_path / "h"))
    t.overwrite(_df(spark, [(1, "a", 1.0)]))                       # v0 WRITE
    t.merge_insert_only(_df(spark, [(2, "b", 2.0)]))               # v1 MERGE INSERT
    t.merge_upsert(_df(spark, [(2, "B", 2.5)]), key_columns=["id"])  # v2
    t.merge_delete(_df(spark, [(1, "a", 1.0)]), key_columns=["id"])  # v3
    t.compact(zorder_by=["id", "amt"])                             # v4
    t.restore(2)                                                   # v5
    ops = {h["version"]: h["operation"] for h in t.history()}
    assert ops[0] == "WRITE"
    assert ops[1] == "MERGE INSERT"
    assert ops[2] == "MERGE UPSERT"
    assert ops[3] == "MERGE DELETE (DV)"
    assert ops[4] == "OPTIMIZE ZORDER"
    assert ops[5] == "RESTORE v2"
    clone = t.clone("h2", str(tmp_path / "h2"))
    assert clone.history()[0]["operation"] == "CLONE h"


def test_concurrent_full_merges_never_corrupt_winner(spark, tmp_path):
    """ADVICE r06 (high): two writers racing FULL merges for the same
    version number must not share a staging directory — before the
    writer-unique staging root, the loser's cleanup deleted the very
    files the winner's committed manifest referenced."""
    from databricks_data_warehouse_spark.sources.tables import (
        ConcurrentWriteError,
    )

    loc = str(tmp_path / "race")
    t1 = ManagedTable(spark, "race", loc)
    t1.overwrite(_df(spark, [(1, "a", 1.0)]))
    t2 = ManagedTable(spark, "race", loc)

    # interleave: t1 stages its files, then t2 runs a FULL stage+commit
    # for the same version number, then t1 resumes and loses the claim
    orig = t1._collect_file_stats
    fired = {}

    def hook(write_dir):
        if not fired:
            fired["x"] = 1
            t2.merge_insert_only(_df(spark, [(2, "b", 2.0)]))
        return orig(write_dir)

    t1._collect_file_stats = hook
    with pytest.raises(ConcurrentWriteError):
        t1.merge_insert_only(_df(spark, [(3, "c", 3.0)]))
    # the winner's committed version reads back intact — the loser's
    # cleanup removed only its own staging dir
    fresh = ManagedTable(spark, "race", loc)
    assert sorted(r.id for r in fresh.read().collect()) == [1, 2]
    # loser's retry against the new current version lands cleanly
    fresh.merge_insert_only(_df(spark, [(3, "c", 3.0)]))
    assert sorted(r.id for r in fresh.read().collect()) == [1, 2, 3]


def test_constraints_are_versioned_and_restored(spark, tmp_path):
    """ADVICE r06 (low): the constraint set is part of the committed
    manifest — add/drop create versions, DESCRIBE HISTORY records them,
    and RESTORE restores the set of the restored version."""
    import os

    t = ManagedTable(spark, "cvr", str(tmp_path / "cvr"))
    t.overwrite(_df(spark, [(1, "a", 5.0)]))           # v0
    t.add_constraint("amt_positive", "amt > 0")        # v1
    t.drop_constraint("amt_positive")                  # v2
    ops = {h["version"]: h["operation"] for h in t.history()}
    assert ops[1] == "ADD CONSTRAINT amt_positive"
    assert ops[2] == "DROP CONSTRAINT amt_positive"
    # no side file: the set lives in the versioned manifest
    assert not os.path.exists(t._constraints_path)
    # RESTORE to the constrained version brings the constraint back
    t.restore(1)                                       # v3 == v1
    assert t.constraints == {"amt_positive": "amt > 0"}
    assert ManagedTable(spark, "cvr", t.location).constraints == {
        "amt_positive": "amt > 0"
    }
    with pytest.raises(ValueError, match="amt_positive"):
        t.merge_insert_only(_df(spark, [(2, "b", -1.0)]))
    # restore to the dropped-constraint version lifts it again
    t.restore(2)
    assert t.constraints == {}
    t.merge_insert_only(_df(spark, [(2, "b", -1.0)]))


def test_constraint_add_race_detects_with_data_write(spark, tmp_path):
    """A write staged BEFORE a concurrent ADD CONSTRAINT commits cannot
    slip in unvalidated: both target the same version number, the write
    loses the claim, and its retry enforces the new constraint."""
    from databricks_data_warehouse_spark.sources.tables import (
        ConcurrentWriteError,
    )

    loc = str(tmp_path / "ccr")
    t1 = ManagedTable(spark, "ccr", loc)
    t1.overwrite(_df(spark, [(1, "a", 1.0)]))
    t2 = ManagedTable(spark, "ccr", loc)
    orig = t1._collect_file_stats
    fired = {}

    def hook(write_dir):
        if not fired:
            fired["x"] = 1
            t2.add_constraint("amt_positive", "amt > 0")
        return orig(write_dir)

    t1._collect_file_stats = hook
    with pytest.raises(ConcurrentWriteError):
        t1.merge_insert_only(_df(spark, [(2, "b", -2.0)]))
    # the retry re-reads the winner's constraint set and aborts
    with pytest.raises(ValueError, match="amt_positive"):
        t1.merge_insert_only(_df(spark, [(2, "b", -2.0)]))
    assert sorted(r.id for r in t1.read().collect()) == [1]


def test_crashed_writer_tmp_files_dont_break_admin(spark, tmp_path):
    # a writer that died between writing its manifest tmp and linking
    # leaves `…tmp.<pid>` files; listing-based admin (history, vacuum,
    # timestamp travel) must skip them, not crash on int()
    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    t = ManagedTable(spark, "crashy", str(tmp_path / "crashy"))
    t.overwrite(spark.range(0, 10).select(F.col("id")))
    t.overwrite(spark.range(0, 10).select(F.col("id")))
    import os

    # exact shape _write_manifest stages: <manifest path>.tmp.<pid>
    open(
        os.path.join(t.location, "_MANIFEST.v=2.tmp.12345"), "w"
    ).write("{}")
    assert [h["version"] for h in t.history()] == [1, 0]
    assert t.version_at_timestamp(2_000_000_000) == 1
    t.vacuum(keep=1)
    assert t.read().count() == 10
    t.vacuum(retain_hours=0.0)
    assert t.read().count() == 10


def test_vacuum_dry_run_predicts_exactly(spark, tmp_path):
    import os
    import shutil as _sh

    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
    from databricks_data_warehouse_spark.sources.tables import ManagedTable
    from pyspark.sql import functions as F

    t = ManagedTable(spark, "vdr", str(tmp_path / "vdr"))
    for i in range(4):
        t.overwrite(spark.range(10 * (i + 1)).select(F.col("id").alias("k")))
    predicted = t.vacuum_dry_run(keep=1)
    assert predicted  # three superseded versions' dirs
    for rel in predicted:  # dry run touched nothing
        assert os.path.isdir(os.path.join(t.location, rel))
    s = SqlSession(spark)
    s.register(t)
    sql_paths = sorted(
        r.path for r in s.sql("VACUUM vdr RETAIN 1 VERSIONS DRY RUN").collect()
    )
    assert sql_paths == predicted
    t.vacuum(keep=1)
    for rel in predicted:  # the real vacuum deleted exactly those
        assert not os.path.isdir(os.path.join(t.location, rel))
    assert t.read().count() == 40


def test_fsck_repair_drops_missing_dirs(spark, tmp_path):
    import os
    import shutil as _sh

    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
    from databricks_data_warehouse_spark.sources.tables import ManagedTable
    from pyspark.sql import functions as F

    t = ManagedTable(
        spark, "fsck", str(tmp_path / "fsck"), partition_columns=["g"]
    )
    t.overwrite(
        spark.range(90).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
    )
    # someone deletes one partition's dir out-of-band
    ents = t._read_manifest(t.current_version())
    victim = sorted(ents.values())[0]
    _sh.rmtree(os.path.join(t.location, victim))
    dry = t.repair(dry_run=True)
    assert dry["missing"] == [victim]
    assert t.current_version() == 0  # dry run commits nothing
    res = t.repair()
    assert res["missing"] == [victim] and res["version"] == 1
    assert t.read().count() == 60  # the two surviving partitions
    assert t.repair()["missing"] == []  # idempotent
    hist_ops = [h["operation"] for h in t.history()]
    assert any(op.startswith("FSCK REPAIR") for op in hist_ops)
    s = SqlSession(spark)
    s.register(t)
    assert s.sql("FSCK REPAIR TABLE fsck DRY RUN").count() == 0


def test_auto_compact_bounds_small_files(spark, tmp_path):
    """r09: Databricks autoOptimize.autoCompact parity — a table with
    auto_compact on bin-packs any partition that crosses the
    small-file threshold in a follow-up OPTIMIZE commit, so streaming
    micro-batch appends can't accumulate unbounded file counts."""
    import glob

    from pyspark.sql import functions as F

    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    t = ManagedTable(
        spark,
        "ac",
        str(tmp_path / "ac"),
        auto_compact=True,
        auto_compact_min_files=5,
    )
    for i in range(7):
        t.append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("k"), (F.col("id") % 3).alias("g")
            ).coalesce(1)
        )
    # contents intact
    assert sorted(r.k for r in t.read().collect()) == list(range(70))
    # the live manifest references few files (compaction fired)
    kept, legacy, total, _r, _rk, _b = t._prune([], None)
    assert total <= 4, f"auto-compact should bound files, saw {total}"
    # history shows OPTIMIZE commits interleaved with the appends
    ops = [h["operation"] for h in t.history()]
    assert any(o.startswith("OPTIMIZE") for o in ops)


def test_auto_compact_off_by_default(spark, tmp_path):
    from pyspark.sql import functions as F

    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    t = ManagedTable(spark, "nac", str(tmp_path / "nac"))
    for i in range(6):
        t.append(
            spark.range(i * 5, i * 5 + 5).select(
                F.col("id").alias("k")
            ).coalesce(1)
        )
    kept, legacy, total, _r, _rk, _b = t._prune([], None)
    assert total == 6  # one file per append, untouched


def test_truncate_metadata_only_and_restorable(spark, tmp_path):
    from pyspark.sql import functions as F

    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    t = ManagedTable(spark, "tt", str(tmp_path / "tt"))
    t.overwrite(spark.range(100).select(F.col("id").alias("k")))
    import glob
    import os

    inodes = {
        p: os.stat(p).st_ino
        for p in glob.glob(t.location + "/data/**/*.parquet", recursive=True)
    }
    v = t.truncate()
    assert t.read().count() == 0
    assert t.history()[0]["operation"] == "TRUNCATE"
    # metadata-only: no data file was touched or deleted yet
    for p, ino in inodes.items():
        assert os.stat(p).st_ino == ino
    # time travel / restore bring the rows back
    assert t.read(version=v - 1).count() == 100
    t.restore(v - 1)
    assert t.read().count() == 100


def test_sql_truncate_and_drop(spark, tmp_path):
    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession

    sess = SqlSession(spark, base_location=str(tmp_path))
    sess.sql("CREATE TABLE dt (k BIGINT)")
    sess.sql("INSERT INTO dt VALUES (1), (2)")
    sess.sql("TRUNCATE TABLE dt")
    assert sess.sql("SELECT COUNT(*) AS n FROM dt").collect()[0]["n"] == 0
    loc = sess.table("dt").location
    sess.sql("DROP TABLE dt")
    import os

    assert not os.path.exists(loc)
    import pytest

    with pytest.raises(ValueError, match="no such table"):
        sess.sql("DROP TABLE dt")
    sess.sql("DROP TABLE IF EXISTS dt")  # no-op


def test_create_or_replace_table(spark, tmp_path):
    """REPLACE: new schema/partitioning/content in ONE commit, old
    metadata reset, history restorable."""
    import pytest

    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession

    sess = SqlSession(spark, base_location=str(tmp_path))
    sess.sql("CREATE TABLE rt (k BIGINT, v DOUBLE)")
    sess.sql("INSERT INTO rt VALUES (1, 1.0), (2, 2.0)")
    sess.sql("ALTER TABLE rt ADD CONSTRAINT pos CHECK (v >= 0)")
    sess.sql("ALTER TABLE rt SET TBLPROPERTIES ('owner' = 'a')")
    old = sess.table("rt")
    v_before = old.current_version()
    # replace with a different schema + CTAS content
    sess.sql(
        "CREATE OR REPLACE TABLE rt AS "
        "SELECT CAST(id AS STRING) AS name, id * -1 AS v FROM RANGE(3)"
    )
    t = sess.table("rt")
    assert sorted(r["name"] for r in t.read().collect()) == ["0", "1", "2"]
    # metadata reset: the old CHECK (v >= 0) must NOT bind (v is
    # negative in the new content) and properties are gone
    assert t.constraints == {} and t.properties == {}
    assert t.current_version() == v_before + 1  # history chains
    # restore undoes the replace entirely, old metadata included
    t.restore(v_before)
    assert t.constraints == {"pos": "v >= 0"}
    assert t.properties == {"owner": "a"}
    assert sorted(r["k"] for r in t.read().select("k").collect()) == [1, 2]


def test_create_or_replace_with_declarations(spark, tmp_path):
    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession

    sess = SqlSession(spark, base_location=str(tmp_path))
    sess.sql("CREATE TABLE rd (k BIGINT)")
    sess.sql("INSERT INTO rd VALUES (1)")
    sess.sql(
        "CREATE OR REPLACE TABLE rd "
        "(rid BIGINT GENERATED ALWAYS AS IDENTITY, s STRING) "
        "CLUSTER BY (s)"
    )
    t = sess.table("rd")
    assert t.cluster_by == ["s"]
    sess.sql("INSERT INTO rd (s) VALUES ('x'), ('y')")
    ids = sorted(r["rid"] for r in t.read().collect())
    assert ids == [1, 2]  # identity minted fresh from the new spec


def test_in_commit_timestamps_survive_mtime_disturbance(spark, tmp_path):
    """Round 11 (Delta ICT parity): TIMESTAMP AS OF / history anchor on
    the manifest's in-commit timestamp, not the file mtime — copying or
    touching log files must not re-date commits."""
    import os
    import time as _time

    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    loc = str(tmp_path / "ict")
    t = ManagedTable(spark, "ict", loc)
    t.overwrite(spark.createDataFrame([(1,)], "k long"))   # v0
    t0 = t._commit_time(0)
    _time.sleep(0.05)
    mid = _time.time()
    _time.sleep(0.05)
    t.append(spark.createDataFrame([(2,)], "k long"))      # v1
    # disturb every manifest's mtime (simulates rsync/restore)
    future = _time.time() + 10_000
    for entry in os.listdir(loc):
        if entry.startswith("_MANIFEST") or "manifest" in entry.lower():
            p = os.path.join(loc, entry)
            os.utime(p, (future, future))
    assert t.version_at_timestamp(mid) == 0     # mtimes lie; ts doesn't
    assert t.version_at_timestamp(_time.time()) == 1
    hist = {h["version"]: h["timestamp"] for h in t.history()}
    assert abs(hist[0] - t0) < 1e-6 and hist[0] < hist[1]
    # monotone clamp: v1's in-commit ts strictly after v0's
    assert t._commit_time(1) > t._commit_time(0)


def test_vacuum_removes_manifests_before_dirs_and_recovers_from_crash(
    spark, tmp_path, monkeypatch
):
    """Round-12 review: vacuum used to delete data dirs BEFORE their
    manifests, so a reader lagging at the retention edge os.walk'ed
    empty dirs into a silent empty batch (checkpointed, rows skipped
    forever). Manifests now leave first (tombstoned — lagging readers
    fail LOUDLY on the missing manifest), and a vacuum that crashes
    mid-sweep leaves tombstones the next vacuum folds in, so orphan
    data dirs never leak."""
    import glob
    import os
    import shutil as _sh

    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    t = ManagedTable(spark, "vx", str(tmp_path / "vx"))
    t.overwrite(spark.createDataFrame([(1,)], "k long"))      # v0
    v0_dirs = set(t._read_manifest(0).values())
    t.overwrite(spark.createDataFrame([(2,)], "k long"))      # v1: v0 dies
    t.append(spark.createDataFrame([(3,)], "k long"))         # v2

    # crash the FIRST dir removal: tombstones exist, dirs survive
    calls = {"n": 0}
    real_rmtree = _sh.rmtree

    def exploding(path, *a, **k):
        calls["n"] += 1
        raise OSError("simulated crash mid-vacuum")

    monkeypatch.setattr(
        "databricks_data_warehouse_spark.sources.tables.shutil.rmtree",
        exploding,
    )
    with pytest.raises(OSError):
        t.vacuum(keep=1)
    monkeypatch.setattr(
        "databricks_data_warehouse_spark.sources.tables.shutil.rmtree",
        real_rmtree,
    )
    assert glob.glob(str(tmp_path / "vx" / "._vm_*.json"))  # tombstoned
    # the old manifest is GONE: a lagging reader fails loudly
    with pytest.raises(FileNotFoundError):
        t._read_manifest(0)
    # the next vacuum folds the tombstones in and finishes the sweep
    t.vacuum(keep=1)
    assert not glob.glob(str(tmp_path / "vx" / "._vm_*.json"))
    for rel in v0_dirs - set(t._read_manifest(t.current_version()).values()):
        assert not os.path.exists(str(tmp_path / "vx" / rel))
    # table still reads correctly
    assert sorted(r.k for r in t.read().collect()) == [2, 3]
