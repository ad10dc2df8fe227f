"""Auto-Loader-shaped streaming COPY: the cloud_files discovery stream
drained through foreachBatch into ManagedTable.copy_into_files.
Exactly-once is owned by the COPY ledger, so checkpoint loss, full
re-delivery, and racing a batch COPY INTO all no-op."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable
from databricks_data_warehouse_spark.streaming.autoloader import (
    stream_copy_into,
)


def _land(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    ).coalesce(1).write.mode("append").parquet(path)


def _mk_table(spark, tmp_path, name):
    from pyspark.sql.types import LongType, StructField, StructType

    t = ManagedTable(spark, name, str(tmp_path / name))
    t.create_if_not_exists(
        StructType([StructField("k", LongType()), StructField("g", LongType())])
    )
    return t


def test_autoloader_ingests_then_increments(spark, tmp_path):
    src = str(tmp_path / "landing")
    _land(spark, src, 0, 10)
    t = _mk_table(spark, tmp_path, "al")
    r1 = stream_copy_into(spark, src, t, checkpoint_dir=str(tmp_path / "c1"))
    assert r1["rows_loaded"] == 10
    assert t.read().count() == 10
    # nothing new: same checkpoint resumes, loads nothing
    r2 = stream_copy_into(spark, src, t, checkpoint_dir=str(tmp_path / "c1"))
    assert r2["rows_loaded"] == 0
    # a new file lands -> exactly its rows ingest
    _land(spark, src, 10, 15)
    r3 = stream_copy_into(spark, src, t, checkpoint_dir=str(tmp_path / "c1"))
    assert r3["rows_loaded"] == 5
    assert sorted(r.k for r in t.read().collect()) == list(range(15))


def test_autoloader_checkpoint_loss_is_harmless(spark, tmp_path):
    """Delete the checkpoint between drains: every file re-delivers,
    the ledger re-diffs them to a no-op — table contents unchanged."""
    src = str(tmp_path / "landing2")
    _land(spark, src, 0, 8)
    t = _mk_table(spark, tmp_path, "al2")
    ckpt = str(tmp_path / "c2")
    stream_copy_into(spark, src, t, checkpoint_dir=ckpt)
    v = t.current_version()
    shutil.rmtree(ckpt)
    r = stream_copy_into(spark, src, t, checkpoint_dir=ckpt)
    assert r["rows_loaded"] == 0 and r["files_loaded"] == 0
    assert t.read().count() == 8
    assert t.current_version() == v  # no-op did not even commit


def test_autoloader_races_batch_copy_into(spark, tmp_path):
    """A batch COPY INTO that already claimed some files: the stream
    re-diffs and loads only the remainder."""
    src = str(tmp_path / "landing3")
    _land(spark, src, 0, 6)
    t = _mk_table(spark, tmp_path, "al3")
    t.copy_into(src)  # batch loads the first file(s)
    assert t.read().count() == 6
    _land(spark, src, 6, 9)
    r = stream_copy_into(spark, src, t, checkpoint_dir=str(tmp_path / "c3"))
    assert r["rows_loaded"] == 3  # only the post-batch file
    assert t.read().count() == 9


def test_cloud_files_reader_late_mtime_within_lookback(tmp_path):
    """Unit: a file whose mtime lags the watermark (out-of-order
    writer) is still delivered next batch when it is inside the
    lookback window and was absent from the start offset."""
    from databricks_data_warehouse_spark.sources.cloud_files import (
        CloudFilesStreamReader,
    )

    d = tmp_path / "lz"
    d.mkdir()
    f1 = d / "a.parquet"
    f1.write_bytes(b"x")
    r = CloudFilesStreamReader({"location": str(d), "lookbackNs": str(10**12)})
    o1 = r.latestOffset()
    [batch] = r.partitions(r.initialOffset(), o1)
    assert [os.path.basename(p) for p, _, _ in batch.files] == ["a.parquet"]
    # a second file written with an OLDER mtime than the watermark
    f2 = d / "b.parquet"
    f2.write_bytes(b"y")
    early = o1["wm"] - 500_000_000  # 0.5 s behind the watermark
    os.utime(f2, ns=(early, early))
    o2 = r.latestOffset()
    [batch2] = r.partitions(o1, o2)
    assert [os.path.basename(p) for p, _, _ in batch2.files] == ["b.parquet"]
    # and it is NOT re-delivered afterwards
    [batch3] = r.partitions(o2, r.latestOffset())
    assert batch3.files == []


def test_autoloader_reconcile_sweep_catches_backdated_file(spark, tmp_path):
    """VERDICT r09 item 4 done-criterion: a file landing with an mtime
    OLDER than watermark - lookback (beyond the incremental listing's
    miss window) still arrives via the STREAM — the reconcile sweep
    re-delivers the full listing and the ledger keeps it exactly-once."""
    src = str(tmp_path / "landing_bd")
    _land(spark, src, 0, 10)
    t = _mk_table(spark, tmp_path, "albd")
    r1 = stream_copy_into(
        spark, src, t, checkpoint_dir=str(tmp_path / "cbd")
    )
    assert r1["rows_loaded"] == 10
    # land a second file and back-date it WAY behind the watermark
    sub = str(tmp_path / "stage_bd")
    _land(spark, sub, 100, 105)
    import glob
    import shutil

    f = glob.glob(sub + "/*.parquet")[0]
    dst = os.path.join(src, "backdated.parquet")
    shutil.copy(f, dst)
    first = min(
        os.stat(p).st_mtime_ns for p in glob.glob(src + "/*.parquet")
    )
    early = first - 3_600_000_000_000  # an hour before everything
    os.utime(dst, ns=(early, early))
    # incremental-only drain (sweep disabled): the file is invisible
    r2 = stream_copy_into(
        spark, src, t, checkpoint_dir=str(tmp_path / "cbd"),
        reconcile_every=0,
    )
    assert r2["rows_loaded"] == 0
    # sweep-enabled drain: the stream itself converges
    r3 = stream_copy_into(
        spark, src, t, checkpoint_dir=str(tmp_path / "cbd"),
        reconcile_every=1,
    )
    assert r3["rows_loaded"] == 5
    assert t.read().count() == 15
    # and the sweep re-delivery stayed exactly-once
    r4 = stream_copy_into(
        spark, src, t, checkpoint_dir=str(tmp_path / "cbd"),
        reconcile_every=1,
    )
    assert r4["rows_loaded"] == 0


def test_cloud_files_reconcile_default_off(tmp_path):
    """ADVICE r10 (medium): the generic source must NOT sweep unless
    asked — only a deduplicating sink (the COPY ledger) can absorb the
    full-listing re-delivery."""
    from databricks_data_warehouse_spark.sources.cloud_files import (
        CloudFilesStreamReader,
    )

    d = tmp_path / "lz_def"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    r = CloudFilesStreamReader({"location": str(d)})
    assert r.reconcile_every == 0
    for _ in range(12):
        assert "sweep" not in r.latestOffset()


def test_cloud_files_first_trigger_sweeps(tmp_path):
    """ADVICE r10 (low): an availableNow drain runs 1-2 triggers, so
    the sweep must fire on the FIRST trigger of each run, not only
    every K-th."""
    from databricks_data_warehouse_spark.sources.cloud_files import (
        CloudFilesStreamReader,
    )

    d = tmp_path / "lz_first"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    r = CloudFilesStreamReader(
        {"location": str(d), "reconcileEvery": "10"}
    )
    assert r.latestOffset().get("sweep") is True   # trigger 1
    assert "sweep" not in r.latestOffset()          # trigger 2
    for _ in range(7):
        r.latestOffset()
    assert r.latestOffset().get("sweep") is True   # trigger 10


def test_cloud_files_sweep_respects_include_existing_floor(tmp_path):
    """ADVICE r10 (medium): with includeExisting=false, a reconcile
    sweep must not resurrect the pre-existing files the stream opted
    out of — the initial watermark is a floor for sweeps too."""
    from databricks_data_warehouse_spark.sources.cloud_files import (
        CloudFilesStreamReader,
    )

    d = tmp_path / "lz_floor"
    d.mkdir()
    pre = d / "pre.parquet"
    pre.write_bytes(b"x")
    old = os.stat(pre).st_mtime_ns - 10**13
    os.utime(pre, ns=(old, old))
    r = CloudFilesStreamReader(
        {
            "location": str(d),
            "includeExisting": "false",
            "reconcileEvery": "1",
            "lookbackNs": "0",
        }
    )
    o0 = r.initialOffset()
    assert o0["floor"] == o0["wm"]
    new = d / "new.parquet"
    new.write_bytes(b"y")
    later = o0["wm"] + 10**9
    os.utime(new, ns=(later, later))
    o1 = r.latestOffset()
    assert o1.get("sweep") is True
    [batch] = r.partitions(o0, o1)
    names = [os.path.basename(p) for p, _, _ in batch.files]
    assert names == ["new.parquet"]  # pre-existing file stays out
    # floor survives a simulated restart (fresh reader, checkpointed
    # offsets only): partitions() re-learns it from the start offset
    r2 = CloudFilesStreamReader(
        {
            "location": str(d),
            "includeExisting": "false",
            "reconcileEvery": "1",
            "lookbackNs": "0",
        }
    )
    [batch2] = r2.partitions(o1, {**r2.latestOffset(), "sweep": True})
    assert r2._floor == o0["wm"]
    assert "pre.parquet" not in [
        os.path.basename(p) for p, _, _ in batch2.files
    ]


def test_cloud_files_floor_survives_double_restart(tmp_path):
    """ADVICE r11 (medium): the engine's first latestOffset() after a
    restart runs BEFORE partitions() rehydrates the floor from the
    checkpointed start offset, so the WAL alone cannot carry the
    includeExisting=false floor safely (floor:0 there would let a
    sweep deliver every opted-out file; floor:-1 forever would
    disable sweeps for the stream's life on an unlucky double
    restart). The sidecar floor file closes both: initialOffset
    persists the floor next to the data, __init__ re-reads it, and
    restarts recover BEFORE their first offset — no unknown window,
    sweeps never degrade, opted-out files never re-enter."""
    from databricks_data_warehouse_spark.sources.cloud_files import (
        CloudFilesStreamReader,
    )

    d = tmp_path / "lz_floor2"
    d.mkdir()
    pre = d / "pre.parquet"
    pre.write_bytes(b"x")
    old = os.stat(pre).st_mtime_ns - 10**13
    os.utime(pre, ns=(old, old))
    opts = {
        "location": str(d),
        "includeExisting": "false",
        "reconcileEvery": "1",
        "lookbackNs": "0",
    }
    r1 = CloudFilesStreamReader(opts)
    o0 = r1.initialOffset()
    assert o0["floor"] == o0["wm"] > 0
    o1 = r1.latestOffset()
    r1.partitions(o0, o1)

    # restart 1: latestOffset fires before any partitions() call, but
    # the sidecar floor file already rehydrated the floor in __init__
    # — no unknown window, the WAL never carries -1
    r2 = CloudFilesStreamReader(opts)
    o2 = r2.latestOffset()
    assert o2["floor"] == o0["wm"]    # recovered before first offset
    assert o2.get("sweep") is True    # first-trigger sweep stays armed
    [swept] = r2.partitions(o1, o2)
    assert all(                       # floor excludes opted-out files
        os.path.basename(p) != "pre.parquet" for p, _, _ in swept.files
    )
    o3 = r2.latestOffset()
    assert o3["floor"] == o0["wm"]

    # restart 2 (crash right after o2 was WAL'd): the sidecar floor
    # file recovers the REAL floor before the first latestOffset —
    # sweeps resume immediately, pre-existing files still never
    # re-enter, and a newly arrived file flows
    new = d / "new.parquet"
    new.write_bytes(b"y")
    later = o2["wm"] + 10**9
    os.utime(new, ns=(later, later))
    r3 = CloudFilesStreamReader(opts)
    assert r3._floor == o0["wm"]      # recovered from the sidecar
    o4 = r3.latestOffset()
    assert o4["floor"] == o0["wm"]
    assert o4.get("sweep") is True    # no degraded window at all
    [batch] = r3.partitions(o2, o4)
    names = [os.path.basename(p) for p, _, _ in batch.files]
    assert "pre.parquet" not in names
    assert "new.parquet" in names


def test_cloud_files_floor_sidecar_lost_degrades_then_reheals(tmp_path):
    """Without the sidecar (cleaned, or a pre-sidecar checkpoint), the
    unknown-floor restart degrades to the incremental listing — the
    opted-out files still never re-enter — and the first partitions()
    call that heals the floor from the WAL REWRITES the sidecar, so
    the degradation is one restart deep, not permanent."""
    from databricks_data_warehouse_spark.sources.cloud_files import (
        CloudFilesStreamReader,
    )

    d = tmp_path / "lz_floor3"
    d.mkdir()
    pre = d / "pre.parquet"
    pre.write_bytes(b"x")
    old = os.stat(pre).st_mtime_ns - 10**13
    os.utime(pre, ns=(old, old))
    opts = {
        "location": str(d),
        "includeExisting": "false",
        "reconcileEvery": "1",
        "lookbackNs": "0",
    }
    r1 = CloudFilesStreamReader(opts)
    o0 = r1.initialOffset()
    os.remove(r1._floor_file())       # sidecar lost

    # restart from an unknown-floor offset: degraded but safe
    unknown = {"wm": o0["wm"], "recent": o0["recent"], "floor": -1}
    r2 = CloudFilesStreamReader(opts)
    assert r2._floor == -1
    o1 = r2.latestOffset()
    assert o1["floor"] == -1 and "sweep" not in o1
    [batch] = r2.partitions(unknown, o1)
    assert all(
        os.path.basename(p) != "pre.parquet" for p, _, _ in batch.files
    )

    # healing from a GOOD start offset rewrites the sidecar
    good = {"wm": o0["wm"], "recent": o0["recent"], "floor": o0["wm"]}
    r2.partitions(good, o1)
    assert r2._floor == o0["wm"]
    r3 = CloudFilesStreamReader(opts)
    assert r3._floor == o0["wm"]      # sidecar re-persisted by the heal
