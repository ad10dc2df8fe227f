"""Streaming APPLY CHANGES — file-landed change batches drained
through apply_changes; exactly-once is sequence-owned, so checkpoint
loss and total re-delivery are no-ops."""

import os
import time

from databricks_data_warehouse_spark.pipelines.cdc import scd1_current
from databricks_data_warehouse_spark.sources.tables import ManagedTable
from databricks_data_warehouse_spark.streaming.cdc_stream import (
    stream_apply_changes,
)

_SCHEMA = "k long, val string, seq long, op string"


def _land(spark, land_dir, name, rows, mtime):
    df = spark.createDataFrame(rows, _SCHEMA)
    d = os.path.join(land_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    import glob
    import shutil

    part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    dst = os.path.join(land_dir, f"{name}.parquet")
    os.replace(part, dst)
    shutil.rmtree(d, ignore_errors=True)
    os.utime(dst, (mtime, mtime))


def test_stream_apply_changes_checkpoint_loss_noop(spark, tmp_path):
    land = str(tmp_path / "land")
    os.makedirs(land)
    now = time.time()
    _land(spark, land, "b1",
          [(1, "a", 1, "upsert"), (2, "b", 1, "upsert")], now - 30)
    _land(spark, land, "b2",
          [(1, "a2", 2, "upsert"), (2, "x", 2, "delete")], now - 20)
    t = ManagedTable(spark, "sc", str(tmp_path / "sc"))
    ck1 = str(tmp_path / "ck1")
    stream_apply_changes(
        spark, land, t, ["k"], "seq", _SCHEMA,
        apply_as_deletes="op = 'delete'", except_columns=["op"],
        checkpoint_dir=ck1,
    )
    got = {r["k"]: r["val"] for r in scd1_current(t).collect()}
    assert got == {1: "a2"}
    v = t.current_version()
    # checkpoint LOSS: brand-new checkpoint re-delivers both files —
    # the sequence guard must no-op them (zero commits)
    stream_apply_changes(
        spark, land, t, ["k"], "seq", _SCHEMA,
        apply_as_deletes="op = 'delete'", except_columns=["op"],
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert t.current_version() == v
    assert {r["k"]: r["val"] for r in scd1_current(t).collect()} == {1: "a2"}
    # a NEW file lands; the original checkpoint picks up just that one
    _land(spark, land, "b3", [(3, "c", 3, "upsert")], now - 10)
    stream_apply_changes(
        spark, land, t, ["k"], "seq", _SCHEMA,
        apply_as_deletes="op = 'delete'", except_columns=["op"],
        checkpoint_dir=ck1,
    )
    assert {r["k"]: r["val"] for r in scd1_current(t).collect()} == {
        1: "a2", 3: "c"
    }
