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


def test_row_ids_unique_after_merge_rewrite(spark, tmp_path):
    """Data rewrites re-mint ids for restaged rows (documented v1
    divergence) — but ids must stay UNIQUE."""
    t = _mk(spark, tmp_path, "rt6")
    t.compact()
    t.merge_upsert(
        spark.createDataFrame([(5, 99), (200, 1)], "k long, g long"), ["k"]
    )
    ids = list(_ids(t).values())
    assert len(ids) == len(set(ids)) == 101
