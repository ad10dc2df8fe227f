"""Write-side CDC (``delta.enableChangeDataFeed``) and
``dataChange=false`` maintenance commits.

Reference shape: Delta's change-file materialization — rewrite commits
on a CDF-enabled table stage their exact row diff transactionally
(``_change_data`` files), and OPTIMIZE-family commits carry
``dataChange=false`` so CDF readers skip them outright instead of
deriving a provably-empty diff (delta.io CDF semantics; reference repo
has no table format at all — Seed-Store BASELINE.md §Delta)."""

import os

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name, rows=20, cdf=False):
    t = ManagedTable(spark, name, str(tmp_path / name))
    df = spark.range(0, rows).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    t.overwrite(df)
    if cdf:
        t.set_properties({"delta.enableChangeDataFeed": "true"})
    return t


def test_optimize_commit_is_data_change_false(spark, tmp_path):
    t = _mk(spark, tmp_path, "dc0", rows=6)
    for i in range(3):
        t.append(spark.createDataFrame([(100 + i, 0)], "k long, g long"))
    v = t.current_version()
    assert t.optimize(min_small_files=2) == v + 1
    assert t._read_data_change(v + 1) is False
    assert t._read_data_change(v) is True
    # batch CDF: the pair short-circuits to empty without any diff
    step = t.changes(v, v + 1)
    assert step.count() == 0
    assert t.last_changes_strategy == "no-data-change"
    # attributed feed: the OPTIMIZE version contributes no rows
    feed = t.changes_by_version(-1)
    assert feed.where(F.col("_commit_version") == v + 1).count() == 0
    # ... and every pre-OPTIMIZE row is still there exactly once
    assert feed.where(F.col("_change_type") == "insert").count() == 9


def test_streaming_cdf_skips_optimize_pair(spark, tmp_path):
    from databricks_data_warehouse_spark.sources import datasource as ds
    from tests.test_table_stream import _cdf_schema

    t = _mk(spark, tmp_path, "dc1", rows=6)
    for i in range(3):
        t.append(spark.createDataFrame([(100 + i, 0)], "k long, g long"))
    v = t.current_version()
    t.optimize(min_small_files=2)
    r = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    parts = r.partitions({"version": v}, {"version": v + 1})
    real = [p for p in parts if getattr(p, "path", None) is not None]
    assert real == []  # the rewrite pair planned ZERO work


def test_rewrite_stages_change_files(spark, tmp_path):
    t = _mk(spark, tmp_path, "cf0", rows=10, cdf=True)
    v0 = t.current_version()
    # content-changing rewrite: drop evens, bump odds' g by 10
    new = (
        t.read()
        .where(F.col("k") % 2 == 1)
        .select("k", (F.col("g") + 10).alias("g"))
    )
    t.overwrite(new)
    v1 = t.current_version()
    staged = t._read_cdf_staged(v1)
    assert staged is not None and set(staged) == {"insert", "delete"}
    assert os.path.isdir(os.path.join(t.location, staged["insert"]))
    step = t.changes(v0, v1)
    assert t.last_changes_strategy == "staged"
    got = {(r["k"], r["g"], r["_change_type"]) for r in step.collect()}
    want = {(k, k % 3, "delete") for k in range(10)} | {
        (k, k % 3 + 10, "insert") for k in range(1, 10, 2)
    }
    assert got == want


def test_staged_diff_keeps_multiset_cardinality(spark, tmp_path):
    t = ManagedTable(spark, "cf1", str(tmp_path / "cf1"))
    t.overwrite(
        spark.createDataFrame([(1, 5)] * 3 + [(2, 5)], "k long, g long")
    )
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    v0 = t.current_version()
    # 3×(1,5) -> 1×(1,5): net 2 deletes; (2,5) unchanged -> cancels
    t.overwrite(
        spark.createDataFrame([(1, 5), (2, 5)], "k long, g long")
    )
    step = t.changes(v0, t.current_version())
    assert t.last_changes_strategy == "staged"
    rows = [(r["k"], r["_change_type"]) for r in step.collect()]
    assert sorted(rows) == [(1, "delete"), (1, "delete")]


def test_staged_matches_fallback_diff(spark, tmp_path):
    """The staged diff must equal what the read-side exceptAll diff
    would have produced (same commit, cdf record stripped)."""
    import json as _json

    t = _mk(spark, tmp_path, "cf2", rows=50, cdf=True)
    v0 = t.current_version()
    up = spark.createDataFrame([(5, 99), (7, 99), (300, 1)], "k long, g long")
    t.merge_upsert(up, ["k"])  # copy-on-write rewrite
    v1 = t.current_version()
    assert t._read_cdf_staged(v1) is not None
    staged = sorted(
        (r["k"], r["g"], r["_change_type"])
        for r in t.changes(v0, v1).collect()
    )
    assert t.last_changes_strategy == "staged"
    mpath = t._manifest_path(v1)
    m = _json.loads(open(mpath).read())
    m["cdf"] = None
    open(mpath, "w").write(_json.dumps(m))
    fallback = sorted(
        (r["k"], r["g"], r["_change_type"])
        for r in t.changes(v0, v1).collect()
    )
    assert t.last_changes_strategy == "diff"
    assert staged == fallback
    assert (5, 99, "insert") in staged and (5, 5 % 3, "delete") in staged


def test_streaming_cdf_reads_staged_files(spark, tmp_path):
    from databricks_data_warehouse_spark.sources import datasource as ds
    from tests.test_table_stream import _cdf_schema, _read_all_cdf

    t = _mk(spark, tmp_path, "cf3", rows=30, cdf=True)
    v0 = t.current_version()
    up = spark.createDataFrame([(3, 77), (4, 77)], "k long, g long")
    t.merge_upsert(up, ["k"])
    v1 = t.current_version()
    r = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    parts = r.partitions({"version": v0}, {"version": v1})
    # no diff work planned: every partition is a plain staged-file read
    assert not any(isinstance(p, ds._DiffPartition) for p in parts)
    assert all("_change_data" in p.path for p in parts)
    rows = _read_all_cdf(r, v0, v1)
    assert sorted(rows) == [
        (3, 3 % 3, "delete"),
        (3, 77, "insert"),
        (4, 4 % 3, "delete"),
        (4, 77, "insert"),
    ]


def test_staged_change_files_on_partitioned_table(spark, tmp_path):
    t = ManagedTable(
        spark, "cf4", str(tmp_path / "cf4"), partition_columns=["g"]
    )
    df = spark.range(0, 12).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    t.overwrite(df)
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    v0 = t.current_version()
    # replace partition g=1 content (partition column materialized in
    # the staged change files even though data files drop it)
    repl = spark.createDataFrame([(100, 1)], "k long, g long")
    t.replace_where(repl, [("g", "==", 1)])
    v1 = t.current_version()
    step = t.changes(v0, v1)
    assert t.last_changes_strategy == "staged"
    got = {(r["k"], r["g"], r["_change_type"]) for r in step.collect()}
    want = {(k, 1, "delete") for k in (1, 4, 7, 10)} | {(100, 1, "insert")}
    assert got == want


def test_vacuum_sweeps_dead_change_data(spark, tmp_path):
    t = _mk(spark, tmp_path, "cf5", rows=8, cdf=True)
    t.overwrite(spark.createDataFrame([(1, 0)], "k long, g long"))
    t.overwrite(spark.createDataFrame([(2, 0)], "k long, g long"))
    v = t.current_version()
    croot = os.path.join(t.location, "_change_data")
    assert len(os.listdir(croot)) == 2
    t.vacuum(keep=1)
    live = t._read_cdf_staged(v)["insert"].split("/")[1]
    assert os.listdir(croot) == [live]
    # the retained pair still reads from its staged files
    assert t.changes(v - 1, v).count() >= 1
    assert t.last_changes_strategy == "staged"


def test_appends_and_dv_deletes_stage_nothing(spark, tmp_path):
    """Appends and DV deletes already have O(changed-rows) incremental
    CDF reads — the writer must not pay a diff job for them."""
    t = _mk(spark, tmp_path, "cf6", rows=10, cdf=True)
    t.append(spark.createDataFrame([(500, 2)], "k long, g long"))
    va = t.current_version()
    assert t._read_cdf_staged(va) is None
    assert {
        (r["k"], r["_change_type"])
        for r in t.changes(va - 1, va).collect()
    } == {(500, "insert")}
    t.delete_where(F.expr("k = 0"))  # DV merge-on-read delete
    vd = t.current_version()
    assert t._read_cdf_staged(vd) is None
    assert {
        (r["k"], r["_change_type"])
        for r in t.changes(vd - 1, vd).collect()
    } == {(0, "delete")}
