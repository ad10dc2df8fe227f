"""Streaming FROM a ManagedTable (Delta streaming-source parity):
offsets are table versions, each micro-batch delivers appended rows,
and non-append changes follow the ignoreDeletes/ignoreChanges contract.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name, rows=20):
    t = ManagedTable(spark, name, str(tmp_path / name))
    df = spark.range(0, rows).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    t.overwrite(df)
    return t


def _drain(t, tmp_path, qname, **kw):
    # file sink: the one built-in sink that recovers from a checkpoint,
    # so re-draining resumes at the committed table version
    q = (
        t.read_stream(**kw)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / f"out_{qname}"))
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(spark, tmp_path, qname):
    import glob

    if not glob.glob(str(tmp_path / f"out_{qname}") + "/*.parquet"):
        return []
    return spark.read.parquet(str(tmp_path / f"out_{qname}")).collect()


def test_stream_backfill_then_appends_only(spark, tmp_path):
    t = _mk(spark, tmp_path, "st", rows=20)
    _drain(t, tmp_path, "st1")
    assert len(_rows(spark, tmp_path, "st1")) == 20
    # append twice; the SAME checkpoint resumes from the committed version
    t.append(spark.createDataFrame([(100, 0)], "k long, g long"))
    t.append(spark.createDataFrame([(101, 1)], "k long, g long"))
    _drain(t, tmp_path, "st1")
    got = {r["k"] for r in _rows(spark, tmp_path, "st1")}
    assert got == set(range(20)) | {100, 101}
    assert len(got) == 22  # backfilled rows NOT re-delivered


def test_stream_starting_latest_skips_backfill(spark, tmp_path):
    t = _mk(spark, tmp_path, "sl", rows=10)
    _drain(t, tmp_path, "sl1", starting_version="latest")
    assert len(_rows(spark, tmp_path, "sl1")) == 0
    t.append(spark.createDataFrame([(50, 2)], "k long, g long"))
    _drain(t, tmp_path, "sl1", starting_version="latest")
    assert {r["k"] for r in _rows(spark, tmp_path, "sl1")} == {50}


def test_stream_delete_raises_without_ignore(spark, tmp_path):
    t = _mk(spark, tmp_path, "sd", rows=10)
    _drain(t, tmp_path, "sd1")
    t.delete_where(F.expr("k < 3"))
    with pytest.raises(StreamingQueryException, match="ignoreDeletes"):
        _drain(t, tmp_path, "sd1")


def test_stream_delete_skipped_with_ignore(spark, tmp_path):
    t = _mk(spark, tmp_path, "si", rows=10)
    _drain(t, tmp_path, "si1", ignore_deletes=True)
    t.delete_where(F.expr("k < 3"))
    t.append(spark.createDataFrame([(77, 0)], "k long, g long"))
    _drain(t, tmp_path, "si1", ignore_deletes=True)
    got = {r["k"] for r in _rows(spark, tmp_path, "si1")}
    # the delete is skipped (not representable), the append arrives
    assert got == set(range(10)) | {77}


def test_stream_rewrite_raises_without_ignore_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, "sr", rows=10)
    _drain(t, tmp_path, "sr1")
    t.compact()
    with pytest.raises(StreamingQueryException, match="ignoreChanges"):
        _drain(t, tmp_path, "sr1")


def test_stream_rewrite_redelivers_with_ignore_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, "sc", rows=5)
    _drain(t, tmp_path, "sc1", ignore_changes=True)
    t.compact()
    _drain(t, tmp_path, "sc1", ignore_changes=True)
    n = len(_rows(spark, tmp_path, "sc1"))
    assert n == 10  # at-least-once: the rewrite re-delivered all 5


def test_stream_window_applies_end_dvs(spark, tmp_path):
    # rows appended AND DV-deleted before the stream catches up must
    # not appear (the END version's vectors are applied to new files)
    t = _mk(spark, tmp_path, "sw", rows=5)
    _drain(t, tmp_path, "sw1", ignore_deletes=True)
    t.append(spark.createDataFrame([(200, 0), (201, 1)], "k long, g long"))
    t.delete_where(F.expr("k = 200"))
    _drain(t, tmp_path, "sw1", ignore_deletes=True)
    got = {r["k"] for r in _rows(spark, tmp_path, "sw1")}
    assert 201 in got and 200 not in got


def _drain_cdf(t, tmp_path, qname, **kw):
    q = (
        t.read_change_stream(**kw)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / f"out_{qname}"))
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_cdf_stream_delivers_deletes_and_updates(spark, tmp_path):
    t = _mk(spark, tmp_path, "cs", rows=10)
    _drain_cdf(t, tmp_path, "cs1")
    got = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in _rows(spark, tmp_path, "cs1")
    }
    assert got == {(i, "insert", 0) for i in range(10)}
    t.delete_where(F.expr("k < 2"))  # v1
    t.update_where({"g": "g + 10"}, F.expr("k = 5"))  # v2
    _drain_cdf(t, tmp_path, "cs1")
    got = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in _rows(spark, tmp_path, "cs1")
    }
    assert (0, "delete", 1) in got and (1, "delete", 1) in got
    assert (5, "delete", 2) in got and (5, "insert", 2) in got
    assert len(got) == 14  # 10 backfill + 2 deletes + del/ins pair
    # matches the batch attributed feed
    batch = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in t.changes_by_version(-1).collect()
    }
    # batch starts at v0 as inserts of the initial load too
    assert got == batch


def test_cdf_stream_timestamps_and_restore(spark, tmp_path):
    t = _mk(spark, tmp_path, "cr", rows=4)
    t.delete_where(F.expr("k = 0"))  # v1
    t.restore(0)  # v2: DV removed → resurrection
    _drain_cdf(t, tmp_path, "cr1")
    rows = _rows(spark, tmp_path, "cr1")
    res = [(r["k"], r["_change_type"], r["_commit_version"]) for r in rows]
    assert (0, "delete", 1) in res and (0, "insert", 2) in res
    assert all(r["_commit_timestamp"] is not None for r in rows)


def test_cdf_stream_exact_diff_on_rewrite(spark, tmp_path):
    """Round 8: a rewrite pair streams its EXACT multiset diff instead
    of raising / re-delivering (VERDICT r07 item 7). A compact is
    content-identical → empty diff; a copy-on-write delete surfaces
    exactly the removed rows once."""
    t = _mk(spark, tmp_path, "cw2t", rows=4)
    _drain_cdf(t, tmp_path, "cw2t1")
    before = len(_rows(spark, tmp_path, "cw2t1"))
    t.compact()  # full rewrite, same content
    _drain_cdf(t, tmp_path, "cw2t1")
    assert len(_rows(spark, tmp_path, "cw2t1")) == before  # nothing new
    t.delete_where(F.expr("k = 1"), deletion_vectors=False)  # CoW rewrite
    _drain_cdf(t, tmp_path, "cw2t1")
    new = [
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in _rows(spark, tmp_path, "cw2t1")
    ][:]
    assert new.count((1, "delete", t.current_version())) == 1
    assert len(new) == before + 1  # the one deleted row, exactly once


def test_cdf_stream_rewrite_without_stats_still_exact(spark, tmp_path):
    """r09: the single-partition diff cap is gone. When stats can't
    bound the rewrite (stripped manifest) the planner sizes buckets
    from parquet footer counts instead of erroring — a compact is a
    logical no-op, so the exact diff delivers ZERO change rows."""
    import json as _json

    t = _mk(spark, tmp_path, "cw3t", rows=4)
    _drain_cdf(t, tmp_path, "cw3t1")
    before = len(_rows(spark, tmp_path, "cw3t1"))
    t.compact()
    mpath = t._manifest_path(t.current_version())
    m = _json.loads(open(mpath).read())
    m["stats"] = {}
    # strip the dataChange flag too (pre-flag manifest shape): the
    # point of this test is the DIFF path's footer-count fallback, and
    # a flagged OPTIMIZE pair would be skipped before reaching it
    m.pop("dataChange", None)
    open(mpath, "w").write(_json.dumps(m))
    _drain_cdf(t, tmp_path, "cw3t1")
    assert len(_rows(spark, tmp_path, "cw3t1")) == before


def _cdf_schema(t):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        list(t.schema.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
            StructField("_commit_timestamp", TimestampType()),
        ]
    )


def _read_all_cdf(reader, v_from, v_to):
    import pyarrow as pa

    parts = reader.partitions({"version": v_from}, {"version": v_to})
    batches = []
    for p in parts:
        batches.extend(reader.read(p))
    if not batches:
        return []
    tbl = pa.Table.from_batches(batches)
    return list(
        zip(*(tbl.column(c).to_pylist() for c in ("k", "g", "_change_type")))
    )


def test_cdf_diff_bucketed_exact_unit(spark, tmp_path, monkeypatch):
    """Force n_buckets > 1 on a small rewrite and verify the union of
    the bucket partitions' diffs is EXACTLY the single-bucket diff:
    2 updated rows -> 2 deletes + 2 inserts, nothing re-delivered."""
    from databricks_data_warehouse_spark.sources import datasource as ds

    t = _mk(spark, tmp_path, "bkt", rows=200)  # v0
    up = spark.createDataFrame([(5, 99), (6, 99)], "k long, g long")
    t.merge_upsert(up, ["k"])  # v1: copy-on-write rewrite
    monkeypatch.setattr(ds, "_DIFF_BUCKET_TARGET_ROWS", 50)
    r = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    parts = [
        p
        for p in r.partitions({"version": 0}, {"version": 1})
        if isinstance(p, ds._DiffPartition)
    ]
    assert len(parts) >= 2  # bucketed fan-out engaged
    assert all(p.n_buckets == len(parts) for p in parts)
    assert sorted(p.bucket for p in parts) == list(range(len(parts)))
    rows = _read_all_cdf(r, 0, 1)
    assert sorted(r_ for r_ in rows if r_[2] == "delete") == [
        (5, 5 % 3, "delete"),
        (6, 6 % 3, "delete"),
    ]
    assert sorted(r_ for r_ in rows if r_[2] == "insert") == [
        (5, 99, "insert"),
        (6, 99, "insert"),
    ]
    # cross-check vs the unbucketed diff
    monkeypatch.setattr(ds, "_DIFF_BUCKET_TARGET_ROWS", 2_000_000)
    r1 = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    assert sorted(rows) == sorted(_read_all_cdf(r1, 0, 1))


def test_cdf_diff_large_rewrite_over_2m_rows(spark, tmp_path):
    """VERDICT r08 item 3's done-criterion: a rewrite pair whose
    touched rows exceed the old 2M cap streams an exact diff (the cap
    and its error path no longer exist)."""
    from databricks_data_warehouse_spark.sources import datasource as ds

    t = ManagedTable(spark, "big", str(tmp_path / "big"))
    t.overwrite(
        spark.range(0, 2_200_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("g")
        )
    )  # v0
    up = spark.createDataFrame([(17, 999), (1_999_999, 999)], "k long, g long")
    t.merge_upsert(up, ["k"])  # v1 rewrite touches > 2M rows both sides
    r = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    parts = [
        p
        for p in r.partitions({"version": 0}, {"version": 1})
        if isinstance(p, ds._DiffPartition)
    ]
    assert parts and parts[0].n_buckets >= 2  # over target -> fan-out
    rows = _read_all_cdf(r, 0, 1)
    assert sorted(rows) == sorted(
        [
            (17, 17 % 7, "delete"),
            (1_999_999, 1_999_999 % 7, "delete"),
            (17, 999, "insert"),
            (1_999_999, 999, "insert"),
        ]
    )


def test_max_versions_per_trigger_offsets(spark, tmp_path):
    # unit-level: drive the reader object directly — each batch window
    # advances at most N versions, converging on the current version
    from databricks_data_warehouse_spark.sources.datasource import (
        ManagedTableStreamReader,
    )

    t = _mk(spark, tmp_path, "mv", rows=6)  # v0
    t.append(spark.createDataFrame([(100, 0)], "k long, g long"))  # v1
    t.append(spark.createDataFrame([(101, 1)], "k long, g long"))  # v2
    t.append(spark.createDataFrame([(102, 2)], "k long, g long"))  # v3
    r = ManagedTableStreamReader(
        t.schema, {"location": t.location, "maxVersionsPerTrigger": "1"}
    )
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": 0}  # capped at +1
    parts = r.partitions({"version": -1}, {"version": 0})
    assert all(p.path for p in parts)  # the initial load's files
    r.commit({"version": 0})
    assert r.latestOffset() == {"version": 1}
    r.commit({"version": 1})
    assert r.latestOffset() == {"version": 2}
    # a wider cap jumps straight to current
    r2 = ManagedTableStreamReader(
        t.schema, {"location": t.location, "maxVersionsPerTrigger": "10"}
    )
    assert r2.latestOffset() == {"version": 3}
    # uncapped default
    r3 = ManagedTableStreamReader(t.schema, {"location": t.location})
    assert r3.latestOffset() == {"version": 3}
    # each 1-version window delivers exactly that commit's files
    p1 = r.partitions({"version": 0}, {"version": 1})
    assert p1 and all("/w=1-" in p.path for p in p1)


def test_cdf_exact_diff_on_partitioned_rewrite(spark, tmp_path):
    """The rewrite-diff partition recovers hive partition values from
    the path on BOTH sides (removed and added dirs)."""
    t = ManagedTable(
        spark, "cwp", str(tmp_path / "cwp"), partition_columns=["g"]
    )
    t.overwrite(
        spark.range(0, 12).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("g")
        )
    )
    _drain_cdf(t, tmp_path, "cwp1")
    # partition-scoped merge rewrites ONLY g=0 (key covers partition)
    t.merge_upsert(
        spark.createDataFrame([(0, 0), (100, 0)], "k long, g long"),
        ["g", "k"],
    )
    _drain_cdf(t, tmp_path, "cwp1")
    new = [
        (r["k"], r["g"], r["_change_type"])
        for r in _rows(spark, tmp_path, "cwp1")
        if r["_commit_version"] == t.current_version()
    ]
    # exact diff: only the inserted key surfaces (k=0 upserted with
    # identical values cancels out), with its partition value intact
    assert sorted(new) == [(100, 0, "insert")]


def test_stream_resolves_renamed_columns(spark, tmp_path):
    t = _mk(spark, tmp_path, "rns", rows=6)
    t.rename_column("k", "key")
    _drain(t, tmp_path, "rns1")
    t.append(spark.createDataFrame([(100, 0)], "key long, g long"))
    _drain(t, tmp_path, "rns1")
    rows = _rows(spark, tmp_path, "rns1")
    assert {r["key"] for r in rows} == set(range(6)) | {100}
    # CDF stream resolves the mapping too
    t.delete_where(F.expr("key = 100"))
    _drain_cdf(t, tmp_path, "rns2")
    got = {
        (r["key"], r["_change_type"], r["_commit_version"])
        for r in _rows(spark, tmp_path, "rns2")
    }
    assert (100, "delete", t.current_version()) in got
    assert (100, "insert", 2) in got  # the append, under the new name


def test_cdf_diff_decomposes_by_hive_partition_group(spark, tmp_path):
    """VERDICT r09 item 3: the rewrite diff decomposes by hive
    partition — two-sided groups get their OWN diff partitions (files
    of one partition only, so read amplification is per-group), and a
    one-sided group (partition gained in the rewrite) streams as plain
    per-file insert partitions with zero diff work. The union is still
    the exact diff: an untouched-but-restaged partition cancels."""
    from databricks_data_warehouse_spark.sources import datasource as ds

    t = ManagedTable(
        spark, "grp", str(tmp_path / "grp"), partition_columns=["g"]
    )
    base = spark.range(0, 12).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("g")
    )
    t.overwrite(base)  # v0: partitions g=0, g=1
    # v1: full overwrite — g=0 rows changed, g=1 byte-identical rows,
    # g=2 entirely new
    changed = base.withColumn(
        "k", F.when(F.col("g") == 0, F.col("k") + 100).otherwise(F.col("k"))
    )
    extra = spark.createDataFrame([(500, 2), (501, 2)], "k long, g long")
    t.overwrite(changed.unionByName(extra))
    r = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    parts = r.partitions({"version": 0}, {"version": 1})
    diffs = [p for p in parts if isinstance(p, ds._DiffPartition)]
    plains = [p for p in parts if isinstance(p, ds._CdfPartition)]
    # every diff partition's files belong to exactly ONE hive group
    assert diffs
    for p in diffs:
        groups = {
            tuple(sorted(f[1].items()))
            for f in list(p.old_files) + list(p.new_files)
        }
        assert len(groups) == 1
    # the gained partition streams as plain inserts, no diff work
    assert plains
    assert all(
        p.change_type == "insert" and p.part_values.get("g") == "2"
        for p in plains
    )
    rows = _read_all_cdf(r, 0, 1)
    want = sorted(
        [(k, 0, "delete") for k in range(0, 12, 2)]
        + [(k + 100, 0, "insert") for k in range(0, 12, 2)]
        + [(500, 2, "insert"), (501, 2, "insert")]
    )
    # g=1 restaged identically: cancels out entirely
    assert sorted(rows) == want


def test_cdf_bucketed_diff_cached_after_first_read(spark, tmp_path, monkeypatch):
    """VERDICT r10 item 4: the bucketed diff fallback pays its N×
    re-read ONCE — the first read persists each bucket's finished diff
    to _change_data/derived/, and a second read of the same rewrite
    pair plans ONLY staged-file partitions with identical rows."""
    import os

    from databricks_data_warehouse_spark.sources import datasource as ds

    t = _mk(spark, tmp_path, "dcache", rows=200)  # v0
    up = spark.createDataFrame([(5, 99), (6, 99)], "k long, g long")
    t.merge_upsert(up, ["k"])  # v1: copy-on-write rewrite
    monkeypatch.setattr(ds, "_DIFF_BUCKET_TARGET_ROWS", 50)
    r = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    parts1 = r.partitions({"version": 0}, {"version": 1})
    assert any(isinstance(p, ds._DiffPartition) for p in parts1)
    assert all(
        p.cache_path for p in parts1 if isinstance(p, ds._DiffPartition)
    )
    rows1 = _read_all_cdf(r, 0, 1)  # executes + persists the cache
    derived = os.path.join(t.location, "_change_data", "derived")
    assert os.path.isdir(derived) and os.listdir(derived)
    # second read: same pair, fresh reader — cache hit, staged only
    r2 = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    )
    parts2 = r2.partitions({"version": 0}, {"version": 1})
    assert parts2 and all(
        isinstance(p, ds._CachedDiffPartition) for p in parts2
    )
    assert sorted(rows1) == sorted(_read_all_cdf(r2, 0, 1))
    # vacuum keeps the live pair's cache (v1 retained)
    t.vacuum(keep=2)
    parts3 = ds.ManagedTableStreamReader(
        _cdf_schema(t), {"location": t.location, "readChangeFeed": "true"}
    ).partitions({"version": 0}, {"version": 1})
    assert parts3 and all(
        isinstance(p, ds._CachedDiffPartition) for p in parts3
    )


def test_max_versions_engine_call_order_no_stall_no_duplicates(
    spark, tmp_path
):
    """Round-12 review: the ENGINE's real call order is latestOffset
    FIRST (before initialOffset on fresh streams, before anything on
    restarts), and commit() only arrives while constructing the NEXT
    batch. Anchoring the cap window on commit/initialOffset stalled
    capped drains forever and could regress the checkpoint below the
    committed offset (duplicate delivery). Pinned here at both levels:
    the unit call-order and an end-to-end capped drain + capped
    restart, exactly-once throughout."""
    from databricks_data_warehouse_spark.sources.datasource import (
        ManagedTableStreamReader,
    )

    t = _mk(spark, tmp_path, "mvo", rows=6)          # v0
    for i in range(3):                               # v1..v3
        t.append(
            spark.createDataFrame([(100 + i, 0)], "k long, g long")
        )
    # unit: engine order — latestOffset with NO anchor runs uncapped
    # (never regresses); once partitions reveals progress, caps bind
    r = ManagedTableStreamReader(
        t.schema, {"location": t.location, "maxVersionsPerTrigger": "1"}
    )
    assert r.latestOffset() == {"version": 3}        # unknown anchor
    r.partitions({"version": 1}, {"version": 3})     # WAL says 1->3
    t.append(spark.createDataFrame([(200, 0)], "k long, g long"))  # v4
    t.append(spark.createDataFrame([(201, 0)], "k long, g long"))  # v5
    assert r.latestOffset() == {"version": 4}        # capped from 3
    assert r.latestOffset() == {"version": 5}        # window advanced

    # end-to-end: fresh capped drain delivers everything exactly once
    _drain(t, tmp_path, "mvo1", max_versions_per_trigger=1)
    got = sorted(r.k for r in _rows(spark, tmp_path, "mvo1"))
    assert got == sorted(
        list(range(6)) + [100, 101, 102, 200, 201]
    )
    # capped restarts from the same checkpoint after more appends: on
    # restart the engine re-plays commit() for the last committed
    # batch BEFORE latestOffset, so the anchor recovers and the cap
    # binds — each availableNow drain advances ONE capped window (the
    # engine latches its ceiling at the first latestOffset; Delta
    # drains further per run only via SupportsTriggerAvailableNow,
    # which the Python DataSource API lacks). Exactly once throughout:
    # repeated drains converge with no duplicates and no regression.
    t.append(spark.createDataFrame([(300, 0)], "k long, g long"))
    t.append(spark.createDataFrame([(301, 0)], "k long, g long"))
    expected = list(range(6)) + [100, 101, 102, 200, 201, 300, 301]
    for _ in range(4):
        _drain(t, tmp_path, "mvo1", max_versions_per_trigger=1)
        got = sorted(r.k for r in _rows(spark, tmp_path, "mvo1"))
        assert len(got) == len(set(got))       # never a duplicate
        if got == sorted(expected):
            break
    assert got == sorted(expected)             # converged, exactly once


def test_partition_column_named_w_reads_back(spark, tmp_path):
    """Round-12 review: the hive-path parser skipped any 'w=' component
    to avoid the data/w=<version>-<uuid> write roots, so a partition
    column literally NAMED w read back NULL through the pushdown and
    streaming readers (the native path was correct). The skip is now
    anchored on the write root's exact shape."""
    t = ManagedTable(spark, "wcol", str(tmp_path / "wcol"),
                     partition_columns=["w"])
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")],
                                      "k long, w string"))
    native = sorted((r.k, r.w) for r in t.read().collect())
    pushed = sorted((r.k, r.w) for r in t.read_pushdown().collect())
    assert native == pushed == [(1, "a"), (2, "b")]
    _drain(t, tmp_path, "wcol1")
    streamed = sorted((r.k, r.w) for r in _rows(spark, tmp_path, "wcol1"))
    assert streamed == native


def test_cdf_stream_survives_null_partition_rewrite(spark, tmp_path):
    """Round-12 review: planning a rewrite pair whose partition groups
    mix a NULL partition value (__HIVE_DEFAULT_PARTITION__) with
    strings crashed sorted() with a str-vs-None TypeError, wedging the
    CDC stream permanently. The group ordering is None-safe now."""
    t = ManagedTable(spark, "npart", str(tmp_path / "npart"),
                     partition_columns=["g"])
    t.overwrite(spark.createDataFrame([(1, None), (2, "x")],
                                      "k long, g string"))      # v0
    t.overwrite(spark.createDataFrame([(1, None), (3, "x")],
                                      "k long, g string"))      # v1 rewrite
    _drain_cdf(t, tmp_path, "np1")
    got = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in _rows(spark, tmp_path, "np1")
    )
    assert (2, "delete", 1) in got and (3, "insert", 1) in got
