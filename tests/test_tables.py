"""ManagedTable round-trips: create → merge → read, vacuum semantics.

Regression tests for the round-1 crashes (ADVICE.md): a freshly created
partitioned empty table must be readable, and old versions must survive
until an explicit vacuum().
"""

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from databricks_data_warehouse_spark.sources.tables import ManagedTable

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("year", IntegerType(), True),
        StructField("month", IntegerType(), True),
    ]
)


def _table(spark, tmp_path, name="t", partition_columns=("year", "month")):
    return ManagedTable(
        spark,
        name,
        str(tmp_path / name),
        schema=SCHEMA,
        partition_columns=list(partition_columns),
    )


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_fresh_partitioned_table_readable(spark, tmp_path):
    t = _table(spark, tmp_path).create_if_not_exists()
    assert t.read().count() == 0
    assert t.read().columns == ["id", "name", "year", "month"]


def test_create_merge_read_roundtrip_and_idempotency(spark, tmp_path):
    t = _table(spark, tmp_path).create_if_not_exists()
    batch = _rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 2)])
    t.merge_insert_only(batch)
    assert t.read().count() == 2
    # re-running the same merge inserts nothing (S5 idempotency)
    t.merge_insert_only(batch)
    assert t.read().count() == 2
    # a new row goes in
    t.merge_insert_only(_rows(spark, [(3, "c", 2024, 2)]))
    assert t.read().count() == 3


def test_schema_persisted_across_instances(spark, tmp_path):
    t = _table(spark, tmp_path).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1)]))
    # fresh object with no schema arg must read back the declared schema
    t2 = ManagedTable(spark, "t", str(tmp_path / "t"))
    df = t2.read()
    assert df.columns == ["id", "name", "year", "month"]
    assert df.schema["year"].dataType == IntegerType()
    assert df.count() == 1


def test_reader_survives_subsequent_writes_until_vacuum(spark, tmp_path):
    t = _table(spark, tmp_path).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1)]))
    old_reader = t.read()  # lazy; points at v=1
    t.merge_insert_only(_rows(spark, [(2, "b", 2024, 1)]))
    t.merge_insert_only(_rows(spark, [(3, "c", 2024, 1)]))
    # no auto-gc: the old version is still materializable
    assert old_reader.count() == 1
    t.vacuum(keep=1)
    assert t.read().count() == 3


def test_merge_upsert(spark, tmp_path):
    t = _table(spark, tmp_path, name="g", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 1)]))
    t.merge_upsert(_rows(spark, [(2, "B", 2024, 1), (3, "c", 2024, 1)]), key_columns=["id"])
    got = {r.id: r.name for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_update_only_touches_matches(spark, tmp_path):
    t = _table(spark, tmp_path, name="u", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 1)]))
    t.merge_update(
        _rows(spark, [(2, "B2", 2025, 9), (9, "zz", 2030, 1)]),
        key_columns=["id"],
        set_map={"name": "updates.name"},
    )
    got = {r.id: (r.name, r.year) for r in t.read().collect()}
    # only name updated (set_map), only id=2 matched, id=9 ignored
    assert got == {1: ("a", 2024), 2: ("B2", 2024)}


def test_merge_update_duplicate_source_keys_raise(spark, tmp_path):
    t = _table(spark, tmp_path, name="d", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1)]))
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_update(
            _rows(spark, [(1, "x", 2024, 1), (1, "y", 2024, 1)]),
            key_columns=["id"],
        )


def _partition_state(table, pkey):
    """(manifest relpath, sorted file mtimes+sizes) for one partition."""
    import os

    rel = table._read_manifest(table.current_version())[pkey]
    d = os.path.join(table.location, rel)
    files = sorted(
        (f, os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if not f.startswith((".", "_"))
    )
    return rel, files


def test_merge_rewrites_only_source_partitions(spark, tmp_path):
    t = _table(spark, tmp_path, name="p").create_if_not_exists()
    t.merge_insert_only(
        _rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 2), (3, "c", 2023, 12)])
    )
    before_1 = _partition_state(t, '["2024", "1"]')
    before_23 = _partition_state(t, '["2023", "12"]')
    # batch touches only 2024/2
    t.merge_insert_only(_rows(spark, [(4, "d", 2024, 2)]))
    # untouched partitions: same data dirs, byte-identical files
    assert _partition_state(t, '["2024", "1"]') == before_1
    assert _partition_state(t, '["2023", "12"]') == before_23
    # touched partition moved to the new write root
    assert _partition_state(t, '["2024", "2"]')[0].startswith("data/w=2")
    assert t.read().count() == 4


def test_upsert_partition_scoped_when_keys_cover_partitions(spark, tmp_path):
    t = _table(spark, tmp_path, name="ps").create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 2)]))
    before = _partition_state(t, '["2024", "1"]')
    # keys include the partition columns -> scoped rewrite
    t.merge_upsert(
        _rows(spark, [(2, "B", 2024, 2), (5, "e", 2024, 2)]),
        key_columns=["id", "year", "month"],
    )
    assert _partition_state(t, '["2024", "1"]') == before
    got = {r.id: r.name for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 5: "e"}


def test_compact_collapses_write_roots(spark, tmp_path):
    t = _table(spark, tmp_path, name="cc").create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1)]))
    t.merge_insert_only(_rows(spark, [(2, "b", 2024, 2)]))
    t.merge_insert_only(_rows(spark, [(3, "c", 2024, 3)]))
    entries = t._read_manifest(t.current_version())
    roots = {"/".join(r.split("/")[:2]) for r in entries.values()}
    assert len(roots) == 3
    t.compact()
    entries = t._read_manifest(t.current_version())
    roots = {"/".join(r.split("/")[:2]) for r in entries.values()}
    assert len(roots) == 1
    assert t.read().count() == 3


def test_config_registry_and_schemas():
    from databricks_data_warehouse_spark.config import (
        REFERENCE_TABLES,
        WarehouseConfig,
    )
    from databricks_data_warehouse_spark.schemas import SILVER_SCHEMAS

    cfg = WarehouseConfig(root="/tmp/wh", tables=REFERENCE_TABLES)
    assert cfg.path("bronze", "customers") == "/tmp/wh/bronze/customers"
    assert cfg.table("order_details").id_columns == ("order_id", "item_id")
    with pytest.raises(ValueError, match="unknown layer"):
        cfg.path("platinum", "x")
    # every registered entity has a NOT-NULL silver schema
    for t in REFERENCE_TABLES:
        schema = SILVER_SCHEMAS[t.name]
        assert all(not f.nullable for f in schema.fields)


def test_catalog_database_ddl_and_views(spark):
    from databricks_data_warehouse_spark.sources.catalog import (
        ensure_database,
        register_views,
    )

    ensure_database(spark, "wh_test")
    assert spark.catalog.currentDatabase() == "wh_test"
    tables = register_views(spark, "/root/testdata/sf0.001")
    assert set(tables) >= {"orders", "customer", "events"}
    assert spark.sql("SELECT COUNT(*) AS n FROM orders").collect()[0].n > 0
    # events.ts normalized to a real timestamp by the loader
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"
    ensure_database(spark, "default")


def test_null_partition_values_roundtrip(spark, tmp_path):
    """NULL partition values land in the hive default-partition dir and
    must round-trip through the manifest (walk + filter + read)."""
    t = _table(spark, tmp_path, name="np").create_if_not_exists()
    t.merge_insert_only(
        spark.createDataFrame(
            [(1, "a", 2024, 1), (2, "b", None, None)], SCHEMA
        )
    )
    got = {(r.id, r.year, r.month) for r in t.read().collect()}
    assert got == {(1, 2024, 1), (2, None, None)}
    # merging into the NULL partition only touches the NULL partition
    before = _partition_state(t, '["2024", "1"]')
    t.merge_insert_only(
        spark.createDataFrame([(3, "c", None, None)], SCHEMA)
    )
    assert _partition_state(t, '["2024", "1"]') == before
    assert t.read().count() == 3


def test_history_and_describe(spark, tmp_path):
    t = _table(spark, tmp_path, name="h").create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1)]))
    t.merge_insert_only(_rows(spark, [(2, "b", 2024, 2)]))
    h = t.history()
    assert [d["version"] for d in h] == [2, 1, 0]
    assert h[0]["partitions"] == 2
    d = t.describe()
    assert d["version"] == 2 and d["partitions"] == 2
    assert d["partition_columns"] == ["year", "month"]


# --------------------------------------------------- schema evolution (r5)
def test_merge_schema_adds_and_nullfills_columns(spark, tmp_path):
    """Delta autoMerge parity: a source with one ADDED and one DROPPED
    column evolves the table schema; old rows read back NULL for the new
    column, new rows NULL for the dropped one; old snapshots stay
    readable under the widened schema (VERDICT r04 item 5)."""
    t = _table(spark, tmp_path, name="ev").create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 2)]))
    v_before = t.current_version()

    drifted = spark.createDataFrame(
        [(3, 2024, 2, "x@y.z")], "id long, year int, month int, email string"
    )  # adds email, drops name
    t.merge_insert_only(drifted, merge_schema=True)

    df = t.read()
    assert df.columns == ["id", "name", "year", "month", "email"]
    rows = {r.id: r for r in df.collect()}
    assert rows[1].email is None and rows[1].name == "a"
    assert rows[3].name is None and rows[3].email == "x@y.z"

    # fresh instance loads the evolved persisted schema
    t2 = ManagedTable(spark, "ev", str(tmp_path / "ev"))
    assert t2.read().columns == ["id", "name", "year", "month", "email"]

    # pre-evolution snapshot still readable (nulls for the added column)
    old = t.read(version=v_before)
    assert old.count() == 2
    assert all(r.email is None for r in old.collect())


def test_merge_schema_upsert_and_type_widening(spark, tmp_path):
    t = _table(spark, tmp_path, name="ev2", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1)]))
    src = spark.createDataFrame(
        [(1, "A", 2024, 1, 9.5)], "id int, name string, year int, month int, score double"
    )  # id int -> cast up to the table's long; score appended
    t.merge_upsert(src, key_columns=["id"], merge_schema=True)
    row = {r.id: r for r in t.read().collect()}[1]
    assert row.name == "A" and row.score == 9.5
    assert t.read().schema["id"].dataType == LongType()


def test_merge_without_merge_schema_raises_on_drift(spark, tmp_path):
    t = _table(spark, tmp_path, name="ev3").create_if_not_exists()
    drifted = spark.createDataFrame([(1, 2024, 1, "e")], "id long, year int, month int, email string")
    with pytest.raises(ValueError, match="schema drift"):
        t.merge_insert_only(drifted)
    with pytest.raises(ValueError, match="schema drift"):
        t.merge_upsert(drifted, key_columns=["id"])


# ------------------------------------------------- merge_delete (r5)
def test_merge_delete_removes_matches_partition_scoped(spark, tmp_path):
    """whenMatchedDelete parity + the GDPR shape: keyed delete rewrites
    only the source's partitions when keys cover partition columns."""
    t = _table(spark, tmp_path, name="d").create_if_not_exists()
    t.merge_insert_only(
        _rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 1), (3, "c", 2024, 2)])
    )
    tombstones = spark.createDataFrame(
        [(2, 2024, 1)], "id long, year int, month int"
    )
    t.merge_delete(tombstones, key_columns=["id", "year", "month"])
    assert sorted(r.id for r in t.read().collect()) == [1, 3]
    # re-running the same delete is a no-op on contents
    t.merge_delete(tombstones, key_columns=["id", "year", "month"])
    assert sorted(r.id for r in t.read().collect()) == [1, 3]
    # the untouched partition (2024,2)'s files were never rewritten:
    # its manifest entry still points at the original write root
    import json as _json

    entries = t._read_manifest(t.current_version())
    untouched = [rel for k, rel in entries.items() if _json.loads(k) == ["2024", "2"]]
    assert untouched and untouched[0].startswith("data/w=1")


def test_delete_where_predicate(spark, tmp_path):
    from pyspark.sql import functions as F

    t = _table(spark, tmp_path, name="dw", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1), (2, "b", 2025, 1)]))
    t.delete_where(F.col("year") == 2024)
    rows = t.read().collect()
    assert [r.id for r in rows] == [2]


# --------------------------------------------------- changes / CDF (r5)
def test_changes_between_versions(spark, tmp_path):
    """CDF parity: inserts, deletes, and updates (delete+insert) across
    arbitrary version pairs, computed from snapshots after the fact."""
    t = _table(spark, tmp_path, name="cdf", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 1)]))
    v1 = t.current_version()
    t.merge_upsert(_rows(spark, [(2, "B", 2024, 1), (3, "c", 2024, 1)]), key_columns=["id"])
    v2 = t.current_version()
    t.merge_delete(spark.createDataFrame([(1,)], "id long"), key_columns=["id"])

    diff = {(r.id, r._change_type) for r in t.changes(v1, v2).collect()}
    # update of 2 = delete old + insert new; insert of 3
    assert diff == {(2, "insert"), (3, "insert"), (2, "delete")}

    # full range v1 -> current: 1 deleted, 2 updated, 3 inserted
    diff2 = {(r.id, r.name, r._change_type) for r in t.changes(v1).collect()}
    assert diff2 == {
        (2, "B", "insert"),
        (3, "c", "insert"),
        (1, "a", "delete"),
        (2, "b", "delete"),
    }
    # identical snapshots diff to empty
    assert t.changes(v2, v2).count() == 0


# ------------------------------------------- no-op merges are free (r6)
def _data_dirs(table):
    import os as _os

    root = _os.path.join(table.location, "data")
    return sorted(_os.listdir(root)) if _os.path.isdir(root) else []


def test_noop_merges_commit_nothing(spark, tmp_path):
    """BENCH_r05 'What's wrong 2': an idempotent re-run that changes no
    rows must not bump the version or write a single file — the same
    short-circuit Delta MERGE does when no file changes. Covers all
    four merge primitives."""
    t = _table(spark, tmp_path, name="noop").create_if_not_exists()
    batch = _rows(spark, [(1, "a", 2024, 1), (2, "b", 2024, 2)])
    t.merge_insert_only(batch)
    v = t.current_version()
    dirs = _data_dirs(t)

    # replayed insert-only batch: zero new rows -> no commit, no files
    t.merge_insert_only(batch)
    # delete of keys that match nothing
    t.merge_delete(
        spark.createDataFrame([(99, 2024, 1)], "id long, year int, month int"),
        key_columns=["id", "year", "month"],
    )
    # update whose keys match nothing
    t.merge_update(
        spark.createDataFrame(
            [(99, "zz", 2024, 1)], "id long, name string, year int, month int"
        ),
        key_columns=["id", "year", "month"],
    )
    # empty-source upsert
    t.merge_upsert(_rows(spark, []), key_columns=["id", "year", "month"])

    assert t.current_version() == v
    assert _data_dirs(t) == dirs
    assert t.read().count() == 2


def test_retain_versions_bounds_manifests_and_files(spark, tmp_path):
    """retain_versions auto-vacuums on commit: manifests and superseded
    data dirs stay bounded no matter how many writes land (the
    streaming-sink hygiene knob)."""
    import os as _os

    t = ManagedTable(
        spark,
        "rv",
        str(tmp_path / "rv"),
        schema=SCHEMA,
        partition_columns=[],
        retain_versions=2,
    ).create_if_not_exists()
    for i in range(5):
        t.merge_insert_only(_rows(spark, [(i, f"r{i}", 2024, 1)]))
    manifests = [
        e for e in _os.listdir(t.location) if e.startswith("_MANIFEST.v=")
    ]
    assert len(manifests) <= 2
    assert t.read().count() == 5
    # the newest version is intact and older-than-retention reads fail
    with pytest.raises(FileNotFoundError):
        t.read(version=0)


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    """SQL DELETE semantics (ADVICE r05): rows where the predicate
    evaluates to NULL are NOT deleted — only predicate-TRUE rows go."""
    from pyspark.sql import functions as F

    t = _table(spark, tmp_path, name="dwn", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(
        spark.createDataFrame(
            [(1, "a", 2024, 1), (2, "b", None, 1), (3, "c", 2025, 1)], SCHEMA
        )
    )
    t.delete_where(F.col("year") == 2024)
    assert sorted(r.id for r in t.read().collect()) == [2, 3]


def test_failed_evolving_merge_rolls_back_schema(spark, tmp_path):
    """ADVICE r05: a merge that evolves the schema but fails to commit
    must not leave the in-memory schema projecting phantom columns."""
    t = _table(spark, tmp_path, name="rb", partition_columns=()).create_if_not_exists()
    t.merge_insert_only(_rows(spark, [(1, "a", 2024, 1)]))
    cols_before = t.read().columns
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        bad = spark.createDataFrame(
            [("abc", "x", 2024, 1, 9.9)],
            "id string, name string, year int, month int, extra double",
        )  # id 'abc' -> ANSI cast to long raises at execution; extra appended
        with pytest.raises(Exception):
            t.merge_insert_only(bad, merge_schema=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)
    assert [f.name for f in t.schema.fields] == cols_before
    assert t.read().columns == cols_before
    # and the table still merges fine afterwards
    t.merge_insert_only(_rows(spark, [(2, "b", 2024, 1)]))
    assert t.read().count() == 2


def test_staged_writes_cast_to_declared_schema(spark, tmp_path):
    """Round-10 repro: a frame staged with a drifted column type
    (decimal literal into a double column) must be CAST on write —
    the scan applies the declared schema to the parquet bytes, so an
    uncast decimal(2,1) 5.0 read back as its unscaled 50.0."""
    from pyspark.sql import functions as F

    t = ManagedTable(spark, "castw", str(tmp_path / "castw"))
    t.overwrite(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    # VALUES-style literal: 5.0 parses as decimal(2,1), k as int
    drifted = spark.sql("SELECT * FROM (VALUES (5, 5.0))").toDF("k", "v")
    assert dict(drifted.dtypes)["v"].startswith("decimal")
    t.append(drifted)
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {
        (1, 1.0), (5, 5.0)
    }
    # and through replace_where too
    t.replace_where(
        spark.sql("SELECT * FROM (VALUES (9, 9.5))").toDF("k", "v")
        .withColumn("k", F.lit(9).cast("long")),
        [("k", "=", 9)],
    )
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {
        (1, 1.0), (5, 5.0), (9, 9.5)
    }


def test_cast_on_write_ansi_overflow_fails(spark, tmp_path):
    """ADVICE r10: store-assignment is ANSI — a long overflowing an int
    column fails the write instead of silently wrapping/nulling
    (Delta's storeAssignmentPolicy=ANSI default)."""
    import pytest as _pytest
    from pyspark.sql.types import IntegerType, StructField, StructType

    t = ManagedTable(spark, "ansi_cast", str(tmp_path / "ansi_cast"))
    t.create_if_not_exists(StructType([StructField("k", IntegerType())]))
    ok = spark.createDataFrame([(1,), (2,)], "k long")
    t.append(ok)  # value-preserving downcast is fine
    assert sorted(r.k for r in t.read().collect()) == [1, 2]
    bad = spark.createDataFrame([(3_000_000_000,)], "k long")
    with _pytest.raises(Exception, match="ANSI cast|assert"):
        t.append(bad)
    # failed write staged nothing visible
    assert sorted(r.k for r in t.read().collect()) == [1, 2]


def test_cast_on_write_null_passthrough(spark, tmp_path):
    """NULL inputs stay NULL through the ANSI cast (no spurious raise)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    t = ManagedTable(spark, "ansi_null", str(tmp_path / "ansi_null"))
    t.create_if_not_exists(StructType([StructField("k", IntegerType())]))
    t.append(spark.createDataFrame([(None,), (5,)], "k long"))
    assert sorted(
        (r.k is None, r.k) for r in t.read().collect()
    ) == [(False, 5), (True, None)]
