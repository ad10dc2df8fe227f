"""SQL spelling for ManagedTable DML (VERDICT r06 "What's missing" 6).

The reference's operational habit is %sql cells (Seed-Store-
Dashboard.py:22-123); SqlSession gives table MUTATIONS the same
spelling. Each statement form is pinned against the Python method it
routes to, plus the merge-on-read guarantees (DV delete/update leave
data files untouched) surviving the SQL path.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="sqlt", rows=200):
    t = ManagedTable(spark, name, str(tmp_path / name))
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 10).cast("double").alias("v"),
    )
    t.overwrite(df.repartitionByRange(4, "k"))
    return t


def _data_files(t):
    return {
        p: (os.stat(p).st_ino, os.stat(p).st_mtime_ns)
        for p in glob.glob(t.location + "/data/**/*.parquet", recursive=True)
    }


def _sess(spark, *tables):
    s = SqlSession(spark)
    for t in tables:
        s.register(t)
    return s


def test_sql_delete_routes_to_dv(spark, tmp_path):
    t = _mk(spark, tmp_path)
    s = _sess(spark, t)
    before = _data_files(t)
    out = s.sql("DELETE FROM sqlt WHERE g = 1")
    r = out.collect()[0]
    assert (r["operation"], r["version"]) == ("DELETE", 1)
    assert t.read().count() == 150
    assert t.read().filter("g = 1").count() == 0
    # merge-on-read through SQL: no data file rewritten
    assert _data_files(t) == before
    assert t.history()[0]["operation"] == "DELETE (DV)"


def test_sql_delete_without_where_empties_table(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _sess(spark, t).sql("DELETE FROM sqlt")
    assert t.read().count() == 0


def test_sql_update_dv_values_and_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    s = _sess(spark, t)
    before = _data_files(t)
    s.sql("UPDATE sqlt SET v = v + 0.5, g = g + 100 WHERE k < 10")
    got = {r["k"]: (r["g"], r["v"]) for r in t.read().collect()}
    assert len(got) == 200
    assert got[3] == (103, 30.5)
    assert got[11] == (3, 110.0)
    # old files untouched; exactly one new data dir appended
    after = _data_files(t)
    assert set(before) <= set(after)
    assert all(after[p] == before[p] for p in before)
    assert len(after) > len(before)
    assert t.history()[0]["operation"] == "UPDATE (DV)"


def test_update_expressions_see_old_values(spark, tmp_path):
    # swap-style UPDATE: both RHS evaluate against the pre-image
    t = ManagedTable(spark, "swap", str(tmp_path / "swap"))
    t.overwrite(spark.createDataFrame([(1, 2.0, 3.0)], "k long, a double, b double"))
    _sess(spark, t).sql("UPDATE swap SET a = b, b = a")
    r = t.read().collect()[0]
    assert (r["a"], r["b"]) == (3.0, 2.0)


def test_update_null_predicate_keeps_rows(spark, tmp_path):
    t = ManagedTable(spark, "nullp", str(tmp_path / "nullp"))
    t.overwrite(
        spark.createDataFrame(
            [(1, None), (2, 5.0)], "k long, v double"
        )
    )
    _sess(spark, t).sql("UPDATE nullp SET k = k + 10 WHERE v > 0")
    assert {r["k"] for r in t.read().collect()} == {1, 12}


def test_update_copy_on_write_matches_dv(spark, tmp_path):
    t1 = _mk(spark, tmp_path, "cw1")
    t2 = _mk(spark, tmp_path, "cw2")
    t1.update_where({"v": "v * 2"}, F.expr("g = 2"))
    t2.update_where({"v": "v * 2"}, F.expr("g = 2"), deletion_vectors=False)
    assert sorted(map(tuple, t1.read().collect())) == sorted(
        map(tuple, t2.read().collect())
    )


def test_update_unknown_column_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, "bad")
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where({"nope": "1"}, F.lit(True))


def test_update_no_match_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path, "noop")
    v = t.update_where({"v": "0.0"}, F.expr("k < 0"))
    assert v == 0  # commit-free
    assert t.read().filter("v = 0.0").count() == 1  # only k=0's original


def test_sql_merge_upsert(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=20)
    s = _sess(spark, t)
    src = spark.createDataFrame(
        [(5, 99, 5000.0), (1000, 7, 1.0)], "k long, g long, v double"
    )
    src.createOrReplaceTempView("updates")
    out = s.sql(
        "MERGE INTO sqlt AS t USING updates AS u ON t.k = u.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    # round-12 review 5: SQL MERGE runs the general Delta-semantics
    # path for every form but the unconditional matched-DELETE
    assert out["operation"] == "MERGE"
    got = {r["k"]: (r["g"], r["v"]) for r in t.read().collect()}
    assert len(got) == 21
    assert got[5] == (99, 5000.0)
    assert got[1000] == (7, 1.0)


def test_sql_merge_delete_and_subquery_source(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=20)
    s = _sess(spark, t)
    s.sql(
        "MERGE INTO sqlt USING (SELECT k FROM sqlt WHERE g = 0) AS d "
        "ON sqlt.k = d.k WHEN MATCHED THEN DELETE"
    )
    assert t.read().filter("g = 0").count() == 0
    assert t.read().count() == 15


def test_sql_merge_insert_only(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=10)
    s = _sess(spark, t)
    src = spark.createDataFrame(
        [(3, 3, 30.0), (100, 0, 0.0)], "k long, g long, v double"
    )
    src.createOrReplaceTempView("batch")
    s.sql(
        "MERGE INTO sqlt USING batch ON sqlt.k = batch.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert t.read().count() == 11  # k=3 matched, skipped; k=100 inserted
    # idempotent replay
    s.sql(
        "MERGE INTO sqlt USING batch ON sqlt.k = batch.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert t.read().count() == 11


def test_sql_merge_update_only(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=10)
    s = _sess(spark, t)
    src = spark.createDataFrame([(4, 77.0)], "k long, nv double")
    src.createOrReplaceTempView("fix")
    s.sql(
        "MERGE INTO sqlt USING fix ON sqlt.k = fix.k "
        "WHEN MATCHED THEN UPDATE SET v = nv"
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[4] == 77.0 and len(got) == 10


def test_sql_merge_on_validation(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=5)
    s = _sess(spark, t)
    spark.createDataFrame([(1, 1, 1.0)], "k long, g long, v double").createOrReplaceTempView("x")
    with pytest.raises(ValueError, match="different columns"):
        s.sql(
            "MERGE INTO sqlt USING x ON sqlt.k = x.g "
            "WHEN NOT MATCHED THEN INSERT *"
        )


def test_sql_optimize_vacuum_restore_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    s = _sess(spark, t)
    s.sql("DELETE FROM sqlt WHERE k >= 100")
    s.sql("OPTIMIZE sqlt ZORDER BY (k, v)")
    hist = {r["version"]: r["operation"] for r in s.sql("DESCRIBE HISTORY sqlt").collect()}
    assert hist[2] == "OPTIMIZE ZORDER"
    s.sql("RESTORE sqlt TO VERSION AS OF 0")
    assert t.read().count() == 200
    s.sql("VACUUM sqlt RETAIN 2 VERSIONS")
    assert t.read().count() == 200  # current still readable after vacuum


def test_sql_select_passthrough_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, "tt")
    s = _sess(spark, t)
    s.sql("DELETE FROM tt WHERE g = 0")
    assert s.sql("SELECT COUNT(*) AS n FROM tt").collect()[0]["n"] == 150
    assert (
        s.sql("SELECT COUNT(*) AS n FROM tt VERSION AS OF 0").collect()[0]["n"]
        == 200
    )


def test_scoped_merge_replaces_update_appended_entries(spark, tmp_path):
    # a DV update appends an extra manifest entry for its partition;
    # a later partition-scoped merge restaging that partition must drop
    # BOTH the original entry and the appended one — no duplicate rows
    t = ManagedTable(
        spark, "pup", str(tmp_path / "pup"), partition_columns=["g"]
    )
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    t.overwrite(df)
    t.update_where({"v": "v + 1000"}, F.expr("g = 0 AND k < 10"))
    assert t.read().count() == 100
    src = spark.createDataFrame(
        [(k, 0, float(k)) for k in range(0, 100, 2)], "k long, g long, v double"
    )
    t.merge_upsert(src, ["g", "k"])
    got = t.read()
    assert got.count() == 100
    assert got.filter("g = 0").count() == 50
    # partition 0 fully restaged: the +1000 updates were overwritten
    assert got.filter("v >= 1000").count() == 0


def test_append_coexists_and_scoped_merge_replaces(spark, tmp_path):
    t = ManagedTable(spark, "ap", str(tmp_path / "ap"), partition_columns=["g"])
    df = spark.createDataFrame([(1, 0, 1.0), (2, 1, 2.0)], "k long, g long, v double")
    t.overwrite(df)
    before = _data_files(t)
    t.append(spark.createDataFrame([(3, 0, 3.0)], "k long, g long, v double"))
    after = _data_files(t)
    # appended: existing files untouched, both appends visible
    assert all(after[p] == before[p] for p in before)
    assert t.read().count() == 3
    assert t.read().filter("g = 0").count() == 2
    # restaging partition 0 via scoped merge drops base AND appended entries
    t.merge_upsert(
        spark.createDataFrame([(9, 0, 9.0)], "k long, g long, v double"), ["g", "k"]
    )
    assert {r["k"] for r in t.read().filter("g = 0").collect()} == {1, 3, 9}


def test_sql_insert_into_select_and_values(spark, tmp_path):
    t = _mk(spark, tmp_path, "ins", rows=5)
    s = _sess(spark, t)
    out = s.sql("INSERT INTO ins SELECT k + 100 AS k, g, v FROM ins").collect()[0]
    assert out["operation"] == "INSERT"
    assert t.read().count() == 10
    s.sql("INSERT INTO ins VALUES (999, 0, 0.5)")
    assert t.read().count() == 11
    assert t.read().filter("k = 999").count() == 1
    # plain INSERT does NOT dedup — replay duplicates (MERGE's job)
    s.sql("INSERT INTO ins VALUES (999, 0, 0.5)")
    assert t.read().filter("k = 999").count() == 2


def test_sql_alter_table_constraints(spark, tmp_path):
    t = _mk(spark, tmp_path, "con", rows=5)
    s = _sess(spark, t)
    s.sql("ALTER TABLE con ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    with pytest.raises(ValueError, match="v_nonneg"):
        s.sql("INSERT INTO con VALUES (50, 0, -1.0)")
    assert t.read().count() == 5  # failed insert committed nothing
    s.sql("ALTER TABLE con DROP CONSTRAINT v_nonneg")
    s.sql("INSERT INTO con VALUES (50, 0, -1.0)")
    assert t.read().count() == 6


def test_timestamp_time_travel(spark, tmp_path):
    import datetime
    import time

    t = _mk(spark, tmp_path, "ts0", rows=10)
    time.sleep(1.1)
    mark = datetime.datetime.now().isoformat()
    time.sleep(1.1)
    s = _sess(spark, t)
    s.sql("DELETE FROM ts0 WHERE k < 5")
    # the marked instant resolves to v0 (pre-delete)
    assert t.version_at_timestamp(mark) == 0
    n = s.sql(
        f"SELECT COUNT(*) AS n FROM ts0 TIMESTAMP AS OF '{mark}'"
    ).collect()[0]["n"]
    assert n == 10
    s.sql(f"RESTORE ts0 TO TIMESTAMP AS OF '{mark}'")
    assert t.read().count() == 10
    with pytest.raises(ValueError, match="no version committed"):
        t.version_at_timestamp("2000-01-01T00:00:00")
    assert t.history()[0]["timestamp"] > 0


def test_alter_table_add_drop_column(spark, tmp_path):
    t = _mk(spark, tmp_path, "ac", rows=5)
    s = _sess(spark, t)
    s.sql("ALTER TABLE ac ADD COLUMN note string")
    got = t.read()
    assert "note" in got.columns
    assert got.filter("note IS NULL").count() == 5  # old files fill NULL
    # writes after evolution carry the column
    s.sql("INSERT INTO ac VALUES (99, 0, 9.0, 'hi')")
    assert t.read().filter("note = 'hi'").count() == 1
    # time travel reads the OLD schema's data under the new projection
    assert t.read().count() == 6
    s.sql("ALTER TABLE ac DROP COLUMN note")
    assert "note" not in t.read().columns
    assert t.read().count() == 6
    assert t.history()[0]["operation"] == "DROP COLUMN note"


def test_drop_column_guards(spark, tmp_path):
    t = ManagedTable(spark, "dg", str(tmp_path / "dg"), partition_columns=["g"])
    t.overwrite(spark.createDataFrame([(1, 0, 2.0)], "k long, g long, v double"))
    with pytest.raises(ValueError, match="partition/sort"):
        t.drop_column("g")
    t.add_constraint("v_pos", "v > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.drop_column("v")
    t.drop_constraint("v_pos")
    assert t.drop_column("v") > 0
    assert t.read().columns == ["k", "g"]


def test_sql_table_changes_tvf(spark, tmp_path):
    t = _mk(spark, tmp_path, "cf", rows=10)
    s = _sess(spark, t)
    s.sql("DELETE FROM cf WHERE k < 4")
    # Databricks semantics: the start version's own changes are
    # INCLUDED (round-12 review 5 closed the off-by-one) — from v1
    # the feed is just the deletes, from v0 the initial inserts too
    got = s.sql(
        "SELECT k, _change_type FROM table_changes('cf', 1) ORDER BY k"
    ).collect()
    assert [(r["k"], r["_change_type"]) for r in got] == [
        (i, "delete") for i in range(4)
    ]
    full = s.sql(
        "SELECT COUNT(*) AS n FROM table_changes('cf', 0)"
    ).collect()[0]
    assert full["n"] == 14  # 10 v0 inserts + 4 v1 deletes
    # explicit window form + Delta CDF attribution columns
    r = s.sql(
        "SELECT COUNT(*) AS n, MAX(_commit_version) AS v, "
        "MAX(_commit_timestamp) IS NOT NULL AS has_ts "
        "FROM table_changes('cf', 1, 1)"
    ).collect()[0]
    assert (r["n"], r["v"], r["has_ts"]) == (4, 1, True)
    # rewrites never fire inside string literals
    lit = s.sql("SELECT 'cf VERSION AS OF 0' AS msg").collect()[0]["msg"]
    assert lit == "cf VERSION AS OF 0"


def test_sql_unknown_table_raises(spark, tmp_path):
    s = SqlSession(spark)
    with pytest.raises(KeyError, match="no ManagedTable registered"):
        s.sql("DELETE FROM ghost WHERE 1 = 1")


def test_sql_create_table_end_to_end(spark, tmp_path):
    """A table created, populated, mutated and queried purely through
    SqlSession.sql (VERDICT r07 item 6)."""
    s = SqlSession(spark, base_location=str(tmp_path))
    out = s.sql(
        "CREATE TABLE inv (sku BIGINT, store STRING, qty BIGINT) "
        "USING MANAGED PARTITIONED BY (store)"
    ).collect()[0]
    assert (out["operation"], out["version"]) == ("CREATE TABLE", 0)
    s.sql("INSERT INTO inv VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 5)")
    s.sql("UPDATE inv SET qty = qty + 1 WHERE store = 'a'")
    s.sql("DELETE FROM inv WHERE sku = 3")
    rows = s.sql(
        "SELECT store, SUM(qty) AS q FROM inv GROUP BY store ORDER BY store"
    ).collect()
    assert [(r["store"], r["q"]) for r in rows] == [("a", 32)]
    # IF NOT EXISTS is a no-op; a bare re-CREATE errors
    s.sql(
        "CREATE TABLE IF NOT EXISTS inv (sku BIGINT, store STRING, "
        "qty BIGINT) PARTITIONED BY (store)"
    )
    with pytest.raises(FileExistsError, match="already exists"):
        s.sql("CREATE TABLE inv (sku BIGINT, store STRING, qty BIGINT)")
    # partition layout is real: store dirs exist on disk
    t = s.table("inv")
    assert t.partition_columns == ["store"]
    assert glob.glob(t.location + "/data/**/store=a/*.parquet", recursive=True)


def test_sql_create_table_with_location(spark, tmp_path):
    s = SqlSession(spark)  # no base_location: LOCATION required
    with pytest.raises(ValueError, match="no LOCATION"):
        s.sql("CREATE TABLE x (a BIGINT)")
    loc = str(tmp_path / "explicit_loc")
    s.sql(f"CREATE TABLE x (a BIGINT) LOCATION '{loc}'")
    s.sql("INSERT INTO x VALUES (7)")
    assert s.table("x").location == loc
    assert s.sql("SELECT SUM(a) AS s FROM x").collect()[0]["s"] == 7


def test_vacuum_retain_hours(spark, tmp_path):
    tbl = ManagedTable(spark, "vh", str(tmp_path / "vh"))
    tbl.overwrite(spark.range(0, 10).select(F.col("id")))
    tbl.overwrite(spark.range(0, 10).select(F.col("id")))
    tbl.overwrite(spark.range(0, 10).select(F.col("id")))
    s = _sess(spark, tbl)
    # a large window keeps everything: old versions stay readable
    s.sql("VACUUM vh RETAIN 48 HOURS")
    assert tbl.read(version=0).count() == 10
    # zero-hour window: everything but the current version goes
    s.sql("VACUUM vh RETAIN 0 HOURS")
    assert tbl.read().count() == 10
    with pytest.raises(FileNotFoundError):
        tbl.read(version=0).count()


def test_ctas_and_describe_detail(spark, tmp_path):
    src = ManagedTable(spark, "src_t", str(tmp_path / "src_t"))
    src.overwrite(
        spark.range(0, 50).select(
            F.col("id"), (F.col("id") % 5).alias("g")
        )
    )
    s = SqlSession(spark, base_location=str(tmp_path))
    s.register(src)
    out = s.sql(
        "CREATE TABLE agg_t PARTITIONED BY (g) AS "
        "SELECT g, COUNT(*) AS n FROM src_t GROUP BY g"
    ).collect()[0]
    assert out["operation"] == "CTAS"
    rows = s.sql("SELECT g, n FROM agg_t ORDER BY g").collect()
    assert [(r["g"], r["n"]) for r in rows] == [(i, 10) for i in range(5)]
    # IF NOT EXISTS CTAS on an existing table: no-op, data unchanged
    s.sql("CREATE TABLE IF NOT EXISTS agg_t AS SELECT 1 AS x")
    assert s.sql("SELECT COUNT(*) AS c FROM agg_t").collect()[0]["c"] == 5
    d = s.sql("DESCRIBE DETAIL agg_t").collect()[0]
    assert d["format"] == "managed"
    assert d["partitionColumns"] == ["g"]
    assert d["numFiles"] >= 5 and d["sizeInBytes"] > 0
    assert d["numDeletedRows"] == 0 and d["version"] == 1


def test_optimize_bin_packs_only_fragmented_partitions(spark, tmp_path):
    t = ManagedTable(
        spark, "frag", str(tmp_path / "frag"), partition_columns=["g"]
    )
    t.overwrite(
        spark.range(0, 40).select(F.col("id"), (F.col("id") % 2).alias("g"))
    )
    # fragment partition g=0 with three appends; g=1 stays single-write
    for i in range(3):
        t.append(
            spark.range(100 + i, 101 + i).select(
                F.col("id"), F.lit(0).alias("g")
            )
        )
    before = _data_files(t)
    g1_files = {p: m for p, m in before.items() if "/g=1/" in p}
    s = _sess(spark, t)
    out = s.sql("OPTIMIZE frag").collect()[0]
    assert out["operation"] == "OPTIMIZE"
    after = _data_files(t)
    # g=1 files byte-identical (inode-pinned: untouched partitions are
    # carried over, not rewritten)
    assert {p: m for p, m in after.items() if p in g1_files} == g1_files
    # content unchanged, appended entries retired into the new write
    got = t.read()
    assert got.count() == 43
    assert got.filter(F.col("g") == 0).count() == 23
    hist_ops = [
        r["operation"]
        for r in s.sql("DESCRIBE HISTORY frag").collect()
        if r["version"] == t.current_version()
    ]
    assert hist_ops == ["OPTIMIZE"]
    # second OPTIMIZE: nothing fragmented -> commit-free no-op
    v = t.current_version()
    s.sql("OPTIMIZE frag")
    assert t.current_version() == v


def test_optimize_materializes_dvs_of_rewritten_partitions(spark, tmp_path):
    t = ManagedTable(
        spark, "fragdv", str(tmp_path / "fragdv"), partition_columns=["g"]
    )
    t.overwrite(
        spark.range(0, 20).select(F.col("id"), (F.col("id") % 2).alias("g"))
    )
    t.append(spark.range(100, 102).select(F.col("id"), F.lit(0).alias("g")))
    t.delete_where(F.col("id") == 2)  # DV in partition g=0
    assert t.read().count() == 21
    t.optimize()
    assert t.read().count() == 21
    assert t.read().filter(F.col("id") == 2).count() == 0
    # the rewritten partition's DV died with its files (rows
    # materialized); no DV entries remain for g=0 dirs
    dv, _ = t._read_dv(t.current_version())
    assert all("/g=0/" not in f for f in dv)


def test_create_view_and_show_tables(spark, tmp_path):
    t = _mk(spark, tmp_path, name="cvt", rows=20)
    s = _sess(spark, t)
    out = s.sql(
        "CREATE OR REPLACE VIEW big AS SELECT k, v FROM cvt WHERE v >= 100"
    ).collect()[0]
    assert out["operation"] == "CREATE VIEW"
    assert s.sql("SELECT COUNT(*) AS n FROM big").collect()[0]["n"] == 10
    # views see table mutations at query time (backed by pushdown views)
    s.sql("DELETE FROM cvt WHERE k >= 15")
    assert s.sql("SELECT COUNT(*) AS n FROM big").collect()[0]["n"] == 5
    rows = s.sql("SHOW TABLES").collect()
    assert [(r["name"], r["version"]) for r in rows] == [("cvt", 1)]


def test_show_partitions_metadata_only(spark, tmp_path):
    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
    from databricks_data_warehouse_spark.sources.tables import ManagedTable
    from pyspark.sql import functions as F

    t = ManagedTable(
        spark, "sp", str(tmp_path / "sp"), partition_columns=["y", "q"]
    )
    df = spark.range(0, 120).select(
        F.col("id").alias("k"),
        (F.col("id") % 2 + 2023).cast("string").alias("y"),
        (F.col("id") % 3 + 1).cast("string").alias("q"),
    )
    t.overwrite(df)
    s = SqlSession(spark)
    s.register(t)
    got = sorted(tuple(r) for r in s.sql("SHOW PARTITIONS sp").collect())
    assert got == sorted(
        (str(y), str(q)) for y in (2023, 2024) for q in (1, 2, 3)
    )
    with pytest.raises(ValueError, match="not partitioned"):
        flat = ManagedTable(spark, "flat", str(tmp_path / "flat"))
        flat.overwrite(df.select("k"))
        s.register(flat)
        s.sql("SHOW PARTITIONS flat")


def test_analyze_table_from_metadata(spark, tmp_path):
    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
    from databricks_data_warehouse_spark.sources.tables import ManagedTable
    from pyspark.sql import functions as F

    t = ManagedTable(spark, "an", str(tmp_path / "an"))
    t.overwrite(
        spark.range(0, 500).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(F.col("id") * 2).alias("v"),
        )
    )
    s = SqlSession(spark)
    s.register(t)
    rows = {
        r.column: r
        for r in s.sql(
            "ANALYZE TABLE an COMPUTE STATISTICS FOR COLUMNS (k, v)"
        ).collect()
    }
    assert rows["k"].rows == 500
    assert float(rows["k"].min) == 0 and float(rows["k"].max) == 499
    assert rows["v"].null_count == 100
    assert float(rows["v"].max) == 998


def test_optimize_where_scopes_to_matching_partitions(spark, tmp_path):
    """Delta `OPTIMIZE t WHERE part >= …`: only matching partitions are
    considered for bin-packing; cold partitions stay fragmented AND
    inode-untouched."""
    import os

    from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
    from databricks_data_warehouse_spark.sources.tables import ManagedTable
    from pyspark.sql import functions as F

    t = ManagedTable(
        spark, "ow", str(tmp_path / "ow"), partition_columns=["d"]
    )
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("d")
    )
    t.overwrite(df.repartition(6))  # every partition fragmented (6 files)
    v0 = t.current_version()

    def files_of(part):
        ents = t._read_manifest(t.current_version())
        import json as _j

        rels = [
            rel for k, rel in ents.items()
            if _j.loads(k.split("@")[0])[0] == str(part)
        ]
        out = []
        for rel in rels:
            for dp, _dn, fns in os.walk(os.path.join(t.location, rel)):
                out += [
                    os.path.join(dp, f) for f in fns
                    if f.endswith(".parquet")
                ]
        return sorted(out)

    cold_before = files_of(0)
    s = SqlSession(spark)
    s.register(t)
    s.sql("OPTIMIZE ow WHERE d >= 2")
    assert t.current_version() == v0 + 1
    # cold partitions byte-identical (same inodes), hot ones compacted
    assert files_of(0) == cold_before
    assert len(files_of(2)) < 6
    assert t.read().count() == 400
    # WHERE on a non-partition column is rejected
    with pytest.raises(ValueError, match="partition columns only"):
        t.optimize(where=[("k", ">=", 10)])


def test_merge_insert_literal_with_source_column_word_intact(spark, tmp_path):
    """ADVICE r09 (low): the NOT MATCHED source-scope identifier
    rewrite must not reach inside string literals — a literal
    containing a bare word that names a source column ('has v inside')
    must land verbatim, not grow a src. prefix."""
    t = ManagedTable(spark, "sqlit", str(tmp_path / "sqlit"))
    t.overwrite(
        spark.createDataFrame([(1, "x")], "k long, s string")
    )
    s = _sess(spark, t)
    s.sql(
        "MERGE INTO sqlit USING (SELECT 2 AS k, 'y' AS s) AS u "
        "ON sqlit.k = u.k "
        "WHEN NOT MATCHED THEN INSERT (k, s) VALUES (k, 'has s inside')"
    )
    got = {r["k"]: r["s"] for r in t.read().collect()}
    assert got == {1: "x", 2: "has s inside"}


def test_insert_overwrite_partition_with_generated_column(spark, tmp_path):
    """ADVICE r09 (low): INSERT OVERWRITE t PARTITION (…) on a table
    with a generated column must let the query omit it and have the
    write path compute it."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("g", LongType()),
            StructField("v", DoubleType()),
            StructField("gen", LongType()),
        ]
    )
    t = ManagedTable(
        spark, "giop", str(tmp_path / "giop"), schema=schema,
        partition_columns=["g"],
    )
    t.set_generated_column("gen", "k * 2")
    t.overwrite(
        spark.createDataFrame(
            [(1, 0, 1.0), (2, 1, 2.0)], "k long, g long, v double"
        )
    )
    s = _sess(spark, t)
    s.sql("INSERT OVERWRITE giop PARTITION (g = 1) VALUES (5, 5.0)")
    got = {(r["k"], r["g"], r["v"], r["gen"]) for r in t.read().collect()}
    assert got == {(1, 0, 1.0, 2), (5, 1, 5.0, 10)}


def test_sql_merge_delta_semantics_not_api_fast_paths(spark, tmp_path):
    """Round-12 review 5: SQL MERGE must behave identically with and
    without a trivially-true clause condition — the unconditional
    forms used to route to API fast paths with DIFFERENT semantics
    (source-scoped SET, dup-key keep-all, null-safe insert match)."""
    # (a) SET expressions resolve against the TARGET (Delta scoping)
    t = _mk(spark, tmp_path, rows=3)  # v at k: 0.5*k presumably; read below
    s = _sess(spark, t)
    before = {r["k"]: r["v"] for r in t.read().collect()}
    spark.createDataFrame(
        [(1, 99.0)], "k long, v double"
    ).createOrReplaceTempView("m_src")
    s.sql(
        "MERGE INTO sqlt USING m_src ON sqlt.k = m_src.k "
        "WHEN MATCHED THEN UPDATE SET v = v + 1"
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[1] == before[1] + 1  # target.v + 1, NOT source 99+1

    # (b) duplicate-key sources raise like Delta (not keep-all)
    spark.createDataFrame(
        [(2, 0, 50.0), (2, 0, 60.0)], "k long, g long, v double"
    ).createOrReplaceTempView("m_dup")
    with pytest.raises(ValueError, match="duplicate|multiple"):
        s.sql(
            "MERGE INTO sqlt USING m_dup ON sqlt.k = m_dup.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    # (c) a NULL-key source row INSERTS (ON `=` never matches NULL)
    n_before = t.read().count()
    spark.createDataFrame(
        [(None, 0, 7.0)], "k long, g long, v double"
    ).createOrReplaceTempView("m_null")
    s.sql(
        "MERGE INTO sqlt USING m_null ON sqlt.k = m_null.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert t.read().count() == n_before + 1

    # (d) backticked INSERT column lists resolve; unknown columns raise
    spark.createDataFrame(
        [(100, 1.0)], "k long, v double"
    ).createOrReplaceTempView("m_bt")
    s.sql(
        "MERGE INTO sqlt USING m_bt ON sqlt.k = m_bt.k "
        "WHEN NOT MATCHED THEN INSERT (`k`, `v`) VALUES (m_bt.k, m_bt.v)"
    )
    row = [r for r in t.read().collect() if r["k"] == 100]
    assert row and row[0]["v"] == 1.0
    with pytest.raises(ValueError, match="unknown target column"):
        s.sql(
            "MERGE INTO sqlt USING m_bt ON sqlt.k = m_bt.k "
            "WHEN NOT MATCHED THEN INSERT (typo) VALUES (m_bt.k)"
        )
