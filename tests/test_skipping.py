"""Data skipping + Z-order for ManagedTable (Delta parity: footer
min/max stats collected at commit, consulted by ``scan``; OPTIMIZE
ZORDER BY via ``compact(zorder_by=…)``).

The contract under test is the Delta one: stats may only REMOVE I/O —
``scan(filters)`` must be row-identical to ``read().filter(expr)`` for
every supported filter shape, on every layout (fresh write, merged
table, evolved schema, pre-stats legacy manifest, all-null files).
"""

import datetime
import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="sk", **kw):
    return ManagedTable(spark, name, str(tmp_path / name), **kw)


def _base_df(spark, n=20000):
    return spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 500).alias("a"),
        F.pmod(F.hash("id"), F.lit(500)).alias("b"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 365).cast("int")).alias("d"),
        F.when(F.col("id") % 7 == 0, None)
         .otherwise(F.concat(F.lit("u"), (F.col("id") % 97).cast("string")))
         .alias("s"),
    )


def _assert_scan_equals_filter(t, df, filters, expr):
    got = sorted(t.scan(filters).collect())
    exp = sorted(df.filter(expr).collect())
    assert got == exp


def test_stats_written_and_range_scan_prunes(spark, tmp_path):
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    # range-partition on id so per-file id bounds are disjoint
    t.overwrite(df.repartitionByRange(8, "id"))
    rep = t.skipping_report([("id", "between", 100, 300)])
    assert rep["files_total"] == 8
    assert rep["files_kept"] == 1
    _assert_scan_equals_filter(
        t, df, [("id", "between", 100, 300)], F.col("id").between(100, 300)
    )
    # every supported op round-trips
    cases = [
        ([("id", "=", 12345)], F.col("id") == 12345),
        ([("id", "<", 50)], F.col("id") < 50),
        ([("id", "<=", 50)], F.col("id") <= 50),
        ([("id", ">", 19950)], F.col("id") > 19950),
        ([("id", ">=", 19950)], F.col("id") >= 19950),
        ([("id", "in", [1, 2, 19999])], F.col("id").isin(1, 2, 19999)),
        ([("s", "is_null")], F.col("s").isNull()),
        ([("s", "is_not_null")], F.col("s").isNotNull()),
        (
            [("id", ">=", 1000), ("a", "<", 10)],
            (F.col("id") >= 1000) & (F.col("a") < 10),
        ),
    ]
    for filters, expr in cases:
        _assert_scan_equals_filter(t, df, filters, expr)


def test_point_lookups_prune_most_files(spark, tmp_path):
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(8, "id"))
    for probe in (0, 9999, 19999):
        rep = t.skipping_report([("id", "=", probe)])
        assert rep["files_kept"] == 1, probe
    # out-of-range probe: nothing to read, result still correct (empty)
    rep = t.skipping_report([("id", ">", 10**9)])
    assert rep["files_kept"] == 0
    assert t.scan([("id", ">", 10**9)]).count() == 0


def test_date_range_prunes_after_sorting_layout(spark, tmp_path):
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(8, "d"))
    lo = datetime.date(2024, 12, 1)
    rep = t.skipping_report([("d", ">=", lo)])
    assert rep["files_kept"] < rep["files_total"]
    _assert_scan_equals_filter(
        t, df, [("d", ">=", lo)], F.col("d") >= F.lit("2024-12-01").cast("date")
    )


def test_string_bounds_prune(spark, tmp_path):
    df = _base_df(spark).withColumn(
        "tag", F.concat(F.lit("k"), F.lpad((F.col("id") % 26).cast("string"), 2, "0"))
    )
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(8, "tag"))
    rep = t.skipping_report([("tag", "=", "k13")])
    assert rep["files_kept"] < rep["files_total"]
    _assert_scan_equals_filter(t, df, [("tag", "=", "k13")], F.col("tag") == "k13")


def test_merge_carries_stats_for_untouched_partitions(spark, tmp_path):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    df = _base_df(spark, 4000).withColumn("y", (F.col("id") % 4).cast("int"))
    t = _mk(spark, tmp_path, partition_columns=["y"])
    t.overwrite(df)
    before = t.skipping_report([("id", "<", 0)])
    assert before["files_kept"] == 0  # every file has id >= 0
    # keyed upsert touching only partition y=1; y=0/2/3 files carry over
    src = (
        spark.range(4000, 4100)
        .select(
            F.col("id"), (F.col("id") % 500).alias("a"),
            F.pmod(F.hash("id"), F.lit(500)).alias("b"),
            F.lit(datetime.date(2025, 6, 1)).alias("d"),
            F.lit("new").alias("s"), F.lit(1).alias("y"),
        )
    )
    t.merge_upsert(src, key_columns=["id", "y"])
    after = t.skipping_report([])
    assert after["rows_total"] == 4100
    # negative-range probe still proves emptiness across old + new files
    assert t.skipping_report([("id", "<", 0)])["files_kept"] == 0
    # the new rows are findable and pruning keeps only their files
    rep = t.skipping_report([("id", ">=", 4000)])
    assert 0 < rep["files_kept"] < rep["files_total"]
    assert t.scan([("id", ">=", 4000)]).count() == 100


def test_all_null_file_skipped_for_comparisons(spark, tmp_path):
    t = _mk(spark, tmp_path)
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(3, None), (4, None)], "id long, v string")
    t.overwrite(a.coalesce(1))
    t.merge_insert_only(b.coalesce(1))
    assert t.skipping_report([])["files_total"] == 2
    # comparison can never match the all-null-v file
    assert t.skipping_report([("v", "=", "x")])["files_kept"] == 1
    # is_null keeps only the file that HAS nulls
    assert t.skipping_report([("v", "is_null")])["files_kept"] == 1
    assert sorted(r.id for r in t.scan([("v", "is_null")]).collect()) == [3, 4]
    assert t.skipping_report([("v", "is_not_null")])["files_kept"] == 1


def test_legacy_manifest_without_stats_never_skips(spark, tmp_path):
    df = _base_df(spark, 2000)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(4, "id"))
    # simulate a manifest written before stats existed
    mpath = t._manifest_path(t.current_version())
    with open(mpath) as f:
        m = json.load(f)
    m.pop("stats")
    with open(mpath, "w") as f:
        json.dump(m, f)
    t2 = ManagedTable(spark, t.name, t.location)
    rep = t2.skipping_report([("id", "=", 5)])
    assert rep["files_kept"] == rep["files_total"]  # unprunable, not wrong
    _assert_scan_equals_filter(t2, df, [("id", "=", 5)], F.col("id") == 5)


def test_scan_after_schema_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.merge_insert_only(
        spark.createDataFrame([(3, "c", 9.5)], "id long, v string, score double"),
        merge_schema=True,
    )
    # old files have no 'score' stats → unprunable for it → kept,
    # null-filled by the widened read schema; predicate still exact
    rows = t.scan([("score", "is_null")]).collect()
    assert sorted(r.id for r in rows) == [1, 2]
    rows = t.scan([("score", ">", 9.0)]).collect()
    assert [r.id for r in rows] == [3]


def test_zorder_compact_improves_two_column_pruning(spark, tmp_path):
    df = _base_df(spark)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(16, "id"))
    q = [("a", "between", 0, 40), ("b", "between", 0, 40)]
    before = t.skipping_report(q)
    assert before["files_kept"] == before["files_total"]  # a,b random per file
    t.compact(zorder_by=["a", "b"], target_files=16)
    after = t.skipping_report(q)
    assert after["files_total"] == 16
    assert after["files_kept"] <= before["files_kept"] // 2
    _assert_scan_equals_filter(
        t, df, q, F.col("a").between(0, 40) & F.col("b").between(0, 40)
    )
    # full content unchanged by the rewrite
    assert sorted(t.read().collect()) == sorted(df.collect())


def test_zorder_handles_date_column_and_nulls(spark, tmp_path):
    df = _base_df(spark, 5000).withColumn(
        "d2", F.when(F.col("id") % 11 == 0, None).otherwise(F.col("d"))
    )
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(8, "id"))
    t.compact(zorder_by=["d2", "a"], target_files=8)
    assert sorted(t.read().collect()) == sorted(df.collect())
    q = [("d2", ">=", datetime.date(2024, 11, 1)), ("a", "<", 50)]
    rep = t.skipping_report(q)
    assert rep["files_kept"] < rep["files_total"]
    _assert_scan_equals_filter(
        t, df, q,
        (F.col("d2") >= F.lit("2024-11-01").cast("date")) & (F.col("a") < 50),
    )


def test_bad_filters_raise(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError):
        t.scan([("id", "like", "x")])
    with pytest.raises(ValueError):
        t.scan([("id",)])


def test_zorder_on_partitioned_table(spark, tmp_path):
    """ZORDER under hive partitioning: rows route to their partition
    dirs regardless of the Z-shuffle, every partition's files carry
    stats, and scan composes partition recovery with file pruning."""
    df = _base_df(spark, 8000).withColumn("y", (F.col("id") % 2).cast("int"))
    t = _mk(spark, tmp_path, partition_columns=["y"])
    t.overwrite(df)
    t.compact(zorder_by=["a", "b"], target_files=8)
    assert sorted(t.read().drop("y").collect()) == sorted(df.drop("y").collect())
    q = [("a", "between", 0, 40), ("b", "between", 0, 40)]
    rep = t.skipping_report(q)
    assert rep["files_kept"] < rep["files_total"]
    got = sorted(t.scan(q).drop("y").collect())
    exp = sorted(
        df.filter(F.col("a").between(0, 40) & F.col("b").between(0, 40))
        .drop("y").collect()
    )
    assert got == exp
    # partition-column predicate composes with stats pruning
    got2 = sorted(t.scan(q + [("y", "=", 1)]).drop("y").collect())
    exp2 = sorted(
        df.filter(
            F.col("a").between(0, 40) & F.col("b").between(0, 40) & (F.col("y") == 1)
        ).drop("y").collect()
    )
    assert got2 == exp2


# --------------------------------------------------------------------------
# property-based: for ANY conjunction of filters, the pruned scan is
# row-identical to the unpruned filter (skipping may only remove I/O)

_SKIP_OPS = st.sampled_from(["=", "<", "<=", ">", ">=", "between", "in",
                             "is_null", "is_not_null"])


def _mk_filter(col, op, lo, hi):
    if op == "is_null" or op == "is_not_null":
        return (col, op)
    if op == "between":
        return (col, "between", min(lo, hi), max(lo, hi))
    if op == "in":
        return (col, "in", [lo, hi, lo + 7])
    return (col, op, lo)


@pytest.fixture(scope="module")
def prop_table(spark, tmp_path_factory):
    """One shared table with a mixed layout: an id-ranged write merged
    with a second unsorted batch, so files have both tight and wide
    bounds — the layouts pruning decisions actually face."""
    root = tmp_path_factory.mktemp("prop")
    df = _base_df(spark, 6000)
    t = ManagedTable(spark, "prop", str(root / "t"))
    t.overwrite(df.filter(F.col("id") < 5000).repartitionByRange(5, "id"))
    t.merge_insert_only(df.filter(F.col("id") >= 5000).repartition(2))
    return t, df


@given(
    data=st.data(),
    n_filters=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=30, deadline=None)
@pytest.mark.slow
def test_scan_equals_filter_for_any_conjunction(prop_table, data, n_filters):
    t, df = prop_table
    filters = []
    for _ in range(n_filters):
        col = data.draw(st.sampled_from(["id", "a", "b", "s"]))
        op = data.draw(_SKIP_OPS)
        if col == "s":
            # string domain: u0..u96 plus out-of-domain probes
            lo = data.draw(st.sampled_from(["u0", "u42", "u96", "a", "zzz"]))
            hi = data.draw(st.sampled_from(["u13", "u88", "m"]))
            if op == "in":
                filters.append((col, "in", [lo, hi]))
            elif op == "between":
                filters.append((col, "between", min(lo, hi), max(lo, hi)))
            elif op in ("is_null", "is_not_null"):
                filters.append((col, op))
            else:
                filters.append((col, op, lo))
        else:
            # include far-out-of-domain values to exercise empty prunes
            lo = data.draw(st.integers(min_value=-100, max_value=7000))
            hi = data.draw(st.integers(min_value=-100, max_value=7000))
            filters.append(_mk_filter(col, op, lo, hi))
    expr = t._filter_expr(filters)
    got = t.scan(filters).count()
    exp = df.filter(expr).count()
    assert got == exp, filters
    # spot-check content equality, not just cardinality
    got_ids = sorted(r.id for r in t.scan(filters).select("id").collect())
    exp_ids = sorted(r.id for r in df.filter(expr).select("id").collect())
    assert got_ids == exp_ids, filters


def test_stat_scalar_widens_decimal_bounds_and_utcifies():
    """Pure-unit soundness edges: Decimal bounds widen OUTWARD by one
    ulp when float() is lossy (a min rounded up / max rounded down
    could wrongly prune a boundary probe); tz-aware timestamps
    normalize to naive UTC so the ISO strings stay order-comparable."""
    import datetime as dt
    import decimal as dec

    from databricks_data_warehouse_spark.sources.tables import _stat_scalar

    # 0.1 is lossy in binary: min must come out <= the true value,
    # max >= it
    d = dec.Decimal("0.1")
    mn = _stat_scalar(d, round_toward=float("-inf"))
    mx = _stat_scalar(d, round_toward=float("inf"))
    assert dec.Decimal(mn) <= d <= dec.Decimal(mx) and mn < mx
    # exact decimals don't widen; filter literals (no direction) don't
    assert _stat_scalar(dec.Decimal("0.5"), round_toward=float("inf")) == 0.5
    assert _stat_scalar(d) == float(d)
    # tz-aware == its UTC wall-clock naive twin
    aware = dt.datetime(2024, 6, 1, 12, 0, tzinfo=dt.timezone(dt.timedelta(hours=2)))
    naive_utc = dt.datetime(2024, 6, 1, 10, 0)
    assert _stat_scalar(aware) == _stat_scalar(naive_utc)


def test_decimal_column_scan_roundtrip(spark, tmp_path):
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id").cast("decimal(12,2)") / 7).alias("amt"),
    )
    t = _mk(spark, tmp_path, name="decs")
    t.overwrite(df.repartitionByRange(4, "id"))
    import decimal as dec
    probe = [("amt", ">=", dec.Decimal("100.00"))]
    got = sorted(r.id for r in t.scan(probe).collect())
    exp = sorted(
        r.id for r in df.filter(F.col("amt") >= dec.Decimal("100.00")).collect()
    )
    assert got == exp
    # this pyarrow cannot extract decimal footer stats — the column must
    # degrade to un-indexable (keep every file), never to a wrong skip;
    # the id column still indexes alongside it
    rep = t.skipping_report(probe)
    assert rep["files_kept"] == rep["files_total"]
    # the id column still indexes alongside (range boundaries are
    # sample-based, so the probe may straddle two files)
    id_rep = t.skipping_report([("id", "<", 500)])
    assert id_rep["files_kept"] < id_rep["files_total"]


def test_metadata_aggregate_matches_scan(spark, tmp_path):
    """COUNT/MIN/MAX from manifest stats must equal the real aggregates
    — O(manifest), no data read (the Delta metadata-only-query path)."""
    df = _base_df(spark, 3000)
    t = _mk(spark, tmp_path, name="ma")
    t.overwrite(df.repartitionByRange(4, "id"))
    t.merge_insert_only(
        _base_df(spark, 3500).filter(F.col("id") >= 3000).repartition(2)
    )
    agg = t.metadata_aggregate("id", "a", "s")
    real = t.read().agg(
        F.count("*").alias("n"),
        F.min("id").alias("mn"), F.max("id").alias("mx"),
        F.min("a").alias("amn"), F.max("a").alias("amx"),
        F.sum(F.col("s").isNull().cast("long")).alias("snull"),
    ).collect()[0]
    assert agg["count"] == real.n == 3500
    assert agg["id"] == {"min": real.mn, "max": real.mx, "null_count": 0}
    assert agg["a"]["min"] == real.amn and agg["a"]["max"] == real.amx
    # string footer stats may be truncated bounds: null_count (exact)
    # is reported, min/max are withheld rather than possibly wrong
    assert agg["s"] == {"null_count": real.snull} and real.snull > 0
    with pytest.raises(ValueError, match="unknown column"):
        t.metadata_aggregate("nope")
    # a pre-stats snapshot refuses rather than guessing
    mpath = t._manifest_path(t.current_version())
    with open(mpath) as f:
        m = json.load(f)
    m["stats"] = {}
    with open(mpath, "w") as f:
        json.dump(m, f)
    t2 = ManagedTable(spark, t.name, t.location)
    with pytest.raises(ValueError, match="metadata aggregate unavailable"):
        t2.metadata_aggregate("id")


# ---------------------------------------------------------------------------
# Partition values as per-file stats: a partition-column filter must
# prune on the plain `scan` path (not only the SQL pushdown reader),
# with the date/timestamp encoding matching the filter literal's.
# ---------------------------------------------------------------------------


def test_partition_filter_prunes_on_scan(spark, tmp_path):
    df = _base_df(spark, n=3000).withColumn("y", (F.col("id") % 3).cast("int"))
    t = _mk(spark, tmp_path, "part_scan", partition_columns=["y"])
    t.overwrite(df)
    rep = t.skipping_report([("y", "=", 1)])
    assert rep["files_kept"] < rep["files_total"]
    assert rep["rows_kept_bound"] == 1000
    _assert_scan_equals_filter(t, df, [("y", "=", 1)], F.col("y") == 1)
    # range op on the partition column prunes too
    rep2 = t.skipping_report([("y", ">=", 2)])
    assert rep2["rows_kept_bound"] == 1000
    _assert_scan_equals_filter(t, df, [("y", ">=", 2)], F.col("y") >= 2)


def test_date_partition_filter_prunes_on_scan(spark, tmp_path):
    df = _base_df(spark, n=900).withColumn(
        "pd",
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 3).cast("int")
        ),
    )
    t = _mk(spark, tmp_path, "part_date", partition_columns=["pd"])
    t.overwrite(df)
    probe = datetime.date(2024, 1, 2)
    rep = t.skipping_report([("pd", "=", probe)])
    assert rep["rows_kept_bound"] == 300
    assert rep["files_kept"] < rep["files_total"]
    _assert_scan_equals_filter(t, df, [("pd", "=", probe)], F.col("pd") == probe)
    # between over the date partition
    _assert_scan_equals_filter(
        t,
        df,
        [("pd", "between", datetime.date(2024, 1, 1), datetime.date(2024, 1, 2))],
        F.col("pd").between("2024-01-01", "2024-01-02"),
    )


def test_null_partition_prunes_both_ways(spark, tmp_path):
    df = _base_df(spark, n=700).withColumn(
        "p", F.when(F.col("id") % 2 == 0, F.lit("even"))
    )
    t = _mk(spark, tmp_path, "part_null", partition_columns=["p"])
    t.overwrite(df)
    rep_null = t.skipping_report([("p", "is_null")])
    assert rep_null["files_kept"] < rep_null["files_total"]
    _assert_scan_equals_filter(t, df, [("p", "is_null")], F.col("p").isNull())
    rep_nn = t.skipping_report([("p", "=", "even")])
    assert rep_nn["files_kept"] < rep_nn["files_total"]
    _assert_scan_equals_filter(t, df, [("p", "=", "even")], F.col("p") == "even")


def test_partition_stats_agree_across_prune_paths(spark, tmp_path):
    df = _base_df(spark, n=1200).withColumn("y", (F.col("id") % 4).cast("int"))
    drv = _mk(spark, tmp_path, "pp_paths", partition_columns=["y"])
    drv.overwrite(df)
    dist = ManagedTable(
        spark,
        "pp_paths",
        str(tmp_path / "pp_paths"),
        distributed_prune_threshold=1,
    )
    for filters in ([("y", "=", 2)], [("y", "in", [0, 3])], [("y", "<", 2)]):
        a = drv._prune(filters, None)
        b = dist._prune(filters, None)
        assert sorted(a[0]) == sorted(b[0])
        assert a[1:] == b[1:]
