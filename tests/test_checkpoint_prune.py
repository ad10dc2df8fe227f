"""Manifest stats checkpoint + distributed pruning (VERDICT r06 item 2).

Delta scales data skipping past the driver by checkpointing its log to
parquet and evaluating skipping predicates as a query over the
checkpoint's add-file stats. Same here: ``checkpoint()`` writes the
per-file stats as typed parquet every ``_CHECKPOINT_INTERVAL`` commits,
and above ``distributed_prune_threshold`` files ``_prune`` evaluates
``_file_matches`` as ONE Spark job (``_keep_expr``) instead of a
per-file Python loop. The contract under test: the distributed decision
is IDENTICAL to the driver loop for every filter shape — same kept
files, same totals — so moving the evaluation can never change results.
"""

import pytest

import datetime
import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _mk(spark, tmp_path, name="ck", **kw):
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
    )


def _both(spark, t):
    """The same table through the driver loop and the forced
    distributed path."""
    dist = ManagedTable(
        spark, t.name, t.location, distributed_prune_threshold=0
    )
    return t, dist


def _assert_parity(drv, dist, filters):
    a = drv._prune(filters, None)
    b = dist._prune(filters, None)
    assert sorted(a[0]) == sorted(b[0]), filters  # same kept files
    assert a[1:] == b[1:], filters  # legacy dirs + all counters


FILTER_CASES = [
    [],
    [("id", "between", 100, 300)],
    [("id", "=", 12345)],
    [("id", "<", 50)],
    [("id", "<=", 50)],
    [("id", ">", 19950)],
    [("id", ">=", 19950)],
    [("id", "in", [1, 2, 19999])],
    [("id", "in", [])],
    [("s", "is_null")],
    [("s", "is_not_null")],
    [("s", "=", "u13")],
    [("s", "between", "u1", "u2")],
    [("d", ">=", datetime.date(2024, 12, 1))],
    [("d", "between", datetime.date(2024, 2, 1), datetime.date(2024, 2, 28))],
    [("id", ">=", 1000), ("a", "<", 10)],
    [("id", ">", 10**9)],
    [("a", "=", 3), ("s", "is_not_null"), ("id", "<", 5000)],
    # kind-mismatched literals: un-comparable, must keep everywhere
    [("id", "=", "not-a-number")],
    [("s", "<", 42)],
    [("id", "between", 5, "x")],
    [("id", "in", [1, "x"])],
]


@pytest.mark.slow
def test_distributed_prune_matches_driver_loop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_base_df(spark).repartitionByRange(8, "id"))
    drv, dist = _both(spark, t)
    for filters in FILTER_CASES:
        _assert_parity(drv, dist, filters)


def test_distributed_scan_rows_exact(spark, tmp_path):
    df = _base_df(spark)
    t = _mk(spark, tmp_path, distributed_prune_threshold=0)
    t.overwrite(df.repartitionByRange(8, "id"))
    got = sorted(t.scan([("id", "between", 100, 300)]).collect())
    exp = sorted(df.filter(F.col("id").between(100, 300)).collect())
    assert got == exp
    rep = t.skipping_report([("id", "between", 100, 300)])
    assert rep["files_kept"] == 1 and rep["files_total"] == 8


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    filters=st.lists(
        st.one_of(
            st.tuples(
                st.sampled_from(["id", "a", "s", "d"]),
                st.sampled_from(["=", "<", "<=", ">", ">="]),
                st.one_of(
                    st.integers(-100, 21000),
                    st.text("ux0123456789", min_size=0, max_size=4),
                ),
            ),
            st.tuples(
                st.sampled_from(["id", "a"]),
                st.just("between"),
                st.integers(-100, 21000),
                st.integers(-100, 21000),
            ),
            st.tuples(
                st.sampled_from(["id", "s"]),
                st.just("in"),
                st.lists(st.integers(0, 20000), max_size=4),
            ),
            st.tuples(
                st.sampled_from(["id", "a", "s", "d"]),
                st.sampled_from(["is_null", "is_not_null"]),
            ),
        ),
        min_size=1,
        max_size=3,
    )
)
@pytest.mark.slow
def test_prune_mode_parity_property(spark, tmp_path_factory, filters):
    global _PROP_TABLES
    try:
        drv, dist = _PROP_TABLES
    except NameError:
        tmp = tmp_path_factory.mktemp("prop")
        t = ManagedTable(spark, "prop", str(tmp / "prop"))
        t.overwrite(_base_df(spark, 8000).repartitionByRange(6, "id"))
        _PROP_TABLES = _both(spark, t)
        drv, dist = _PROP_TABLES
    _assert_parity(drv, dist, filters)


def test_auto_checkpoint_every_interval(spark, tmp_path):
    from databricks_data_warehouse_spark.sources.tables import (
        _CHECKPOINT_INTERVAL,
    )

    t = _mk(spark, tmp_path)
    t.overwrite(spark.range(2).select(F.col("id")))
    for i in range(_CHECKPOINT_INTERVAL):
        t.merge_insert_only(
            spark.range(100 + i, 101 + i).select(F.col("id"))
        )
    assert t.current_version() == _CHECKPOINT_INTERVAL
    assert os.path.isdir(t._ckpt_path(_CHECKPOINT_INTERVAL))
    # the checkpointed snapshot is what the distributed path reads
    dist = ManagedTable(
        spark, t.name, t.location, distributed_prune_threshold=0
    )
    _assert_parity(t, dist, [("id", ">=", 100)])
    got = sorted(r.id for r in dist.scan([("id", ">=", 100)]).collect())
    assert got == sorted(range(100, 100 + _CHECKPOINT_INTERVAL))


def test_checkpoint_stale_version_not_used_after_merge(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_base_df(spark, 2000).repartitionByRange(4, "id"))
    t.checkpoint()  # v0 checkpoint
    t.merge_insert_only(
        spark.createDataFrame(
            [(90000, 1, datetime.date(2025, 1, 1), "zz")],
            "id long, a long, d date, s string",
        )
    )
    # v1 has no checkpoint: distributed path builds from the manifest
    dist = ManagedTable(
        spark, t.name, t.location, distributed_prune_threshold=0
    )
    _assert_parity(t, dist, [("id", ">=", 90000)])
    assert dist.scan([("id", ">=", 90000)]).count() == 1


def test_checkpoint_retention_and_vacuum(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.range(5).select(F.col("id")))
    for v in range(3):
        t.merge_insert_only(spark.range(100 + v, 101 + v).select(F.col("id")))
        t.checkpoint()
    names = sorted(os.listdir(t._ckpt_root))
    assert names == ["v=2", "v=3"]  # newest two retained
    t.vacuum(keep=1)
    assert sorted(os.listdir(t._ckpt_root)) == ["v=3"]


def test_legacy_manifest_distributed_mode(spark, tmp_path):
    df = _base_df(spark, 2000)
    t = _mk(spark, tmp_path)
    t.overwrite(df.repartitionByRange(4, "id"))
    mpath = t._manifest_path(t.current_version())
    with open(mpath) as f:
        m = json.load(f)
    m.pop("stats")
    with open(mpath, "w") as f:
        json.dump(m, f)
    dist = ManagedTable(
        spark, t.name, t.location, distributed_prune_threshold=0
    )
    rep = dist.skipping_report([("id", "=", 5)])
    assert rep["files_kept"] == rep["files_total"]  # unprunable, not wrong
    got = sorted(dist.scan([("id", "=", 5)]).collect())
    assert got == sorted(df.filter(F.col("id") == 5).collect())


def test_huge_int_bounds_stay_sound(spark, tmp_path):
    """Int bounds beyond 2^53: double widening may keep extra files but
    must never prune a file containing a match."""
    big = 2**53
    df = spark.createDataFrame(
        [(big + 1,), (big + 3,)], "v long"
    )
    t = _mk(spark, tmp_path, distributed_prune_threshold=0)
    t.overwrite(df.coalesce(1))
    for probe in (big + 1, big + 2, big + 3):
        got = {r.v for r in t.scan([("v", "=", probe)]).collect()}
        exp = {r.v for r in df.filter(F.col("v") == probe).collect()}
        assert got == exp, probe
