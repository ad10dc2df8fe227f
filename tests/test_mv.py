"""Change-feed-driven incremental MV maintenance (pipelines/mv.py):
incremental state equals a from-scratch aggregate at EVERY refresh
point across DV deletes, DV updates, copy-on-write rewrites and
appends; replays are txn-watermark no-ops.
"""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.pipelines.mv import (
    refresh_count_cents_mv,
)
from databricks_data_warehouse_spark.queries._util import cents
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _expected(src):
    return {
        r["g"]: (r["n"], r["c"])
        for r in src.read()
        .groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("v"))).alias("c"),
        )
        .collect()
    }


def _state(mv):
    return {
        r["g"]: (r["n_rows"], r["total_cents"])
        for r in mv.read().collect()
    }


@pytest.mark.slow
def test_mv_tracks_every_mutation_kind(spark, tmp_path):
    src = ManagedTable(spark, "mvsrc", str(tmp_path / "mvsrc"))
    mv = ManagedTable(spark, "mvagg", str(tmp_path / "mvagg"))
    src.overwrite(
        spark.range(0, 100).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    refresh_count_cents_mv(src, mv, ["g"], "v")
    assert _state(mv) == _expected(src)
    # DV delete
    src.delete_where(F.col("k") < 10)
    refresh_count_cents_mv(src, mv, ["g"], "v")
    assert _state(mv) == _expected(src)
    # DV update (delete+insert pairs in the feed)
    src.update_where({"v": "v + 2.25"}, F.col("g") == 1)
    refresh_count_cents_mv(src, mv, ["g"], "v")
    assert _state(mv) == _expected(src)
    # append
    src.append(
        spark.range(200, 220).select(
            F.col("id").alias("k"), F.lit(7).alias("g"),
            F.lit(3.5).alias("v"),
        )
    )
    # copy-on-write rewrite (full-diff pair in the feed)
    src.delete_where(F.col("k") % 9 == 0, deletion_vectors=False)
    refresh_count_cents_mv(src, mv, ["g"], "v")
    assert _state(mv) == _expected(src)
    # exactly-once: a replayed refresh is a commit-free no-op
    before = mv.current_version()
    refresh_count_cents_mv(src, mv, ["g"], "v")
    assert mv.current_version() == before


def test_mv_staged_refresh_matches_each_version(spark, tmp_path):
    src = ManagedTable(spark, "mvs2", str(tmp_path / "mvs2"))
    mv = ManagedTable(spark, "mva2", str(tmp_path / "mva2"))
    src.overwrite(
        spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g"),
            (F.col("id") + 0.25).alias("v"),
        )
    )
    src.delete_where(F.col("k") >= 40)          # v1
    src.update_where({"v": "v * 2"}, F.col("g") == 0)  # v2
    for upto in (0, 1, 2):
        refresh_count_cents_mv(src, mv, ["g"], "v", to_version=upto)
        want = {
            r["g"]: (r["n"], r["c"])
            for r in src.read(version=upto)
            .groupBy("g")
            .agg(
                F.count("*").alias("n"),
                F.sum(cents(F.col("v"))).alias("c"),
            )
            .collect()
        }
        assert _state(mv) == want, upto


def test_mv_null_group_key_folds(spark, tmp_path):
    """Round-12 review 5: the MV's old/delta merge joined group keys
    with '=', so a NULL key appended one extra row per refresh instead
    of folding into its group."""
    from databricks_data_warehouse_spark.pipelines.mv import (
        refresh_count_cents_mv,
    )
    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    src = ManagedTable(spark, "mvn_src", str(tmp_path / "mvn_src"))
    src.overwrite(
        spark.createDataFrame(
            [("a", 1.0), (None, 2.0)], "g string, amt double"
        )
    )
    mv = ManagedTable(spark, "mvn", str(tmp_path / "mvn"))
    refresh_count_cents_mv(src, mv, ["g"], "amt")
    src.append(spark.createDataFrame([(None, 3.0)], "g string, amt double"))
    refresh_count_cents_mv(src, mv, ["g"], "amt")
    rows = sorted(
        ((r["g"], r["n_rows"], r["total_cents"]) for r in mv.read().collect()),
        key=lambda x: (x[0] is None, x[0] or ""),
    )
    assert rows == [("a", 1, 100), (None, 2, 500)]
