"""Behavioral analytics (funnel, retention), robust stats (MAD), and
embedding quantization invariants (ext/json_ops.py, ext/similarity.py,
queries/aggregates.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext import json_ops, similarity
from databricks_data_warehouse_spark.queries import aggregates

SF = "/root/testdata/sf0.001"


def test_funnel_is_monotone_and_bounded(spark):
    rows = {r["stage"]: r for r in json_ops.events_funnel(spark, SF).collect()}
    assert set(rows) == {"signup", "view", "click", "purchase"}
    users = [
        rows[s]["users"] for s in ("signup", "view", "click", "purchase")
    ]
    # each stage requires the previous one strictly before it
    assert users == sorted(users, reverse=True)
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert users[0] <= n_users
    assert rows["signup"]["pct_of_entry"] == 100.0


def test_funnel_strict_order_on_tiny_frame(spark, tmp_path):
    """Hand-built frame: user 1 completes the funnel in order, user 2
    views BEFORE signing up (must stop at signup), user 3 never signs
    up (must not be counted at all)."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, "signup", t(0)), (1, "view", t(1)),
            (1, "click", t(2)), (1, "purchase", t(3)),
            (2, "view", t(0)), (2, "signup", t(1)), (2, "click", t(2)),
            (3, "view", t(0)), (3, "click", t(1)), (3, "purchase", t(2)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    out = tmp_path / "events.parquet"
    df.write.parquet(str(out.parent / "events.parquet"), mode="overwrite")
    rows = {
        r["stage"]: r["users"]
        for r in json_ops.events_funnel(spark, str(tmp_path)).collect()
    }
    assert rows == {"signup": 2, "view": 1, "click": 1, "purchase": 1}


def test_retention_day0_equals_cohort_size(spark):
    out = json_ops.events_retention(spark, SF)
    day0 = out.filter(F.col("day_offset") == 0)
    assert day0.count() > 0
    # every user is active on their first day → day-0 retention is 100%
    assert (
        day0.filter(F.col("retention_pct") != 100.0).count() == 0
    )
    assert out.filter(
        (F.col("day_offset") < 0) | (F.col("day_offset") >= 14)
    ).count() == 0
    # retention never exceeds the cohort size
    assert out.filter(F.col("retention_pct") > 100.0).count() == 0


def test_mad_zero_for_constant_values(spark, tmp_path):
    import datetime as dt

    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1), 1, "a", 5.0, "{}")
            for i in range(10)
        ]
        + [(100 + i, dt.datetime(2024, 1, 1), 1, "b", float(i), "{}") for i in range(5)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"), mode="overwrite")
    rows = {
        r["event_type"]: r
        for r in aggregates.agg_value_mad(spark, str(tmp_path)).collect()
    }
    assert rows["a"]["median_value"] == 5.0
    assert rows["a"]["mad"] == 0.0  # constant series: MAD must be 0
    assert rows["b"]["median_value"] == 2.0
    assert rows["b"]["mad"] == 1.0  # 0..4 → |x-2| = [2,1,0,1,2] → median 1


def test_quantize_roundtrip_error_bound(spark):
    out = similarity.emb_quantize_int8(spark, SF).collect()
    emb_dim = len(
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("embedding")
        .first()[0]
    )
    for r in out:
        codes = [int(c) for c in r["codes"].split(",")]
        assert len(codes) == emb_dim
        # int8 range by construction of the symmetric scale
        assert all(-127 <= c <= 127 for c in codes)
        # reconstruction error bounded by half a quantization step
        assert r["max_abs_err"] <= r["qscale"] / 2 + 1e-12


def test_quantize_all_zero_vector(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, [0.0] * 4, 1), (1, [1.0, -2.0, 0.5, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"), mode="overwrite")
    rows = {
        r["vec_id"]: r
        for r in similarity.emb_quantize_int8(spark, str(tmp_path)).collect()
    }
    assert rows[0]["qscale"] == 0.0
    assert rows[0]["codes"] == "0,0,0,0"
    assert rows[0]["max_abs_err"] == 0.0
    # max|x| maps to ±127 exactly
    assert max(abs(int(c)) for c in rows[1]["codes"].split(",")) == 127


def test_label_centroids_cover_corpus(spark):
    out = similarity.emb_centroid_per_label(spark, SF)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_vecs = emb.count()
    dims = len(emb.select("embedding").first()[0])
    labels = emb.select("label").distinct().count()
    assert out.count() == labels * dims
    # for any fixed dim, the per-label counts partition the corpus
    per_dim = (
        out.groupBy("dim").agg(F.sum("n_vectors").alias("s")).collect()
    )
    assert all(r["s"] == n_vecs for r in per_dim)
    # a mean is bounded by the elements it averages
    bounds = out.agg(F.min("centroid_val"), F.max("centroid_val")).first()
    assert -1.5 < bounds[0] <= bounds[1] < 1.5


def test_kmeans_refine_partitions_corpus(spark):
    out = similarity.ann_kmeans_refine(spark, SF)
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    per_dim = (
        out.groupBy("dim").agg(F.sum("n_assigned").alias("s")).collect()
    )
    # every vector is assigned to exactly one centroid
    assert all(r["s"] == n_vecs for r in per_dim)
    assert out.select("centroid_id").distinct().count() <= 16


def test_scd2_intervals_are_contiguous(spark):
    from databricks_data_warehouse_spark.ext.json_ops import events_scd2_status

    hist = events_scd2_status(spark, SF).cache()
    # exactly one open (current) interval per user
    per_user = (
        hist.groupBy("user_id")
        .agg(
            F.sum(F.col("is_current").cast("long")).alias("n_current"),
            F.count("*").alias("n_versions"),
            F.max("version").alias("max_version"),
        )
        .collect()
    )
    assert all(r["n_current"] == 1 for r in per_user)
    # versions are 1..n dense
    assert all(r["max_version"] == r["n_versions"] for r in per_user)
    # each interval ends exactly where the next begins, and no run of
    # equal statuses survives collapsing
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    seams = hist.select(
        "user_id",
        "status",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("status").over(w).alias("next_status"),
    ).where(F.col("next_from").isNotNull())
    assert seams.where(F.col("valid_to") != F.col("next_from")).count() == 0
    assert seams.where(F.col("status") == F.col("next_status")).count() == 0
    hist.unpersist()


def test_bm25_ranks_term_rich_docs(spark):
    from databricks_data_warehouse_spark.ext.packing import text_bm25

    rows = text_bm25(spark, SF).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # the top doc really contains at least one query term
    top = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("doc_id") == rows[0]["doc_id"])
        .first()
    )
    assert any(t in top["text"] for t in ("join", "stream", "merge"))


def test_approx_percentile_rank_error_bound(spark):
    """Pin the approx-percentile sketch's accuracy against the exact
    twin (VERDICT r04 item 8): for every priority group, the approx
    value's rank among the group's sorted delays must sit within
    n/accuracy of the target rank (Spark's documented
    approx_percentile guarantee; accuracy=10000 in the operator).

    The operator itself now reports deterministic-bound verdicts
    (VERDICT r08 item 7), so the raw sketch values are recomputed
    here with the operator's exact aggregation parameters and the
    operator's flags are asserted TRUE alongside the rank pin."""
    approx_flags = {
        r["o_orderpriority"]: r
        for r in aggregates.agg_delay_percentiles_approx(spark, SF).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in aggregates.agg_delay_percentiles(spark, SF).collect()
    }
    assert set(approx_flags) == set(exact)
    for prio, row in approx_flags.items():
        assert row["p50_within_bound"] and row["p90_within_bound"], prio

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    delays = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("delay"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sort_array(F.collect_list("delay")).alias("ds"),
            F.expr("approx_percentile(delay, 0.5, 10000)").alias("p50_delay_approx"),
            F.expr("approx_percentile(delay, 0.9, 10000)").alias("p90_delay_approx"),
        )
        .collect()
    )
    for row in delays:
        ds, prio = row["ds"], row["o_orderpriority"]
        n = len(ds)
        eps = max(1.0, n / 10000.0)  # rank tolerance: sketch bound, min 1
        for p, col in ((0.5, "p50_delay_approx"), (0.9, "p90_delay_approx")):
            v = row[col]
            target = p * (n - 1)
            lo = sum(1 for d in ds if d < v)   # lowest rank v could hold
            hi = sum(1 for d in ds if d <= v) - 1  # highest rank
            assert lo - eps <= target <= hi + eps, (
                f"{prio} p{int(p*100)}: approx={v} rank∈[{lo},{hi}] "
                f"target={target} n={n}"
            )
            # approx_percentile returns an actual data value (no
            # interpolation), so it must be an element of the group —
            # the value-level complement of the rank bound above (the
            # exact twin interpolates, so value distance to it is
            # bounded by the local data gap, not by a constant)
            assert v in ds
