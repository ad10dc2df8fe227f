"""Deterministic sampling/split invariants (ext/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext import sampling

SF = "/root/testdata/sf0.001"


def test_hash_split_partitions_every_row_once(spark):
    out = sampling.sample_hash_split(spark, SF)
    total = out.count()
    assert total == spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.select("doc_id").distinct().count() == total
    counts = dict(
        out.groupBy("split").count().collect()[i][0:2]
        for i in range(out.select("split").distinct().count())
    )
    assert set(counts) <= {"train", "val", "test"}
    # 80/10/10 within generous tolerance at n=500
    assert counts["train"] / total > 0.7
    assert counts["val"] / total < 0.2
    assert counts["test"] / total < 0.2


def test_hash_split_stable_across_partitioning(spark):
    """The split is a pure row function: repartitioning must not move
    any row to a different split (the df.randomSplit failure mode)."""
    a = sampling.sample_hash_split(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(7, "lang")
    key = F.concat(F.lit("doc|"), F.col("doc_id").cast("string"))
    b = docs.select(
        "doc_id",
        sampling.split_column(
            key, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).alias("split"),
    )
    diff = (
        a.select("doc_id", "split")
        .exceptAll(b.select("doc_id", "split"))
        .count()
    )
    assert diff == 0


def test_stratified_sample_respects_per_stratum_fraction(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept = {
        r["lang"]: r["count"]
        for r in sampling.sample_stratified(spark, SF).groupBy("lang").count().collect()
    }
    for lang, frac in sampling.STRATA_FRACTIONS.items():
        if lang in base:
            got = kept.get(lang, 0) / base[lang]
            assert abs(got - frac) < 0.15, (lang, got, frac)
    # sampling is a subset: never invents rows
    for lang, n in kept.items():
        assert n <= base[lang]
