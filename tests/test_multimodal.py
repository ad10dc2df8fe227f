"""Multimodal plumbing: binary payloads survive the Arrow boundary, the
mapInPandas operators keep their declared schemas, and frame sampling
fans out one row per frame."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from databricks_data_warehouse_spark.ext.multimodal import (
    decode_featurize,
    frame_sample,
)


def _media(spark, n=50):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "UTF-8").alias("payload"),
        F.lit("image/png").alias("media_type"),
    )


def test_decode_featurize_schema_and_determinism(spark):
    out = decode_featurize(_media(spark))
    assert out.schema["features"].dataType == ArrayType(FloatType())
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 50
    # deterministic fake: feature i = ((n_bytes*(i+1)) % 256) / 255
    r9 = rows[9]  # payload "payload-9" -> 9 bytes
    assert r9.n_bytes == 9
    assert abs(r9.features[0] - 9 / 255) < 1e-6
    assert abs(r9.features[7] - (9 * 8 % 256) / 255) < 1e-6
    assert abs(r9.feature_mean - sum(r9.features) / 8) < 1e-6


def test_decode_featurize_handles_multiple_arrow_batches(spark):
    # force tiny Arrow batches so the UDF iterates >1 pdf per partition
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = decode_featurize(_media(spark, n=100).coalesce(1))
        assert out.count() == 100
        assert out.select("doc_id").distinct().count() == 100
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_frame_sample_fans_out(spark):
    out = frame_sample(_media(spark, n=10), n_frames=4)
    assert out.count() == 40
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)
    one = {r.frame_idx: r for r in out.filter(F.col("doc_id") == 3).collect()}
    # strided offsets over a 9-byte payload: 0, 2, 4, 6
    assert [one[i].byte_offset for i in range(4)] == [0, 2, 4, 6]
    # distinct slices -> distinct checksums
    assert len({one[i].frame_checksum for i in range(4)}) == 4
