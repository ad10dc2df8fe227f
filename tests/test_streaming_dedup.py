"""Online SimHash dedup stream: fingerprint parity with the batch
operator and the strictly-earlier flagging semantics."""

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext import dedup
from databricks_data_warehouse_spark.streaming.dedup_stream import (
    _simhash16_py,
    stream_dedup_simhash,
)

SF = "/root/testdata/sf0.001"


def test_python_fingerprint_matches_batch_operator(spark):
    """The in-stream Python fingerprint must be bit-for-bit the batch
    ext/dedup.simhash fingerprint (which is itself oracle-pinned)."""
    batch = {r.doc_id: r.simhash16 for r in dedup.simhash(spark, SF).collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert set(batch) == set(docs)
    for doc_id, text in docs.items():
        assert _simhash16_py(text) == batch[doc_id], doc_id


def test_stream_flags_match_strictly_earlier_join(spark):
    out = stream_dedup_simhash(spark, SF)
    rows = {r.doc_id: r for r in out.collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.count()
    # recompute the predecessor join in batch Spark and compare flags
    sim = dedup.simhash(spark, SF)
    simd = sim.join(docs.select("doc_id", "lang"), "doc_id")
    a = simd.select(
        F.col("doc_id").alias("ida"), F.col("lang"), F.col("simhash16").alias("fa")
    )
    b = simd.select(
        F.col("doc_id").alias("idb"), F.col("lang"), F.col("simhash16").alias("fb")
    )
    pred = (
        a.join(b, on="lang")
        .where(F.col("idb") < F.col("ida"))
        .where(F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))) <= 1)
        .select("ida").distinct()
    )
    dup_ids = {r.ida for r in pred.collect()}
    for doc_id, r in rows.items():
        assert r.is_dup == (doc_id in dup_ids), doc_id
    # per-lang first arrival can never be a dup
    firsts = {
        r.doc_id
        for r in docs.groupBy("lang").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert all(not rows[i].is_dup for i in firsts)
