"""Deterministic sampling & dataset splitting for training-data pipelines.

A 100 TB corpus cannot be split with ``df.randomSplit`` (seed-dependent
on partitioning, not reproducible across re-reads or engines) or sampled
with ``df.sample`` (ditto). Every operator here derives its decision
from an MD5 of a stable business key, so:

- the split is a pure function of the row — stable across runs, across
  repartitioning, across engines (the DuckDB oracle computes the exact
  same buckets), and across incremental loads (a new batch lands in the
  same split distribution without reshuffling old rows);
- no shuffle is needed at all: assignment is a narrow projection, so at
  cluster scale it pipelines with the scan (and a writer can
  ``partitionBy("split")`` to materialize the three datasets in one
  pass).

Reference parity note: the reference has no sampling layer (its
pipelines are exhaustive ETL, SURVEY.md §2); these are the standard
extensions a training-data pipeline needs on top.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import load

_BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = _BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets): first 32 bits of
    MD5(salt|key) mod buckets. MD5 (not xxhash64/crc32) so any engine —
    and the DuckDB oracle — reproduces the assignment bit-for-bit."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def hash_bucket_sql(key_expr: str, buckets: int = _BUCKETS, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket` — keep both in sync."""
    return (
        f"(('0x' || substr(md5('{salt}' || {key_expr}), 1, 8))::BIGINT"
        f" % {buckets})"
    )


def split_column(
    key: Column, weights: Mapping[str, float], salt: str = "split"
) -> Column:
    """Label each row with a split name by carving [0, 10000) into
    weight-proportional ranges (insertion order of ``weights``)."""
    bucket = hash_bucket(key, _BUCKETS, salt)
    names = list(weights)
    edges, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name]
        edges.append(int(round(acc * _BUCKETS)))
    expr = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(bucket < edge, F.lit(name)).otherwise(expr)
    return expr


def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split of ``documents`` keyed on doc_id.

    Narrow projection — no shuffle; a new document batch is assigned
    identically whether processed with the corpus or alone.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    key = F.concat(F.lit("doc|"), F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id",
        hash_bucket(key, salt="split").alias("bucket"),
        split_column(key, {"train": 0.8, "val": 0.1, "test": 0.1}).alias("split"),
    )


# per-language keep fractions for the stratified sample: downsample the
# dominant language hard, keep the tail intact (the standard rebalancing
# move for a multilingual training mix)
STRATA_FRACTIONS: dict[str, float] = {"en": 0.25, "es": 0.5, "fr": 0.75}
DEFAULT_FRACTION = 1.0


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of ``documents``: keep a
    per-``lang`` fraction of rows, decided by the row's own hash bucket
    (no count pass, no shuffle — one scan, one filter, reproducible).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    key = F.concat(F.lit("strat|"), F.col("doc_id").cast("string"))
    bucket = hash_bucket(key, salt="stratified")
    frac = F.lit(DEFAULT_FRACTION)
    for lang, f in STRATA_FRACTIONS.items():
        frac = F.when(F.col("lang") == lang, F.lit(f)).otherwise(frac)
    return docs.where(bucket < frac * _BUCKETS).select("doc_id", "lang")
