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


def sample_quality_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-temperature corpus sampling (round 12): include each
    document with probability quality^(1/T) — the standard mixing
    move that up-weights clean text without discarding the tail.
    Two temperatures side by side: T = 0.5 SHARPENS (prob = q², skews
    hard toward high quality) and T = 2 FLATTENS (prob = √q, keeps
    more of the tail). The quality signal is the alpha-character
    ratio (the text_quality metric).

    Determinism discipline: the per-doc uniform is the first 32 md5
    bits of a salted key reduced mod 10⁶ (the corpus-wide splitter
    idiom — any engine reproduces it bit-for-bit), and the two
    acceptance thresholds use ONLY exactly-rounded IEEE ops
    (division, multiplication, sqrt — never libm pow, whose last ulp
    differs across engines), floor-scaled to the same 10⁶ grid.
    Assignment is per-row and embarrassingly parallel: a new batch
    samples identically whether processed with the corpus or alone —
    no shuffle until the per-source report."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    # the module's one cross-engine uniform (keep hash_bucket /
    # hash_bucket_sql in sync, not a third inline copy of the idiom)
    u = hash_bucket(
        F.col("doc_id").cast("string"), 1_000_000, salt="qt|"
    )
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    # NULLIF guards the zero-length divisor on BOTH sides: Spark's
    # Divide yields NULL for /0 (or raises under ANSI) while DuckDB's
    # IEEE float division yields NaN — which COALESCE does NOT catch
    # and which sorts ABOVE every threshold under NaN-is-greatest,
    # silently keeping empty documents in the DuckDB twin only.
    q = F.coalesce(
        alpha / F.nullif(F.length(F.col("text")), F.lit(0)), F.lit(0.0)
    )
    w_sharp = F.floor(q * q * 1_000_000 + F.lit(0.5))   # T = 0.5
    w_flat = F.floor(F.sqrt(q) * 1_000_000 + F.lit(0.5))  # T = 2
    tagged = docs.select(
        "source",
        "n_chars",
        (u < w_sharp).cast("long").alias("keep_sharp"),
        (u < w_flat).cast("long").alias("keep_flat"),
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep_sharp").alias("kept_sharp"),
            F.sum("keep_flat").alias("kept_flat"),
            F.sum(
                F.when(F.col("keep_sharp") == 1, F.col("n_chars"))
            ).alias("chars_sharp"),
        )
        .orderBy("source")
    )


def sample_quality_temperature_oracle() -> str:
    """DuckDB twin — same md5 uniform (the module's hash_bucket_sql,
    composed not copied), same exactly-rounded threshold arithmetic,
    same 10⁶ grid."""
    return f"""
        WITH tagged AS (
            SELECT source, n_chars,
                   {hash_bucket_sql('doc_id', 1_000_000, salt='qt|')} AS u,
                   COALESCE(
                       length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                           / CAST(NULLIF(length(text), 0) AS DOUBLE),
                       0.0
                   ) AS q
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN u < floor(q * q * 1000000 + 0.5)
                             THEN 1 ELSE 0 END) AS BIGINT) AS kept_sharp,
               CAST(SUM(CASE WHEN u < floor(sqrt(q) * 1000000 + 0.5)
                             THEN 1 ELSE 0 END) AS BIGINT) AS kept_flat,
               CAST(SUM(CASE WHEN u < floor(q * q * 1000000 + 0.5)
                             THEN n_chars END) AS BIGINT) AS chars_sharp
        FROM tagged GROUP BY source ORDER BY source
    """
