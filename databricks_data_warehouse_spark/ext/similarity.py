"""Similarity search over the ``embeddings`` table (array<float>).

- ``ann_cosine_topk``: brute-force cosine top-k against one query vector.
  The dot product is a single ``F.zip_with`` + ``F.aggregate`` fold —
  element order is fixed, so the double sum is bit-identical to the
  DuckDB oracle's sequential list_sum.
- ``ann_lsh_topk``: the scale path — sign-LSH bucketing (hyperplanes
  derived deterministically from MD5 bits of the dimension index), so
  only same/neighbor-bucket vectors are scored. At 100 TB the bucket id
  becomes the shuffle/partition key and each query probes a handful of
  buckets instead of the full corpus.
- ``pairwise_topk_per_label``: blocked all-pairs within a label — the
  embedding-cosine near-dup operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import load


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + left-fold — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_cosine_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against the embedding of ``query_vec_id``.

    One scan, one broadcast of the single query row, no shuffle until the
    final TakeOrdered(k). Ties break on vec_id for determinism.
    """
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    query = emb.filter(F.col("vec_id") == query_vec_id).select(
        _as_double(F.col("embedding")).alias("q")
    )
    scored = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            F.round(cosine(_as_double(F.col("embedding")), F.col("q")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("vec_id")).limit(k)


def _bucket_id(vec: Column, n_planes: int = 4) -> Column:
    """Sign-LSH bucket: bit j = sign of a pseudo-random ±1 projection.
    Plane weights are ±1 derived from md5(j|i) parity — deterministic,
    seed-free, and reproducible in any engine with md5."""
    def _plane_weights(plane: int) -> Column:
        # 1-arity lambda closing over the plane id (PySpark dispatches on
        # lambda arity; extra params would receive the element index)
        prefix = f"{plane}|"
        return F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda i: F.when(
                F.conv(F.substring(F.md5(F.concat(F.lit(prefix), i.cast("string"))), 1, 1), 16, 10)
                .cast("int") % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )

    parts = []
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, _plane_weights(j), lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        parts.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("int")


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket assignment for every vector (the IVF/LSH index build)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.select("vec_id", _bucket_id(F.col("embedding")).alias("bucket_id"))


def ann_lsh_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """LSH-pruned cosine top-k: only vectors in the query's bucket are
    scored (single-probe). Approximate by construction — recall depends
    on plane count; the brute-force operator is the ground truth."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucketed = emb.withColumn("bucket_id", _bucket_id(F.col("embedding")))
    query = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        _as_double(F.col("embedding")).alias("q"), F.col("bucket_id").alias("q_bucket")
    )
    return (
        bucketed.crossJoin(F.broadcast(query))
        .where((F.col("bucket_id") == F.col("q_bucket")) & (F.col("vec_id") != query_vec_id))
        .select(
            "vec_id",
            F.round(cosine(_as_double(F.col("embedding")), F.col("q")), 6).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def pairwise_topk_per_label(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs within a label block scoring
    ≥ threshold. Blocking bounds the quadratic term to the label group."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    a = emb.select(
        "label", F.col("vec_id").alias("vec_a"), _as_double(F.col("embedding")).alias("e_a")
    )
    b = emb.select(
        "label", F.col("vec_id").alias("vec_b"), _as_double(F.col("embedding")).alias("e_b")
    )
    return (
        a.join(b, on="label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "label",
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("e_a"), F.col("e_b")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
