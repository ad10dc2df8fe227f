"""Deduplication operators over ``documents``: exact (hash-groupBy),
MinHash signatures + LSH band-bucket candidate pairs, n-gram Jaccard
verification, and SimHash.

Design for 100 TB:
- exact dedup shuffles by a 128-bit content hash — never by raw text —
  so shuffle rows are tiny and skew tracks true duplicate mass;
- near-dup never compares all pairs: LSH banding turns the O(n²)
  problem into a groupBy on band keys plus a join restricted to
  bucket-colliding candidates (the standard shingle→minhash→band→
  bucket-join pipeline);
- all hashing is MD5 over explicit strings → bit-identical in the
  DuckDB oracle (xxhash64 would be Spark-private).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import load, rnd
from .text import tokens

# deterministic "permutations": salt the shingle hash with a fixed seed id
_N_MINHASH = 8
_BAND_SIZE = 2  # 4 bands × 2 rows → catches jaccard ≳ 0.5 reliably


def normalized_text(col: Column) -> Column:
    """Normalization for content identity: lowercase, collapse whitespace,
    trim — typographic noise should not defeat exact dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: group by MD5 of normalized text; keep the
    smallest doc_id as canonical. Output one row per distinct content."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select("doc_id", F.md5(normalized_text(F.col("text"))).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("copies"))
    )


def _shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of the normalized text (set semantics, as
    Jaccard requires). Short docs fall back to a single whole-doc shingle."""
    toks = tokens(normalized_text(col))
    n = F.size(toks)
    return F.array_distinct(
        F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        )
    )


def _seeded_min_md5(shingles: Column, seed: int) -> Column:
    # NB: the transform lambda must take exactly ONE parameter — PySpark
    # dispatches on lambda arity, and a second (even defaulted) parameter
    # would receive the element index instead of the closure value.
    prefix = f"{seed}|"
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(prefix), s)))
    )


def _minhash_sig(shingles: Column, n_hashes: int = _N_MINHASH) -> list[Column]:
    """MinHash signature: for seed j, min over shingles of md5(j||shingle).
    MD5-based so the oracle reproduces it; seeds are literal ints."""
    return [
        _seeded_min_md5(shingles, j).alias(f"mh_{j}") for j in range(n_hashes)
    ]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (8 hashes over 3-word shingles)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh = _shingles(F.col("text"))
    return docs.select("doc_id", *_minhash_sig(sh), F.size(sh).alias("n_shingles"))


def minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing any band (concatenated minhash slice)
    become a candidate pair; pairs are then verified with exact shingle
    Jaccard. Only bucket-colliding pairs are ever joined — no O(n²).

    Output: (doc_a, doc_b, jaccard) for verified pairs ≥ 0.5.
    """
    sigs = minhash_signatures(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[F.col(f"mh_{b * _BAND_SIZE + r}") for r in range(_BAND_SIZE)],
                    )
                    for b in range(_N_MINHASH // _BAND_SIZE)
                ]
            )
        ).alias("band_key"),
    )
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), on="band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    verified = (
        pairs.join(docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn(
            "jaccard",
            rnd(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .where(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.3) -> DataFrame:
    """Character-trigram Jaccard near-dup within same-(lang, source)
    blocks — a blocked (not all-pairs) exact similarity join; the blocking
    key stands in for any cheap partition-friendly prefilter at scale."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    norm = normalized_text(F.col("text"))
    grams = docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(norm) - 2, F.lit(1))),
                lambda i: norm.substr(i, F.lit(3)),
            )
        ).alias("grams"),
    )
    a = grams.select(
        F.col("lang"), F.col("source"), F.col("doc_id").alias("doc_a"), F.col("grams").alias("g_a")
    )
    b = grams.select(
        F.col("lang"), F.col("source"), F.col("doc_id").alias("doc_b"), F.col("grams").alias("g_b")
    )
    return (
        a.join(b, on=["lang", "source"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "jaccard",
            rnd(
                F.size(F.array_intersect("g_a", "g_b")) / F.size(F.array_union("g_a", "g_b")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("lang", "source", "doc_a", "doc_b", "jaccard")
    )


def simhash(spark: SparkSession, sf_dir: str, bits: int = 16) -> DataFrame:
    """SimHash over word tokens: bit i of the fingerprint is the majority
    vote of hash-bit i across tokens. 16 bits derived from the first 4 hex
    chars of each token's MD5 — oracle-reproducible.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.array_distinct(tokens(normalized_text(F.col("text"))))
    # per-token 16-bit value from md5 hex prefix
    tok_hashes = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"))

    def _vote(mask: int) -> Column:
        # single-closure helper: aggregate's merge lambda must be 2-arity
        return F.aggregate(
            tok_hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) > 0, F.lit(1)).otherwise(F.lit(-1)),
        )

    bit_cols = []
    for i in range(bits):
        votes = _vote(1 << i)
        bit_cols.append(F.when(votes > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    fingerprint = bit_cols[0]
    for c in bit_cols[1:]:
        fingerprint = fingerprint + c
    return docs.select("doc_id", fingerprint.cast("long").alias("simhash16"))
