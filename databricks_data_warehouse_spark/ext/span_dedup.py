"""Span-level exact substring deduplication — the ExactSubstr side of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022, arXiv:2107.06499): find maximal token spans that occur more than
once ANYWHERE in the corpus and account for their removal, per
document. Document-level dedup (:mod:`.dedup`) misses exactly these —
long boilerplate passages embedded in otherwise-unique documents.

Spark-first shape (the paper uses a suffix array, a sequential
single-machine structure; the distributed equivalent is k-gram
fingerprinting, the same reduction the paper's own Section 4.1 uses as
its match seed):

1. every document's token k-grams with their positions — one
   ``posexplode`` over a JVM-side ``transform``/``slice`` build (no
   Python in the hot path);
2. grams occurring >= 2 times corpus-wide (a map-side-combinable
   count keyed on the gram — the vocabulary-bounded inverted-index
   shuffle :func:`.text.decontaminate_splits` also uses);
3. per document, duplicated gram occurrences merged into MAXIMAL
   spans (two occurrences merge when they overlap or touch:
   ``start <= prev_max_end + 1``) — the classic gaps-and-islands
   window, partitioned by document;
4. per-document accounting: duplicated-token mass and surviving
   fraction, the quantity a training-data pipeline thresholds on.

At 100 TB: the only corpus-wide shuffle is the gram count (combiner
collapses repeats before the exchange), the span merge never leaves a
document's partition, and the gram STRING would be replaced by a
128-bit hash (collision-tolerant marking) — kept as the string here so
the DuckDB oracle is byte-exact. A k-gram seed of k=8 marks any
duplicated passage of >= 8 tokens, the paper's 50-token threshold
scaled to this corpus's ~60-token documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries._util import load
from .text import tokens

K = 8  # minimum duplicated-span length (tokens)


def _dup_occurrences(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, p, e): start/end token positions (0-based, inclusive)
    of every k-gram occurrence whose gram repeats corpus-wide."""
    # materialize the token array through a single-element explode: a
    # plain Project would be collapsed and the n >= k filter pushed
    # below it re-evaluates the trim+split chain (tokenize ran twice
    # per row); a Generate output is a real attribute (see
    # dedup._with_tokens)
    toks = docs.select(
        "doc_id", F.explode(F.array(tokens(F.col("text")))).alias("toks")
    ).withColumn("n", F.size("toks"))
    grams = (
        toks.where(F.col("n") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - k),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("toks"), i + 1, k)
                    ),
                )
            ).alias("p", "gram"),
        )
    )
    repeated = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("gram")
    )
    return grams.join(repeated, "gram", "left_semi").select(
        "doc_id", "p", (F.col("p") + k - 1).alias("e")
    )


def dup_spans(spark: SparkSession, sf_dir: str, k: int = K) -> DataFrame:
    """Maximal duplicated spans per document:
    ``(doc_id, span_start, span_end, span_tokens)``, positions 0-based
    inclusive, ordered by (doc_id, span_start)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return dup_spans_df(docs, k)


def dup_spans_df(docs: DataFrame, k: int = K) -> DataFrame:
    """:func:`dup_spans` over any ``(doc_id, text)`` frame."""
    occ = _dup_occurrences(docs, k)
    w = Window.partitionBy("doc_id").orderBy("p")
    prev_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = occ.withColumn(
        "new_island",
        F.when(
            prev_e.isNull() | (F.col("p") > prev_e + 1), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
            (F.max("e") - F.min("p") + 1).cast("long").alias("span_tokens"),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens")
        .orderBy("doc_id", "span_start")
    )


def dedup_substrings(
    spark: SparkSession, sf_dir: str, k: int = K
) -> DataFrame:
    """Per-document removal accounting for exact-substring dedup:
    ``(doc_id, n_tokens, dup_tokens, n_spans, kept_tokens)`` — the
    relation a pipeline filters/trims on (Lee et al. drop the
    duplicated spans; ``kept_tokens`` is the post-surgery length).
    Every document has a row (0 spans for clean ones)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    spans = dup_spans(spark, sf_dir, k)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").alias("dup_tokens"),
        F.count("*").alias("n_spans"),
    )
    base = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            (
                F.col("n_tokens")
                - F.coalesce("dup_tokens", F.lit(0))
            ).cast("long").alias("kept_tokens"),
        )
        .orderBy("doc_id")
    )
