"""Sequence packing and data-mixture sampling — the two steps between a
cleaned corpus and a training run.

Reference parity note: the reference has no training-data layer (its
pipelines stop at gold aggregates, SURVEY.md §2); these extend the
engine the same way ``ext/sampling.py`` does, and follow its
determinism contract: every decision is a pure function of the row (or
of exact integer aggregates), reproducible across runs, partitionings,
and engines.

Design for 100 TB:

- ``pack_sequences`` packs per ``source`` shard with one window cumsum —
  the shuffle is a single hash exchange on ``source`` (the same key the
  corpus is naturally partitioned by on disk), and each shard packs
  independently, which is exactly how a cluster-scale packing job is
  laid out (one packer per shard, no global coordination).
- ``mixture_weights`` aggregates token counts per source (partial+final
  agg over ~dozens of groups), then every per-source scalar is derived
  with IEEE-correctly-rounded operations only (integer sums, divides,
  ``sqrt``, ``max``) — NO order-dependent float summation and no libm
  functions with engine-dependent last-ulp behavior — so the sampling
  rates are bit-identical in any engine and the sampled corpus is
  exactly reproducible (the DuckDB oracle proves it).
- ``mixture_sample`` joins those few-dozen rates back (broadcast) and
  filters by each row's own hash bucket: one scan, one broadcast join,
  no shuffle of the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries._util import load, rnd
from .dedup import normalized_text
from .sampling import _BUCKETS, hash_bucket
from .text import token_count

SEQ_LEN = 2048


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = SEQ_LEN,
    token_counts_df: DataFrame | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk packing plan: documents are laid out
    back-to-back per ``source`` shard in ``doc_id`` order, and each
    token-range is cut into fixed ``seq_len`` sequences (documents may
    straddle a boundary — boundaries are cut by position, not by
    document).

    Returns one row per document: which sequence its first token lands
    in (``seq_id``) and at what offset — the manifest a downstream
    tokenizer-writer consumes to emit training shards without ever
    re-ordering the corpus.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    if token_counts_df is not None:
        # tokenizer-accurate packing: the plan's offsets come from the
        # supplied (doc_id, n_tokens) counter (e.g. the trained BPE)
        docs = (
            load(spark, sf_dir, "documents")
            .select("doc_id", "source")
            .join(token_counts_df, "doc_id")
            .select("doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"))
        )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    return docs.select(
        "source",
        "doc_id",
        "n_tokens",
        start,
    ).select(
        "source",
        "doc_id",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / seq_len).cast("long").alias("seq_id"),
        (F.col("start_offset") % seq_len).cast("long").alias("seq_offset"),
    )


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-2 mixture rebalancing rates per ``source``.

    The standard multilingual/multi-source rebalancing rule: sample
    source ``s`` proportionally to ``share_s^(1/T)`` instead of
    ``share_s``, i.e. keep-rate ``r_s ∝ share_s^(1/T - 1)`` normalized
    so the largest rate is 1 (the rarest source is kept whole, dominant
    sources are downsampled).

    T is fixed at 2 so the only non-rational step is ``sqrt`` — IEEE
    requires sqrt correctly rounded, so (unlike ``pow``/``ln``, which
    may differ in the last ulp between libms) every value here is
    bit-identical across engines. The normalizer is a ``max``, not a
    float sum, so no summation-order hazard either.

    Two-stage plan: partial+final integer agg over the corpus, then all
    scalar derivation happens on the ~|sources| aggregated rows (the
    empty-frame windows below run on dozens of rows, not the corpus).
    """
    per_source = (
        load(spark, sf_dir, "documents")
        .select("source", token_count(F.col("text")).alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    everything = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    w_raw = F.lit(1.0) / F.sqrt(share)  # share^(1/T - 1), T = 2
    rate = w_raw / F.max(w_raw).over(everything)
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        rnd(share, 6).alias("token_share"),
        rnd(rate, 6).alias("sample_rate"),
        # exact threshold the sampler compares hash buckets against;
        # integer, so downstream equality is trivially engine-exact
        F.floor(rate * _BUCKETS).cast("long").alias("keep_buckets"),
    )


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply :func:`mixture_weights`: keep a document iff its own hash
    bucket falls under its source's ``keep_buckets`` threshold.

    The rate table is ~|sources| rows — broadcast; the corpus is
    touched by exactly one scan + filter, and (as everywhere in
    ``ext/sampling.py``) membership is a pure function of the row, so
    an incremental batch samples identically to a full re-run.
    """
    rates = mixture_weights(spark, sf_dir).select("source", "keep_buckets")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    key = F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))
    bucket = hash_bucket(key, salt="mixture")
    return (
        docs.join(F.broadcast(rates), "source")
        .where(bucket < F.col("keep_buckets"))
        .select("doc_id", "lang", "source")
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-``k`` characteristic terms per ``source`` by TF-IDF.

    Two-level aggregation: explode tokens once, partial+final count to
    (source, term) term frequencies, then document frequency per term
    is a second agg over the ALREADY-AGGREGATED (source, term) relation
    — the corpus-sized explode is shuffled exactly once, on the
    (source, term) key. ``idf = ln((N+1)/(df+1))`` with N = number of
    sources; the score is floor-rounded to 4dp before ranking so the
    cross-engine ordering cannot hinge on a last-ulp ``ln``
    discrepancy, and ties break on the term itself.
    """
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(normalized_text(F.col("text")), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    # N (distinct sources) as a broadcast 1-row aggregate INSIDE the
    # plan — a .count() here was a separate blocking job per call just
    # to embed a literal; the double arithmetic is identical either way
    n_src = tf.agg(F.countDistinct("source").alias("n_sources"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_src))
        .withColumn(
            "tfidf",
            rnd(
                F.col("tf")
                * F.log(
                    (F.col("n_sources").cast("double") + 1.0)
                    / (F.col("df") + 1.0)
                ),
                4,
            ),
        )
    )
    rank_w = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select("source", "term", "tf", "df", "tfidf", "rank")
    )


# BM25 constants (the standard Robertson defaults)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("join", "stream", "merge")


def text_bm25(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """BM25 relevance of every document for a fixed 3-term query — the
    lexical-retrieval scorer (the ranking half of an inverted-index
    search engine; TF-IDF's ranked sibling).

    ``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with
    ``idf = ln(1 + (N−df+0.5)/(df+0.5))``, dl = document token count,
    avgdl from exact integer totals (sum/count division — no
    order-dependent float sum). The Σ over query terms is a FIXED-ORDER
    3-column add (terms pivoted to columns), so the double result is
    bit-identical cross-engine; the score is floor-rounded to 4dp
    before ranking so ordering can't hinge on a last-ulp ``ln``
    (same guard as :func:`tfidf_top_terms`).

    Scale shape: one tokenize pass computes dl (``size(split())`` — no
    explode) and per-term tf via fixed ``array_size(filter())`` columns
    — zero corpus shuffle; df and avgdl are 1-row / 3-value exact-int
    aggregates broadcast back. Top-k is a TakeOrdered. At 100 TB the
    per-term df comes from the already-built inverted index instead of
    a rescan; the scoring pass itself is embarrassingly parallel.
    """
    # the token array is referenced by four filter/size expressions
    # below; materialize it through a single-element explode so the
    # split+regexp chain runs once per row (CollapseProject would
    # otherwise inline it per reference — see dedup._with_tokens)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.array(F.split(normalized_text(F.col("text")), " "))
        ).alias("toks"),
    )
    def _count_eq(term: str) -> Column:
        # factory (not a default-arg lambda): F.filter dispatches on
        # lambda arity, so the predicate must stay 1-ary
        return F.size(F.filter("toks", lambda t: t == F.lit(term))).cast("long")

    toks = docs.select(
        "doc_id",
        F.size(F.filter("toks", lambda t: t != "")).cast("long").alias("dl"),
        *[_count_eq(q).alias(f"tf_{q}") for q in _BM25_QUERY],
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf_{q}") > 0).cast("long")).alias(f"df_{q}")
            for q in _BM25_QUERY
        ],
    )
    scored = toks.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_tokens") / F.col("n_docs")
    norm_len = F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / avgdl
    )

    def term_score(q: str) -> Column:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{q}") + 0.5) / (F.col(f"df_{q}") + 0.5)
        )
        tf = F.col(f"tf_{q}")
        return idf * tf * F.lit(_BM25_K1 + 1.0) / (tf + norm_len)

    score = term_score(_BM25_QUERY[0])
    for q in _BM25_QUERY[1:]:
        score = score + term_score(q)
    return (
        scored.select("doc_id", "dl", rnd(score, 4).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )
