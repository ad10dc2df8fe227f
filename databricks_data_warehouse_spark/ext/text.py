"""Text analysis over the ``documents`` table: tokenization, quality
scoring, language-ID heuristic, document fingerprinting.

Design for 100 TB: every operator is a pure column expression over one
scan of ``documents`` — no joins, no shuffles except the final agg a
caller might add; all built-in functions (split/transform/aggregate stay
inside codegen; no Python boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import load, rnd

# tiny deterministic marker sets for the language-ID heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_ngrams(toks: Column, k: int) -> Column:
    """Word k-grams as space-joined strings, via zip_with over k shifted
    slices of the token array.

    NOT ``transform(sequence(1, n-k+1), i -> slice(toks, i, k))``: a
    lambda that references the (expensive) ``toks`` expression re-
    evaluates it once per element — O(n·cost(toks)) per row. Here
    ``toks`` is evaluated k+1 times per row and the per-element lambdas
    touch only their two string arguments. Returns [] when size < k.
    """
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(k)]
    out = parts[-1]
    for p in reversed(parts[:-1]):
        out = F.zip_with(p, out, lambda x, acc: F.concat(x, F.lit(" "), acc))
    return out


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics per document: token count, average token length,
    type-token (distinct/total) ratio, alpha-character ratio."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # materialize the token array (single-element explode → real
    # attribute): it is referenced four times below and CollapseProject
    # would re-inline the trim+split chain per reference
    with_toks = docs.select(
        "doc_id", "text", F.explode(F.array(tokens(F.col("text")))).alias("__toks")
    )
    toks = F.col("__toks")
    n_tok = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    return with_toks.select(
        "doc_id",
        n_tok.cast("long").alias("token_count"),
        rnd(total_len / n_tok, 2).alias("avg_token_len"),
        rnd(F.size(F.array_distinct(toks)) / n_tok, 4).alias("type_token_ratio"),
        rnd(alpha_chars / F.length("text"), 4).alias("alpha_ratio"),
    )


_BPE_ISH = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish
    pre-tokenizer regex (word runs + individual punctuation marks — the
    GPT-2-style split shape). Pure JVM regexp — no Python boundary."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_ISH), 0))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: score = distinct marker hits per
    language; predict the best-scoring language ('und' when no marker
    hits). Ties break by language code order (en < es < fr < de listed
    explicitly as a deterministic priority)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # materialize the distinct-token array once — it feeds one
    # array_intersect per language and would otherwise be re-evaluated
    # per marker set
    with_toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.array(F.array_distinct(tokens(F.lower(F.col("text")))))
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    scored = with_toks.select(
        "doc_id",
        "lang",
        *[
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
                f"score_{code}"
            )
            for code, words in _LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"score_{c}") for c in _LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for code in _LANG_MARKERS:  # first language reaching the max wins
        pred = pred.when(F.col(f"score_{code}") == best, F.lit(code))
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("long").alias("marker_hits"),
    )


# PII patterns: valid in BOTH Java regex (Spark) and RE2 (DuckDB) — no
# lookaround, no backrefs. Applied in this order; counts are taken on
# the text as it stands when each pattern runs, so both engines agree
# even when patterns could overlap.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers with placeholder
    tokens and count each redaction class.

    One narrow projection — the regex chain runs inside codegen on the
    scan, no shuffle, no Python; at 100 TB this pipelines with the read.
    Output: input columns + ``clean_<text_col>`` + ``n_<class>`` counts.
    """
    cur = F.col(text_col)
    out_cols = [F.col(c) for c in df.columns]
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select(*out_cols, *counts, cur.alias(f"clean_{text_col}"))


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over ``documents``, with deterministic PII planted
    first (the synthetic corpus contains none) so the redaction paths
    are actually exercised and oracle-checked end to end."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1 or call 555-867-5309"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return pii_scrub(planted).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "clean_text"
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping token windows — the standard
    pre-training chunker (context-window packing feeds on these).

    Chunk i starts at token 1 + i·(chunk_size − overlap); the last chunk
    may be shorter. Emits (…input ids, chunk_id, chunk_start, n_tokens,
    chunk_text). Empty documents produce no chunks.

    Scale shape: tokenize once per row, explode the start offsets, slice
    from the materialized token array — all inside codegen; output rows
    ≈ total_tokens / stride, linear in corpus size, no shuffle.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    with_toks = df.select(
        *[F.col(c) for c in df.columns if c != text_col],
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    ).where(F.col("__n") > 0)
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("__n") - overlap, F.lit(1)), F.lit(stride)
    )
    chunked = with_toks.select(
        *[c for c in with_toks.columns if not c.startswith("__")],
        "__toks",
        "__n",
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    out = chunked.select(
        *[c for c in chunked.columns if not c.startswith("__")],
        F.least(
            F.lit(chunk_size), F.col("__n") - F.col("chunk_start") + 1
        ).cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("chunk_start"), chunk_size), " "
        ).alias("chunk_text"),
    )
    return out.withColumn("chunk_id", F.col("chunk_id").cast("long")).withColumn(
        "chunk_start", F.col("chunk_start").cast("long")
    )


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap over ``documents``."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_tokens(docs, chunk_size=64, overlap=16)


def doc_fingerprint(spark: SparkSession, sf_dir: str, shingle_size: int = 5) -> DataFrame:
    """Document fingerprint: the lexicographic min over MD5 hashes of
    word ``shingle_size``-shingles (a deterministic 1-perm MinHash).
    Whole-document MD5 is included for exact-dup detection.

    MD5 (not xxhash) so the DuckDB oracle computes bit-identical values.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # materialize the token array first (single-element explode): the
    # shingle expression references it ~7 times per row (size, short-doc
    # fallback, the k+1 word_ngrams slices)
    with_toks = docs.select(
        "doc_id", "text", F.explode(F.array(tokens(F.col("text")))).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    shingles = F.when(
        n < shingle_size, F.array(F.concat_ws(" ", toks))
    ).otherwise(word_ngrams(toks, shingle_size))
    # explode → min/count aggs: the shingle array is built once (the
    # per-column form re-evaluates it per output column) and the shuffle
    # carries one row per doc after map-side partial aggregation.
    return (
        with_toks.select(
            "doc_id",
            F.md5(F.col("text")).alias("exact_md5"),
            F.explode(shingles).alias("s"),
        )
        .groupBy("doc_id", "exact_md5")
        .agg(
            F.min(F.md5("s")).alias("min_shingle_md5"),
            F.count("*").alias("n_shingles"),
        )
    )


def decontaminate_splits(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Benchmark decontamination: find train-split documents sharing any
    word ``k``-gram with a test-split document — the standard pre-training
    hygiene check (eval data leaking into the training corpus).

    The split is the same deterministic hash split as
    ``sample_hash_split`` (train = bucket < 8000, test = bucket ≥ 9000),
    so the operator composes with the real split pipeline instead of
    inventing its own eval set.

    Shape: one scan → distinct k-grams exploded per doc → self-join on
    the gram restricted to train×test. The gram (a ~5-word string) is
    the shuffle key; at corpus scale this is the same inverted-index
    pattern as ``ngram_jaccard_pairs`` — never all-pairs. Hot grams
    (boilerplate) are naturally bounded by `list_distinct` per doc; a
    production run would additionally drop grams above a doc-frequency
    cap before the join (same plan, one extra groupBy).
    """
    from .dedup import _with_tokens
    from .sampling import hash_bucket

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    key = F.concat(F.lit("doc|"), F.col("doc_id").cast("string"))
    # token array materialized first — word_ngrams references it k+1
    # times per row (see dedup._with_tokens)
    grams = _with_tokens(docs, "doc_id").select(
        "doc_id",
        hash_bucket(key, salt="split").alias("bucket"),
        F.explode(F.array_distinct(word_ngrams(F.col("__toks"), k))).alias(
            "gram"
        ),
    )
    train = grams.where(F.col("bucket") < 8000).select(
        F.col("doc_id").alias("train_doc_id"), "gram"
    )
    test = grams.where(F.col("bucket") >= 9000).select(
        F.col("doc_id").alias("test_doc_id"), "gram"
    )
    return (
        train.join(test, "gram")
        .groupBy("train_doc_id", "test_doc_id")
        .agg(F.count("*").alias("shared_ngrams"))
    )


def boilerplate_ngrams(
    spark: SparkSession, sf_dir: str, k: int = 3, top: int = 25
) -> DataFrame:
    """Corpus-level heavy hitters: the ``top`` most frequent word
    ``k``-grams across the whole corpus, with document frequency — the
    detector for boilerplate (headers, footers, licence blocks,
    navigation chrome) that per-document quality scores can't see,
    feeding the stop-gram lists the dedup joins cap on
    (``dedup._MAX_GRAM_DF``).

    Shape: one corpus explode → (gram, doc_id) partial counts (map-side
    combine collapses within-doc repeats before the shuffle) → per-gram
    totals + doc frequency in a second agg over the already-aggregated
    relation → global top-k via orderBy+limit, which Spark executes as
    TakeOrdered (per-partition heaps, no single-partition window, no
    full sort). The ordering (occurrences, doc_frequency, gram) is a
    total order, so the top-k set is deterministic and cross-engine
    stable.
    """
    from .dedup import normalized_text

    # Materialize the token array through a single-element explode
    # BEFORE building k-grams: a Generate output is a real attribute,
    # so the k+1 slice references in word_ngrams read the materialized
    # array instead of re-inlining the regex+split chain per reference
    # (CollapseProject would otherwise re-evaluate it k+1 times per
    # row — measured ~30% of this operator's runtime at sf0.1).
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.array(tokens(normalized_text(F.col("text"))))).alias(
            "toks"
        ),
    )
    grams = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("toks"), k)).alias("gram")
    )
    per_doc = grams.groupBy("gram", "doc_id").agg(F.count("*").alias("n"))
    counts = per_doc.groupBy("gram").agg(
        F.sum("n").alias("occurrences"),
        F.count("*").alias("doc_frequency"),
    )
    return counts.orderBy(
        F.col("occurrences").desc(),
        F.col("doc_frequency").desc(),
        F.col("gram").asc(),
    ).limit(top)


def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_token_share``: count of the most frequent token / token
      count (high → degenerate repetition);
    - ``dup_trigram_frac``: 1 − distinct-trigrams / total-trigrams
      (high → copy-pasted or templated text). Docs with <3 tokens have
      no trigrams → 0.0.

    Shape: explode → two-level hash agg (partial map-side combine), one
    shuffle keyed by (doc_id, token) then (doc_id) — no windows, no
    driver collection. Ratios are exact-integer divisions floor-rounded
    to 4 dp (cross-engine deterministic).
    """
    from .dedup import _with_tokens, normalized_text

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(normalized_text(F.col("text")))

    tok_stats = (
        docs.select("doc_id", F.explode(toks).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("n_toks"),
        )
    )
    # trigram side: materialize the token array first — word_ngrams
    # references it k+1 times per row (see dedup._with_tokens); the
    # token side above evaluates it once already (plain explode)
    tri_stats = (
        _with_tokens(docs, "doc_id")
        .select("doc_id", F.explode(word_ngrams(F.col("__toks"), 3)).alias("g"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tri"),
            F.count_distinct("g").alias("n_tri_distinct"),
        )
    )
    return (
        tok_stats.join(tri_stats, "doc_id", "left")
        .select(
            "doc_id",
            rnd(F.col("top_cnt") / F.col("n_toks"), 4).alias("top_token_share"),
            F.coalesce(
                rnd(1 - F.col("n_tri_distinct") / F.col("n_tri"), 4), F.lit(0.0)
            ).alias("dup_trigram_frac"),
        )
    )


def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training corpus gate: every document gets a
    keep/drop decision with the FIRST failing rule as the reject reason
    (rule order is the filter's spec, applied identically in any
    engine):

    1. ``too_short``        — fewer than 20 whitespace tokens;
    2. ``low_alpha``        — alphabetic-character ratio < 0.6;
    3. ``repetitive_token`` — top token > 20% of all tokens;
    4. ``repetitive_trigram`` — >10% duplicate trigrams;
    5. ``unknown_lang``     — the language-ID heuristic found no marker.

    Rule values are computed exactly as the already-oracle-checked
    operators compute them (text_quality's token_count/alpha_ratio,
    lang_id's predicted_lang, repetition_scores verbatim) — but the two
    PER-ROW sides (quality, lang) are evaluated in ONE projection over
    one scan instead of two scans joined back on doc_id: only the
    repetition signals need aggregation, so the filter is one scan +
    repetition's aggs + a single doc_id join (was 4 scans / 3 joins).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # both token arrays materialized once through a single-element
    # explode (see dedup._with_tokens): the whitespace tokens feed
    # token_count, the lowercased distinct tokens feed the marker
    # intersections
    with_toks = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.array(
                F.struct(
                    tokens(F.col("text")).alias("t"),
                    F.array_distinct(tokens(F.lower(F.col("text")))).alias(
                        "lt"
                    ),
                )
            )
        ).alias("__tk"),
    )
    token_count = F.size(F.col("__tk.t")).cast("long")
    alpha_ratio = rnd(
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
        / F.length("text"),
        4,
    )
    scores = {
        code: F.size(
            F.array_intersect(
                F.col("__tk.lt"), F.array(*[F.lit(w) for w in words])
            )
        )
        for code, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for code in _LANG_MARKERS:  # first language reaching the max wins
        pred = pred.when(scores[code] == best, F.lit(code))
    base = with_toks.select(
        "doc_id",
        token_count.alias("token_count"),
        alpha_ratio.alias("alpha_ratio"),
        pred.alias("predicted_lang"),
    )
    repetition = repetition_scores(spark, sf_dir)
    reason = (
        F.when(F.col("token_count") < 20, F.lit("too_short"))
        .when(F.col("alpha_ratio") < 0.6, F.lit("low_alpha"))
        .when(F.col("top_token_share") > 0.2, F.lit("repetitive_token"))
        .when(F.col("dup_trigram_frac") > 0.1, F.lit("repetitive_trigram"))
        .when(F.col("predicted_lang") == "und", F.lit("unknown_lang"))
    )
    return base.join(repetition, "doc_id").select(
        "doc_id",
        reason.isNull().alias("keep"),
        F.coalesce(reason, F.lit("ok")).alias("reject_reason"),
    )


def quality_percentile_filter(
    spark: SparkSession, sf_dir: str, drop_below: float = 0.1
) -> DataFrame:
    """Per-language quality floor: drop the bottom ``drop_below``
    percent-rank of documents by alpha-character ratio WITHIN each
    language — the relative-threshold cousin of the absolute-rule
    :func:`corpus_filter` (absolute cutoffs misfire when quality
    distributions differ by language; a per-partition percentile
    adapts automatically).

    Determinism: percent_rank is computed over the ROUNDED (4dp) ratio
    with doc_id as tiebreak, so the sort keys — and therefore the rank
    ties — are bit-identical across engines.

    Scale shape: one shuffle on ``lang`` (bounded partitions: languages
    × docs/language), one window pass, then a filter — no second scan.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    alpha = rnd(
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
        / F.length("text"),
        4,
    )
    w = Window.partitionBy("lang").orderBy("alpha_ratio", "doc_id")
    scored = docs.select("doc_id", "lang", alpha.alias("alpha_ratio"))
    return (
        scored.withColumn("pct_rank", rnd(F.percent_rank().over(w), 6))
        .where(F.col("pct_rank") >= drop_below)
        .select("doc_id", "lang", "alpha_ratio", "pct_rank")
    )


def sample_token_budget(
    spark: SparkSession,
    sf_dir: str,
    budget_per_source: int = 800,
    token_counts_df: DataFrame | None = None,
) -> DataFrame:
    """Token-budget subsampling: per ``source``, admit documents in
    deterministic hash order until the source's cumulative whitespace
    token count reaches ``budget_per_source`` — how a mixture recipe's
    per-source token quota is actually materialized (doc-count quotas
    over-weight short docs; token quotas are what the training run
    consumes).

    Hash order (md5 of doc_id) is a uniform, seed-free shuffle of each
    source, so the admitted subset is an unbiased sample and identical
    in any engine. The cumulative sum is exact BIGINT over a total
    order (md5 collisions broken by doc_id), so admission is
    deterministic at every scale.

    Scale shape: one shuffle on ``source``, one running-sum window
    pass; no collect, no second scan. At 100 TB the window partitions
    are per-source — if one source dwarfs memory, pre-aggregate per
    (source, hash-prefix) and admit prefix blocks first.

    ``token_counts_df`` swaps the counter: a (doc_id, n_tokens) frame —
    e.g. :func:`..bpe.bpe_token_counts` — makes the admitted budget
    tokenizer-accurate instead of whitespace-approximate.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    h = F.md5(F.col("doc_id").cast("string"))
    if token_counts_df is not None:
        base = docs.join(token_counts_df, "doc_id").select(
            "doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"),
            h.alias("h"),
        )
    else:
        base = docs.select(
            "doc_id", "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
            h.alias("h"),
        )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= budget_per_source)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


def lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality filter (Wenzek et al. 2020,
    arXiv:1911.00359 filters Common Crawl by KenLM perplexity) in
    EXACT cross-engine arithmetic: a corpus bigram LM where each
    bigram's "familiarity" is ``floor(log2(corpus_count))`` — computed
    INTEGRALLY (bit_length - 1, no floating point) on both engines;
    the float spelling ``floor(log2(cnt))`` is NOT universally exact
    (double log2 of counts just below a power of two rounds up at
    large magnitudes, e.g. 2^60-1), so the oracle uses
    ``length(bin(cnt)) - 1`` — instead of a float log-probability
    whose last-ulp differences would break bit-exact comparison. Per document: bigram count and
    summed familiarity; low familiarity-per-bigram = rare word
    sequences = the noise/garble end of the corpus, exactly the tail a
    perplexity filter drops. Single-word documents have no bigrams and
    no row.

    Scale shape: one vocabulary-sized count aggregation, one join
    keyed on bigram (AQE broadcasts when the vocabulary is small), one
    per-document aggregation — all map-side-combinable; no floats
    anywhere until a consumer divides familiarity/n_bigrams."""
    from .udf_ext import word_bigrams_builtin

    bi = word_bigrams_builtin(spark, sf_dir).select("doc_id", "bigram")
    counts = bi.groupBy("bigram").agg(F.count("*").alias("cnt"))
    # floor(log2(n)) for a positive integer = bit_length - 1, computed
    # exactly via base-2 string conversion (no floating point at all)
    fam = (
        F.length(F.conv(F.col("cnt").cast("string"), 10, 2)) - 1
    ).cast("long")
    return (
        bi.join(counts, "bigram")
        .select("doc_id", fam.alias("f"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("f").alias("familiarity"),
        )
        .orderBy("doc_id")
    )
