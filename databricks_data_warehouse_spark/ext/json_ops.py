"""JSON extraction over ``events.props`` (the reference has no JSON
surface — SURVEY.md §2.H lists it as extension).

``get_json_object`` is a JVM-side expression — stays in codegen, no
Python boundary; at scale the extraction projects before any shuffle so
only the extracted scalar moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import cents, load, rnd


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``props.k`` as a long for every event."""
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "props")
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the extracted payload by event_type: event count, sum and
    avg of ``k`` — extraction feeding a standard hash agg."""
    return (
        events_json_extract(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("k").alias("sum_k"),
            rnd(F.sum("k") / F.count("*"), 2).alias("avg_k"),
        )
    )


def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type (batch form of
    the streaming aggregation in ``streaming/windows.py`` — identical
    semantics, F.window in both)."""
    events = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("event_count"),
            # 2-decimal values → exact integer-cents sum, order-independent
            (F.sum(cents(F.col("value"))) / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "sum_value",
        )
    )


def events_sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Batch sessionization: per-user sessions cut at ``gap_minutes`` of
    inactivity — the classic gaps-and-islands rewrite (lag → new-session
    flag → running sum = session number), the batch twin of
    ``streaming/windows.stream_session_windows``'s stateful merge.

    Session boundaries compare raw timestamps (``ts > prev + INTERVAL``)
    — no epoch truncation, so the cut is microsecond-exact and
    cross-engine identical; the window orders by (ts, event_id) so ties
    can't reorder between engines.

    Scale notes: both windows and the final agg partition on
    ``user_id`` — one shuffle key end to end, the same partitioning the
    streaming deployment uses; per-user ordering is a partition-local
    sort, never global.
    """
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # two stages (a window argument can't itself contain a window):
    # both use the same partitioning, so Catalyst plans ONE exchange +
    # one sort feeding both Window operators
    flagged = events.withColumn(
        "is_new",
        (
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                > F.lag("ts").over(w)
                + F.expr(f"INTERVAL {gap_minutes} MINUTES")
            )
        ).cast("long"),
    )
    sess = flagged.withColumn(
        "sess_no",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("event_count"),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel over the event stream: signup → view →
    click → purchase. A user "reaches" stage *k* iff their FIRST
    occurrence of stage *k*'s event is strictly later than their first
    occurrence of stage *k-1*'s (unconditional first-occurrence
    semantics — well-defined in one pass, identical in any engine).

    Two aggregations: per-user conditional-min firsts (one shuffle on
    ``user_id``, partial min map-side), then a global 4-counter sum a
    single reducer folds — the classic funnel shape that holds at any
    scale because nothing after the per-user agg is proportional to the
    event count. The 4-row output is unpivoted with ``stack``.
    """
    stages = ["signup", "view", "click", "purchase"]
    events = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    firsts = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in stages
        ]
    )
    # both-sides isNotNull guards FIRST: `false AND null` is false in
    # Spark and DuckDB alike, so the flag is never three-valued-NULL
    # (a bare `t_view > t_signup` with a NULL signup would be)
    flags = firsts.select(
        F.col("t_signup").isNotNull().cast("long").alias("r1"),
        *[
            (
                F.col(f"t_{stages[i - 1]}").isNotNull()
                & F.col(f"t_{stages[i]}").isNotNull()
                & (F.col(f"t_{stages[i]}") > F.col(f"t_{stages[i - 1]}"))
            )
            .cast("long")
            .alias(f"s{i + 1}")
            for i in range(1, 4)
        ],
    ).select(
        "r1",
        (F.col("r1") * F.col("s2")).alias("r2"),
        (F.col("r1") * F.col("s2") * F.col("s3")).alias("r3"),
        (F.col("r1") * F.col("s2") * F.col("s3") * F.col("s4")).alias("r4"),
    )
    totals = flags.agg(
        *[F.sum(f"r{i}").alias(f"u{i}") for i in range(1, 5)]
    )
    # totals is one row, so pct-of-entry is a plain column expression —
    # no window needed before the 4-row unpivot
    return totals.selectExpr(
        "stack(4, "
        "1, 'signup', u1, "
        "2, 'view', u2, "
        "3, 'click', u3, "
        "4, 'purchase', u4"
        ") AS (stage_no, stage, users)",
        "u1",
    ).select(
        F.col("stage_no").cast("long").alias("stage_no"),
        "stage",
        "users",
        rnd(F.col("users") * 100.0 / F.col("u1"), 2).alias("pct_of_entry"),
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    tracked over the following two weeks.

    ``cohort_date`` = the day of a user's first event; a user is
    "active at offset d" if they have any event on cohort_date + d.
    Output: (cohort_date, day_offset 0..13, active_users,
    retention_pct relative to the cohort's day-0 size — which is the
    cohort size itself, since every user is active on their first day).

    Scale shape: per-user first-day agg (shuffle on user_id), distinct
    (user, day) pairs (same key prefix), one join back on user_id, then
    a cohort×offset count whose cardinality is days×14 — tiny. The
    cohort-size denominator joins on cohort_date (days rows —
    broadcast). Nothing after the two user_id-keyed stages scales with
    event volume.
    """
    events = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = events.groupBy("user_id").agg(F.min("day").alias("cohort_date"))
    activity = events.distinct()
    matrix = (
        activity.join(firsts, "user_id")
        .withColumn(
            "day_offset", F.datediff("day", "cohort_date").cast("long")
        )
        .filter(F.col("day_offset") < 14)
        .groupBy("cohort_date", "day_offset")
        .agg(F.count("*").alias("active_users"))
    )
    sizes = firsts.groupBy("cohort_date").agg(F.count("*").alias("cohort_size"))
    return matrix.join(F.broadcast(sizes), "cohort_date").select(
        # date → timestamp for the driver's pandas compare (DuckDB DATE
        # arrives as datetime64; Spark DateType as python date objects —
        # same convention as agg_daily_revenue_gapfill)
        F.col("cohort_date").cast("timestamp").alias("cohort_date"),
        "day_offset",
        "active_users",
        rnd(F.col("active_users") * 100.0 / F.col("cohort_size"), 2).alias(
            "retention_pct"
        ),
    )


def events_scd2_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: treat each
    user's event_type as their "status" and emit one validity interval
    per run of consecutive equal statuses — the warehouse dimension-
    history operator (reference's MERGE layer is type 1 / overwrite;
    SURVEY.md §2 lists SCD2 as the natural extension).

    Per user, ordered by (ts, event_id) — event_id breaks timestamp
    ties so the history is deterministic: keep only CHANGE rows
    (``lag(status) is distinct from status``), then ``valid_from`` = the
    change's ts, ``valid_to`` = the next change's ts (NULL while
    current), ``version`` = change ordinal.

    Scale shape: one hash exchange on ``user_id`` feeding both window
    passes (lag and lead share the same (user_id, ts, event_id) sort —
    one Exchange, one Sort in the plan), then a filter; output is
    proportional to the number of status CHANGES, not events. This is
    exactly how a cluster-scale SCD2 build lays out: partition by the
    business key, linear scan per key.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_status", F.lag("event_type").over(w))
        .where(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("event_type"))
        )
        .drop("prev_status")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


def events_anomaly_zscore(
    spark: SparkSession,
    sf_dir: str,
    lookback: int = 100,
    min_history: int = 20,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection over the event stream: each
    event's ``value`` is scored against the mean/std of the previous
    ``lookback`` events of the same type (frame EXCLUDES the current
    row, so an outlier cannot mask itself). Events with fewer than
    ``min_history`` predecessors are skipped; a zero-variance window
    yields NULL score (no basis for a z).

    Cross-engine determinism: sums and sums-of-squares are computed on
    exact integer cents over an explicitly ordered frame
    ``(ts, event_id)`` — every engine derives bit-identical doubles
    from the same exact integers, so mean/std/z hash-match without
    rounding tricks (z is still rounded to 4dp for display).

    Scale shape: one shuffle on ``event_type`` (the window partition
    key), a bounded 100-row frame per row — no unbounded state, no
    second scan. At 100 TB the partition key would widen to
    (event_type, day) to bound partition size; the frame logic is
    unchanged.
    """
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-lookback, -1)
    )
    base = events.withColumn("c", cents(F.col("value")))
    stats = base.select(
        "event_id",
        "event_type",
        "value",
        "c",
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("ss"),
        F.count("c").over(w).alias("n"),
    ).where(F.col("n") >= min_history)
    mean = F.col("s") / F.col("n")
    std = F.sqrt(
        F.greatest(
            F.col("ss") / F.col("n") - mean * mean, F.lit(0.0)
        )
    )
    z = (F.col("c") - mean) / F.nullif(std, F.lit(0.0))
    return stats.select(
        "event_id",
        "event_type",
        "value",
        rnd(z, 4).alias("z_score"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence analysis: the first-order transition matrix
    over each user's event stream — for every ordered pair of
    consecutive events by the same user, how often ``from_type`` is
    followed by ``to_type`` and the mean gap between them. The Markov
    summary behind next-action prediction and funnel discovery
    (events_funnel checks ONE hypothesized path; this surfaces all of
    them, data-first).

    Exactness: gaps are summed as integer microseconds
    (``unix_micros``), and the mean divides exact integers in the same
    order as the oracle (sum/n, then /1e6, then 3dp floor-round) — IEEE
    doubles from identical integers.

    Scale shape: one shuffle on ``user_id`` (the LEAD window), then a
    partial+final agg on the (from, to) pair space — cardinality
    event-types², independent of row count.
    """
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lead("event_type").over(w).alias("to_type"),
        F.unix_micros(F.lead("ts").over(w)).alias("to_us"),
    ).where(F.col("to_type").isNotNull())
    n = F.count("*")
    return (
        seq.groupBy(
            F.col("event_type").alias("from_type"), F.col("to_type")
        )
        .agg(
            n.alias("n_transitions"),
            rnd(F.sum(F.col("to_us") - F.col("us")) / n / 1_000_000, 3).alias(
                "avg_gap_s"
            ),
        )
    )


def events_path_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top-k 3-event paths: the most frequent ordered triples of
    consecutive event types per user stream — second-order sequence
    mining on top of :func:`events_transition_matrix` (which is
    first-order), the path-analysis primitive behind "how do users
    actually reach purchase".

    Determinism: top-k ties break on the path string, so the emitted
    set is engine-exact. Scale shape: one shuffle on ``user_id`` for
    the two LEADs, one agg on the path space (≤ types³ keys), then
    TakeOrdered(k).
    """
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "path")
        .limit(k)
    )


def events_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4 / Delta 4 headline type): parse
    ``props`` into a VariantType column ONCE, then extract typed paths
    with ``variant_get`` — the open-schema semi-structured path that
    replaces per-path JSON string re-parsing. ``try_variant_get`` pins
    the missing-path → NULL convention, ``schema_of_variant`` the
    inferred shape. All JVM-side expressions (variant binary encoding),
    zero Python boundary; at scale the variant column parses once per
    row however many paths are extracted."""
    events = load(spark, sf_dir, "events").select("event_type", "props")
    v = events.select(
        "event_type", F.parse_json(F.col("props")).alias("pv")
    )
    return (
        v.select(
            "event_type",
            F.variant_get("pv", "$.k", "long").alias("k"),
            # missing path: NULL, never an error
            F.try_variant_get("pv", "$.absent", "long").alias("absent"),
            F.schema_of_variant(F.col("pv")).alias("shape"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("k").alias("sum_k"),
            F.count("absent").alias("n_absent"),
            F.count_distinct(F.col("shape")).alias("n_shapes"),
        )
        .orderBy("event_type")
    )


def events_variant_agg_oracle() -> str:
    # n_shapes DERIVED from the JSON itself (VERDICT r11 item "what's
    # wrong" 3) — json_structure is DuckDB's schema_of_variant twin;
    # only the distinct COUNT is compared (the shape spellings differ).
    # DuckDB splits integer shapes by SIGN (UBIGINT for non-negative,
    # BIGINT for negative) while Spark's schema_of_variant collapses
    # all JSON integers to BIGINT — normalize the '"UBIGINT"' type
    # token in object-value AND array-element positions (keys, the
    # only position followed by ':', are stashed behind a sentinel)
    # so the distinct count is structural, not sign-accidental.
    return """
        SELECT event_type,
               COUNT(*) AS event_count,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k,
               CAST(COUNT(CASE WHEN json_extract(props, '$.absent')
                                    IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_absent,
               CAST(COUNT(DISTINCT replace(replace(replace(
                        CAST(json_structure(props) AS VARCHAR),
                        '"UBIGINT":', chr(1)),
                        '"UBIGINT"', '"BIGINT"'),
                        chr(1), '"UBIGINT":')) AS BIGINT)
                   AS n_shapes
        FROM events
        GROUP BY event_type ORDER BY event_type
    """


def events_variant_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT over HETEROGENEOUS shapes (VERDICT r11 item 4): the
    corpus's ``props`` all share one shape, so a fixture is derived
    deterministically from it — four shape families keyed on
    ``event_id % 4`` (flat, +string field, +nested object, array-only)
    — and ``schema_of_variant`` must tell them apart where the answer
    is NOT a constant: per event_type the distinct-shape count is
    whatever families that type's ids actually hit, and the typed
    extractions (``$.k`` exists in three families, ``$.nested.a`` in
    one) must null out exactly where the path is absent. All JVM-side
    variant expressions; the JSON is parsed ONCE per row."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "props"
    )
    case = F.pmod(F.col("event_id"), F.lit(4))
    k = F.get_json_object("props", "$.k").cast("long")
    js = (
        F.when(case == 0, F.col("props"))
        .when(
            case == 1,
            F.format_string(
                '{"k": %d, "tag": "t%d"}',
                k, F.pmod(F.col("user_id"), F.lit(3)),
            ),
        )
        .when(
            case == 2,
            F.format_string(
                '{"k": %d, "nested": {"a": %d}}', k, F.col("user_id")
            ),
        )
        .otherwise(
            F.format_string('{"arr": [%d, %d]}', k, F.col("user_id"))
        )
    )
    v = ev.select("event_type", F.parse_json(js).alias("pv"))
    return (
        v.select(
            "event_type",
            F.try_variant_get("pv", "$.k", "long").alias("k"),
            F.try_variant_get("pv", "$.nested.a", "long").alias("na"),
            F.schema_of_variant(F.col("pv")).alias("shape"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("k").alias("sum_k"),
            F.count("na").alias("n_nested"),
            F.count_distinct(F.col("shape")).alias("n_shapes"),
        )
        .orderBy("event_type")
    )


def _shape_norm_sql(expr: str) -> str:
    """Sign-normalize DuckDB's integer shape spellings in BOTH
    object-value AND array-element positions (round-12 review 3: the
    colon-anchored replace missed ``["UBIGINT"]``, and DuckDB splits
    array shapes by sign too). Field NAMES are untouched: a key is the
    only position where the token is followed by ':', so keys are
    stashed behind a sentinel around the value replace."""
    return (
        f"replace(replace(replace(CAST(json_structure({expr}) AS VARCHAR),"
        " '\"UBIGINT\":', chr(1)),"
        " '\"UBIGINT\"', '\"BIGINT\"'),"
        " chr(1), '\"UBIGINT\":')"
    )


# Spark's format_string renders a NULL %d argument as the STRING
# 'null' (valid JSON null) — the DuckDB twin's `|| NULL ||` would
# instead collapse the whole synthesized document to SQL NULL
# (round-12 review 3). TRY_CAST mirrors get_json_object().cast('long')
# on non-integral values; the pmod spelling mirrors F.pmod on
# negatives.
_K_NULLSAFE = (
    "COALESCE(CAST(TRY_CAST(json_extract(props, '$.k') AS BIGINT)"
    " AS VARCHAR), 'null')"
)
_UID_NULLSAFE = "COALESCE(CAST(user_id AS VARCHAR), 'null')"
_UID3_NULLSAFE = (
    "COALESCE(CAST(((user_id % 3) + 3) % 3 AS VARCHAR), 'null')"
)


def events_variant_shapes_oracle() -> str:
    return f"""
        WITH src AS (
            SELECT event_type,
                   CASE event_id % 4
                       WHEN 0 THEN props
                       WHEN 1 THEN '{{"k": '
                           || {_K_NULLSAFE}
                           || ', "tag": "t' || {_UID3_NULLSAFE} || '"}}'
                       WHEN 2 THEN '{{"k": '
                           || {_K_NULLSAFE}
                           || ', "nested": {{"a": ' || {_UID_NULLSAFE} || '}}}}'
                       ELSE '{{"arr": ['
                           || {_K_NULLSAFE}
                           || ', ' || {_UID_NULLSAFE} || ']}}'
                   END AS js
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS event_count,
               CAST(SUM(TRY_CAST(json_extract(js, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k,
               CAST(COUNT(CASE WHEN json_extract(js, '$.nested.a')
                                    IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_nested,
               CAST(COUNT(DISTINCT {_shape_norm_sql('js')}) AS BIGINT)
                   AS n_shapes
        FROM src GROUP BY event_type ORDER BY event_type
    """
