"""Key-salting for skewed joins — the manual fallback when AQE's
skew-join splitting can't help (e.g. a broadcast is impossible and one
key holds a double-digit percentage of the fact side).

The session enables ``spark.sql.adaptive.skewJoin`` (session.py:37),
which splits oversized SHUFFLE partitions at runtime — that covers most
skew. What it cannot fix is a single join KEY too hot for one task when
the build side must also shuffle: every row of that key still hashes to
one reducer. Salting is the textbook answer and belongs in the engine
as a first-class, correctness-pinned operator rather than ad-hoc query
surgery:

- fact side: ``__salt = pmod(xxhash64(<row-unique expr>), S)`` —
  deterministic (no ``rand()``: re-computations of the same row under
  task retries MUST salt identically, or a retried stage can lose/dup
  rows; this is the classic nondeterministic-salt bug),
- dim side: exploded ×S (each dim row replicated once per salt value),
- join on ``(key, __salt)``: the hot key now spreads over S reducers.

The result is PROVABLY the plain join — salting only changes row
placement — which `join_skew_salted`'s DuckDB oracle (an unsalted SQL
join) pins cross-engine. Cost model at 100 TB: dim side grows ×S (only
acceptable when dim ≪ fact — here 5 rows ×16), fact side is one
shuffle either way; pick S ≈ a few × the reducer count a hot key
should occupy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import load

_SALTS = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_expr: Column,
    salts: int = _SALTS,
    how: str = "inner",
) -> DataFrame:
    """``fact.join(dim, on, how)`` with the hot keys spread over
    ``salts`` reducers. ``salt_expr`` must be deterministic per fact
    row (any row-unique column works); the join keys ``on`` must cover
    dim's uniqueness the same as the plain join would."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_expr), F.lit(salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salts)])),
    )
    return salted_fact.join(
        salted_dim, [*on, "__salt"], how
    ).drop("__salt")


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events (5 event types → maximal key skew: an unsalted shuffle
    join occupies 5 reducers whatever the cluster size) joined to a
    per-type stats dim through :func:`salted_join`, then re-aggregated:
    how many events sit below their type's mid-range value. Every
    number is exact cross-engine (counts, and a single IEEE add+divide
    of exact min/max doubles) — the oracle runs the UNSALTED join and
    must hash-match, proving salting is placement-only."""
    events = load(spark, sf_dir, "events")
    dim = events.groupBy("event_type").agg(
        F.count("*").alias("total"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    joined = salted_join(
        events.select("event_id", "event_type", "value"),
        dim,
        on=["event_type"],
        salt_expr=F.col("event_id"),
    )
    return (
        joined.groupBy("event_type", "total")
        .agg(
            F.sum(
                F.when(
                    F.col("value") < (F.col("lo") + F.col("hi")) / F.lit(2.0),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_below")
        )
        .orderBy("event_type")
    )


def join_skew_salted_oracle() -> str:
    return """
        WITH dim AS (
            SELECT event_type,
                   COUNT(*) AS total,
                   MIN(value) AS lo,
                   MAX(value) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, d.total,
               SUM(CASE WHEN e.value < (d.lo + d.hi) / 2.0
                        THEN 1 ELSE 0 END) AS n_below
        FROM events e JOIN dim d USING (event_type)
        GROUP BY e.event_type, d.total
        ORDER BY e.event_type
    """
