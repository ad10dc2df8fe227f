"""Oracle-pinned exercise of ``functions/skew.py:salted_join`` — the
explicit skew rescue whose TIMING is measured in SCALE.md (Round 5:
3.6× on a 90%-one-key join with AQE disabled); this entry pins the
other half of the contract cross-engine: salting is placement-only,
the result is EXACTLY the plain join's.

The fact side is ``events`` (5 event types — maximal key skew: an
unsalted shuffle join occupies 5 reducers whatever the cluster size);
the dim side is a per-type stats rollup. Every output number is exact
in any engine: counts, and one IEEE add+divide of exact min/max
doubles — no order-dependent float summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.skew import salted_join
from ..queries._util import load

__all__ = ["salted_join", "join_skew_salted", "join_skew_salted_oracle"]


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events ⋈ per-type stats via the salted join, re-aggregated to
    how many events sit below their type's mid-range value; the oracle
    runs the UNSALTED join and must hash-match."""
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
        n_salts=16,
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
               CAST(SUM(CASE WHEN e.value < (d.lo + d.hi) / 2.0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        FROM events e JOIN dim d USING (event_type)
        GROUP BY e.event_type, d.total
        ORDER BY e.event_type
    """
