"""Gold build pipeline (E3): aggregate builders persisted via keyed
upsert, with the reference's conservation reconciliation (C7).

Reference flow (Gold-Customer-Status-By-City.py:48-90, same shape ×5):
1. compute the gold aggregate from silver;
2. pre-merge reconciliation: the aggregate's count total must equal the
   silver row count (every silver row lands in exactly one group);
3. create-if-not-exists + MERGE upsert keyed on the group columns
   (matched groups take refreshed measures, new groups insert);
4. post-merge re-check against the table actually written (the
   reference has a copy-paste bug here, re-checking the wrong table —
   Gold-Orders-Type-Delivery-Time.py:80-84; fixed, not replicated).

Scale: gold group keys include the table's partition columns in the
reference layouts (year/month etc.), so the upsert is partition-scoped
— refreshing one month rewrites one month.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import ManagedTable


def build_gold(
    spark: SparkSession,
    gold_df: DataFrame,
    table_location: str,
    table_name: str,
    key_columns: Sequence[str],
    count_column: str,
    expected_total: int,
    partition_columns: Sequence[str] = (),
) -> ManagedTable:
    """Persist one gold aggregate with pre/post conservation checks."""
    total = gold_df.agg(F.sum(count_column).alias("t")).collect()[0]["t"] or 0
    if total != expected_total:
        raise AssertionError(
            f"gold {table_name}: aggregate total {total} != source rows "
            f"{expected_total} (pre-merge conservation, C7)"
        )
    table = ManagedTable(
        spark,
        table_name,
        table_location,
        schema=gold_df.schema,
        partition_columns=list(partition_columns),
    )
    table.create_if_not_exists()
    # null_safe_keys: GROUP BY puts all NULL keys in ONE group, so the
    # upsert must fold a NULL-key aggregate row instead of appending a
    # fresh one per refresh (round-12 review 5: legal NULL group keys
    # tripped the post-check AFTER committing, and the natural re-run
    # then duplicated the row — a real conservation violation)
    table.merge_upsert(
        gold_df, key_columns=list(key_columns), null_safe_keys=True
    )
    # post-merge: totals for the refreshed groups must match what we
    # wrote (checked on the table actually written — reference bug
    # Gold-Orders-Type-Delivery-Time.py:80-84 re-read the wrong table)
    from functools import reduce

    refreshed = gold_df.select(*key_columns).distinct().alias("__g")
    written = (
        table.read()
        .alias("__w")
        .join(
            refreshed,
            on=reduce(
                lambda a, b: a & b,
                [
                    F.col(f"__w.{k}").eqNullSafe(F.col(f"__g.{k}"))
                    for k in key_columns
                ],
            ),
            how="left_semi",
        )
        .agg(F.sum(count_column).alias("t"))
        .collect()[0]["t"]
        or 0
    )
    if written != total:
        raise AssertionError(
            f"gold {table_name}: post-merge total {written} != {total}"
        )
    return table
