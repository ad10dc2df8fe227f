"""Scoped release of ``localCheckpoint`` storage blocks.

Iterative operators (``connected_components``) truncate lineage every
round with an eager ``localCheckpoint`` so the plan stays constant-size.
Spark never frees those blocks on its own — the checkpointed RDD *is*
the data (lineage is gone), so executor storage grows monotonically
until the session dies. BENCH_r05 showed exactly that: the dedup
queries' wall time grew 8.5→23 s across reps and the leaked blocks
degraded every later query in the run.

The fix is scoped, not ``spark.catalog.clearCache()`` (which would also
evict intentional caches like the IVF inverted-list index): each
``local_checkpoint`` call diffs the JVM's persistent-RDD registry
before/after, so the caller holds the exact block ids that checkpoint
created and can release them the moment the next round's checkpoint
materializes. A round's blocks are ONLY safe to free once nothing will
read them again — unpersisting a local checkpoint destroys the data
(its lineage is truncated) — hence:

- superseded iteration rounds are released inside the loop, once the
  successor round is eagerly materialized;
- the FINAL result's blocks must outlive the function (the caller has
  yet to consume the DataFrame), so they go to a deferred list that the
  next invocation — or an explicit ``release_deferred`` from a bench /
  pipeline boundary — frees.

At 100 TB this is the difference between a label-propagation job whose
storage footprint is 2 rounds of the (small) node/label relation and
one that accumulates every round of every invocation until executors
start evicting working-set blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.session import SparkSession

# block ids of final-result checkpoints whose consumers may still be
# pending; freed by the next iterative-operator call or an explicit
# release_deferred() at a query boundary (bench.py does this per query)
_DEFERRED: list[int] = []


def _persistent_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def local_checkpoint(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """Eagerly local-checkpoint ``df``; return the checkpointed frame and
    the storage-block (RDD) ids the checkpoint created, for later
    :func:`release`."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    ck = df.localCheckpoint(eager=True)
    ids = sorted(_persistent_ids(spark) - before)
    return ck, ids


def release(spark: SparkSession, ids: list[int]) -> None:
    """Free the storage blocks behind checkpoint ``ids``. The owning
    DataFrames become unreadable (lineage was truncated) — only call
    once their successors are materialized."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


def defer_release(ids: list[int]) -> None:
    """Queue ``ids`` to be freed at the next safe boundary (the returned
    DataFrame may not have been consumed yet)."""
    _DEFERRED.extend(ids)


def release_deferred(spark: SparkSession) -> None:
    """Free every deferred block. Safe whenever no DataFrame returned by
    a previous iterative-operator call is still awaiting an action —
    e.g. between bench queries or pipeline stages."""
    if _DEFERRED:
        release(spark, _DEFERRED)
        _DEFERRED.clear()
