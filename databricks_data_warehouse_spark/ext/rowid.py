"""Scalable global row numbering — contiguous 1-based ids in a total
order, WITHOUT the single-partition collapse of a bare
``row_number() OVER (ORDER BY …)``.

Reference parity note: like ``ext/packing.py``, this extends the engine
past the reference's gold layer into training-data territory (stable
example ids for shuffling/checkpointing a corpus); the semantics are
exactly ANSI ``ROW_NUMBER() OVER (ORDER BY key)``, which is what the
DuckDB oracle runs.

Design for 100 TB — why not the obvious forms:

- ``row_number() OVER (ORDER BY key)`` with an empty partition clause
  makes Spark move EVERY row into ONE partition (the plan shows a
  single-partition Exchange); at 100 TB that executor dies. This is the
  canonical window-function scale trap.
- ``monotonically_increasing_id`` is distributed but neither contiguous
  nor stable across partitioning changes; ``zipWithIndex`` is an RDD
  round-trip that breaks whole-stage codegen and column pruning.

The scalable shape is the classic two-phase assignment:

1. one range shuffle (``repartitionByRange`` on the order key) plus an
   in-partition sort — partitions now tile the global order;
2. a metadata-sized pass collects per-partition row counts (one number
   per partition — KB, not data) and prefix-sums them on the driver;
3. an Arrow-batched ``mapInPandas`` adds each partition's offset to a
   running local counter — no second data shuffle, no window at all.

Both passes derive from the SAME shuffled DataFrame object, so Spark
reuses the exchange's shuffle files for pass 2 (stage reuse) — the
range boundaries are sampled once, making the partition assignment,
and therefore the ids, deterministic within the job. Total cost: one
shuffle + one metadata collect, vs. the window form's one shuffle into
one partition. Determinism across engines additionally requires the
order key(s) to form a total order (no ties) — with ties the ids would
be assignment-order-dependent in ANY engine, oracle included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import load


def assign_row_ids(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ROW_NUMBER() OVER (ORDER BY order_by)`` as ``id_col`` (1-based,
    contiguous), computed with one range shuffle and no global window.
    ``order_by`` must be a total order (unique key combination) for the
    ids to be well-defined."""
    from pyspark import TaskContext

    shuffled = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    ).sortWithinPartitions(*order_by)

    count_schema = "pid int, cnt long"

    def count_partition(it):
        import pandas as pd

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in it:
            n += len(pdf)
        yield pd.DataFrame({"pid": [pid], "cnt": [n]})

    counts = {
        r.pid: r.cnt
        for r in shuffled.mapInPandas(count_partition, count_schema)
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_fields = df.schema.fields
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + f", `{id_col}` long"
    )

    def number(it):
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in it:
            ids = range(base + seen + 1, base + seen + 1 + len(pdf))
            pdf = pdf.copy()
            pdf[id_col] = list(ids)
            seen += len(pdf)
            yield pdf

    return shuffled.mapInPandas(number, out_schema)


def op_assign_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders numbered 1..N in ``o_orderkey`` order (a unique key, so
    the total order is well-defined). Oracle: ANSI ROW_NUMBER."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return assign_row_ids(orders, ["o_orderkey"]).select(
        "o_orderkey", "o_custkey", F.col("row_id")
    )


def op_assign_row_ids_oracle() -> str:
    return """
        SELECT o_orderkey, o_custkey,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS row_id
        FROM orders
    """
