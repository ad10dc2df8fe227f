"""APPLY CHANGES INTO — the DLT CDC-apply surface: land a change feed
(upserts + deletes, each stamped with an ordering column) into a
ManagedTable as SCD type 1 (latest state) or SCD type 2 (full
history with ``__START_AT``/``__END_AT``).

Reference shape: Delta Live Tables' ``apply_changes(target=…,
source=…, keys=…, sequence_by=…, apply_as_deletes=…,
stored_as_scd_type=1|2)`` — the API every Databricks CDC pipeline
lands Debezium/Goldengate feeds through. Semantics implemented:

- ``sequence_by`` orders changes; within one batch ALL versions of a
  key are considered — SCD1 keeps only the latest, SCD2 materializes
  every intermediate version with correct validity ranges.
- Cross-batch out-of-order: a change with a sequence ≤ the one already
  applied for its key is IGNORED (DLT's late-event rule), so replays
  and shuffled batches converge to the same state.
- ``apply_as_deletes`` is a SQL condition on the change row; a delete
  removes the key (SCD1) or closes its open version without inserting
  (SCD2).

Scale shape: SCD1 is ONE ``merge_clauses`` call — a single full-outer
shuffle join, conditions evaluated map-side; partition-scoped when the
keys cover the partition columns. SCD2 touches only the CHANGED keys:
the affected slice of the target is DV-deleted and its rebuilt history
appended in one atomic commit (merge-on-read — cold keys' files are
never rewritten); per-key history rebuild is a keyed window, no global
shuffle beyond the keys'.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.tables import ManagedTable

START_COL = "__START_AT"
END_COL = "__END_AT"
DELETED_COL = "__DELETED"


def scd1_current(target: ManagedTable) -> DataFrame:
    """The VISIBLE state of an SCD1 apply target: tombstoned keys
    filtered out, the tombstone column dropped. DLT's target views do
    the same — the physical table keeps deleted keys (with their
    sequence) so late upserts can never resurrect them."""
    return target.read().where(~F.col(DELETED_COL)).drop(DELETED_COL)


def _latest_per_key(
    ch: DataFrame, keys: Sequence[str], seq: str
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col(seq).desc())
    return (
        ch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    target: ManagedTable,
    changes: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    apply_as_deletes: str | None = None,
    except_columns: Sequence[str] = (),
    stored_as_scd_type: int = 1,
) -> int:
    """Apply one batch of CDC rows to ``target``. The change frame
    must carry the key columns, ``sequence_by``, and the data columns;
    ``except_columns`` are dropped before storing (DLT's
    except_column_list). Returns the committed version (or the current
    one when the batch is a no-op)."""
    keys = list(keys)
    if stored_as_scd_type == 1:
        return _apply_scd1(
            target, changes, keys, sequence_by, apply_as_deletes,
            except_columns,
        )
    if stored_as_scd_type == 2:
        return _apply_scd2(
            target, changes, keys, sequence_by, apply_as_deletes,
            except_columns,
        )
    raise ValueError(f"stored_as_scd_type must be 1 or 2, got {stored_as_scd_type!r}")


def _apply_scd1(
    target: ManagedTable,
    changes: DataFrame,
    keys: list[str],
    seq: str,
    apply_as_deletes: str | None,
    except_columns: Sequence[str],
) -> int:
    """Latest-state apply as a last-writer-wins register: the target
    physically stores EVERY key's newest change — deletes included, as
    tombstone rows flagged ``__DELETED`` — so the per-key fixpoint is
    argmax(sequence) regardless of batch arrival order. A tombstone
    carries its delete's sequence, which is what rejects a late upsert
    (the resurrection bug of tombstone-less CDC); replayed batches
    no-op because nothing they carry is newer. Read the visible state
    through :func:`scd1_current`. One merge_clauses call per batch:
    a single full-outer join, one conditional update clause, one
    insert clause."""
    # delete condition may reference except_columns — evaluate first
    del_flag = (
        F.coalesce(F.expr(apply_as_deletes), F.lit(False))
        if apply_as_deletes
        else F.lit(False)
    )
    ch = changes.withColumn(DELETED_COL, del_flag).drop(
        *[c for c in except_columns if c in changes.columns]
    )
    ch = _latest_per_key(ch, keys, seq)
    if target.current_version() < 0:
        if target.schema is None:
            target.schema = ch.schema
        cols = [f.name for f in target.schema.fields]
        if seq not in cols:
            raise ValueError(
                f"apply_changes(SCD1): target must store the sequencing "
                f"column {seq!r} to order cross-batch changes"
            )
        return target.overwrite(ch.select(*cols), op="APPLY CHANGES")
    if target.schema is None:
        target.schema = target._load_schema()
    cols = [f.name for f in target.schema.fields]
    if seq not in cols or DELETED_COL not in cols:
        raise ValueError(
            f"apply_changes(SCD1): target must carry {seq!r} and "
            f"{DELETED_COL!r} (create it through apply_changes)"
        )
    # commit-free no-op probe (one limit-1 job): a fully-replayed batch
    # carries nothing newer and no unseen key — skip the merge entirely,
    # so re-delivery causes zero version churn
    tgt_seq = target.read().select(
        *keys, F.col(seq).alias("__tgt_seq")
    )
    has_effect = (
        ch.join(tgt_seq, keys, "left")
        .where(
            F.col("__tgt_seq").isNull()
            | (F.col(seq) > F.col("__tgt_seq"))
        )
        .limit(1)
        .count()
    )
    if not has_effect:
        return target.current_version()
    newer = f"src.{seq} > {seq}"
    return target.merge_clauses(
        ch,
        keys,
        matched=[(newer, {c: f"src.{c}" for c in cols if c not in keys})],
        not_matched=[(None, "insert_all")],
    )


def _apply_scd2(
    target: ManagedTable,
    changes: DataFrame,
    keys: list[str],
    seq: str,
    apply_as_deletes: str | None,
    except_columns: Sequence[str],
) -> int:
    """History apply: every change version becomes a row valid
    [``__START_AT``, ``__END_AT``); the open version has NULL end.
    Only CHANGED keys' rows are touched: their current slice is
    DV-deleted and the rebuilt history appended in ONE commit."""
    # delete condition may reference except_columns — evaluate first
    del_flag = (
        F.coalesce(F.expr(apply_as_deletes), F.lit(False))
        if apply_as_deletes
        else F.lit(False)
    )
    ch = changes.withColumn("__del", del_flag).drop(
        *[c for c in except_columns if c in changes.columns]
    )
    data_cols = [c for c in ch.columns if c not in ("__del",)]
    # every batch version, with its validity window inside the batch
    w = Window.partitionBy(*keys).orderBy(F.col(seq))
    versioned = (
        ch.withColumn(START_COL, F.col(seq))
        .withColumn(END_COL, F.lead(seq).over(w))
        .withColumn("__first_seq", F.min(seq).over(Window.partitionBy(*keys)))
    )
    out_cols = [c for c in data_cols if c != seq] + [START_COL, END_COL]
    if target.current_version() < 0:
        fresh = versioned.where(~F.col("__del")).select(*out_cols)
        return target.overwrite(fresh, op="APPLY CHANGES (SCD2)")
    if target.schema is None:
        target.schema = target._load_schema()
    tcols = [f.name for f in target.schema.fields]
    # the affected slice of the target (positioned, for the DV delete)
    snap = target._read_internal(target.current_version(), with_pos=True)
    batch_keys = ch.select(*keys).distinct()
    affected = snap.join(F.broadcast(batch_keys), keys, "left_semi")
    # late-batch guard: a batch is applied to a key only when its
    # first sequence is strictly newer than the key's HIGH-WATER —
    # max over its history of coalesce(end, start), which covers both
    # the open version (start) and a closing delete (end). Replayed
    # batches (checkpoint loss, re-delivery) therefore no-op entirely.
    hw = affected.groupBy(*keys).agg(
        F.max(F.coalesce(F.col(END_COL), F.col(START_COL))).alias("__hw")
    )
    firsts = versioned.select(*keys, "__first_seq").distinct()
    valid_keys = firsts.join(hw, keys, "left").where(
        F.col("__hw").isNull() | (F.col("__first_seq") > F.col("__hw"))
    ).select(*keys)
    versioned = versioned.join(F.broadcast(valid_keys), keys, "left_semi")
    affected = affected.join(F.broadcast(valid_keys), keys, "left_semi")
    if versioned.isEmpty():
        return target.current_version()
    # the affected slice feeds FOUR consumers (doomed positions,
    # closed_old, open_closed, and the batch-first join) — one eager
    # materialization beats re-scanning the target's files per branch
    # (plan-audited: each branch otherwise re-reads the slice)
    affected = affected.localCheckpoint()
    # rebuilt history for the affected keys: closed old rows unchanged,
    # the open row closed at the batch's first sequence, new versions
    closed_old = affected.where(F.col(END_COL).isNotNull()).select(*tcols)
    batch_first = versioned.select(
        *keys, F.col("__first_seq").alias("__bf")
    ).distinct()
    open_closed = (
        affected.where(F.col(END_COL).isNull())
        .join(batch_first, keys, "inner")
        .select(
            *[
                F.col("__bf").alias(END_COL)
                if c == END_COL
                else F.col(c)
                for c in tcols
            ]
        )
    )
    new_versions = versioned.where(~F.col("__del")).select(
        *[F.col(c) for c in out_cols]
    )
    replacement = closed_old.unionByName(open_closed).unionByName(
        new_versions.select(*tcols)
    )
    # one atomic commit: DV-delete the affected slice, append its
    # rebuilt history — cold keys' files untouched (merge-on-read)
    return target._delete_rows_dv(
        affected.select("__mt_key", "__mt_pos"),
        op="APPLY CHANGES (SCD2)",
        append_df=replacement,
    )


# ------------------------------------------------- oracle entries

def _cdc_batches(spark, sf_dir: str):
    """Three deterministic CDC batches synthesized from orders:
    seq 1 inserts every key, seq 2 reprices every 3rd key (+10),
    seq 3 deletes every 5th key — so multi-version keys, deletes, and
    untouched keys all occur (k%15==0 hits both)."""
    from ..queries._util import load

    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
    )
    b1 = base.select(
        "k", "price", F.lit(1).cast("long").alias("seq"),
        F.lit("upsert").alias("op"),
    )
    b2 = base.where(F.col("k") % 3 == 0).select(
        "k", (F.col("price") + 10).alias("price"),
        F.lit(2).cast("long").alias("seq"), F.lit("upsert").alias("op"),
    )
    b3 = base.where(F.col("k") % 5 == 0).select(
        "k", F.lit(0.0).alias("price"),
        F.lit(3).cast("long").alias("seq"), F.lit("delete").alias("op"),
    )
    return b1, b2, b3


def _cdc_table(spark, sf_dir: str, scd: int) -> ManagedTable:
    import os
    import shutil

    from ..queries.managed_scan import _corpus_fingerprint
    from ..sources.tables import ConcurrentWriteError
    from ..streaming.windows import _scratch_root

    h = _corpus_fingerprint(sf_dir)
    loc = os.path.join(_scratch_root(), f"cdc{scd}_tbl2_{h}")
    t = ManagedTable(spark, f"cdc{scd}", loc)
    v = t.current_version()
    if v == 2:
        return t
    if v >= 0:  # partial build: restart (sequence is deterministic)
        shutil.rmtree(loc, ignore_errors=True)
        t = ManagedTable(spark, f"cdc{scd}", loc)
    try:
        for b in _cdc_batches(spark, sf_dir):
            apply_changes(
                t, b, ["k"], "seq", apply_as_deletes="op = 'delete'",
                except_columns=["op"], stored_as_scd_type=scd,
            )
    except ConcurrentWriteError:
        pass
    return t


def table_apply_changes_scd1(spark, sf_dir: str) -> DataFrame:
    """Latest state after three sequential CDC batches (insert /
    partial reprice / partial delete) through the SCD1 apply — one
    merge_clauses full-outer join per batch, late events rejected by
    the sequence conditions. DuckDB replays the fixpoint relationally."""
    from ..queries._util import cents

    t = _cdc_table(spark, sf_dir, 1)
    return (
        scd1_current(t)
        .groupBy((F.col("k") % 7).alias("grp"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(cents(F.col("price"))).alias("total_cents"),
            F.sum("seq").alias("sum_seq"),
        )
        .orderBy("grp")
    )


def table_apply_changes_scd1_oracle() -> str:
    from ..queries._util import cents_sql

    return f"""
        WITH base AS (
            SELECT o_orderkey AS k, o_totalprice AS price FROM orders
        ),
        final AS (
            SELECT k,
                   CASE WHEN k % 3 = 0 THEN price + 10 ELSE price END
                       AS price,
                   CASE WHEN k % 3 = 0 THEN 2 ELSE 1 END AS seq
            FROM base WHERE k % 5 <> 0
        )
        SELECT k % 7 AS grp,
               COUNT(*) AS n_rows,
               CAST(SUM({cents_sql('price')}) AS BIGINT) AS total_cents,
               CAST(SUM(seq) AS BIGINT) AS sum_seq
        FROM final GROUP BY grp ORDER BY grp
    """


def table_apply_changes_scd2(spark, sf_dir: str) -> DataFrame:
    """Full SCD2 history after the same three batches: every version a
    row with [__START_AT, __END_AT) validity — reprices close v1 at 2,
    deletes close the open version at 3 without inserting. The oracle
    constructs the identical history relationally; open-version counts
    make the NULL ends observable."""
    from ..queries._util import cents

    t = _cdc_table(spark, sf_dir, 2)
    return (
        t.read()
        .groupBy((F.col("k") % 7).alias("grp"))
        .agg(
            F.count("*").alias("n_versions"),
            F.sum(cents(F.col("price"))).alias("total_cents"),
            F.sum(F.col(START_COL)).alias("sum_start"),
            F.sum(F.coalesce(F.col(END_COL), F.lit(0))).alias("sum_end"),
            F.count(
                F.when(F.col(END_COL).isNull(), F.lit(1))
            ).alias("n_open"),
        )
        .orderBy("grp")
    )


def table_apply_changes_scd2_oracle() -> str:
    from ..queries._util import cents_sql

    return f"""
        WITH base AS (
            SELECT o_orderkey AS k, o_totalprice AS price FROM orders
        ),
        hist AS (
            -- v1: everyone; closed at 2 by a reprice, else at 3 by a
            -- delete, else open
            SELECT k, price, 1 AS s,
                   CASE WHEN k % 3 = 0 THEN 2
                        WHEN k % 5 = 0 THEN 3
                        ELSE NULL END AS e
            FROM base
            UNION ALL
            -- v2: repriced keys; closed at 3 by a delete, else open
            SELECT k, price + 10, 2 AS s,
                   CASE WHEN k % 5 = 0 THEN 3 ELSE NULL END AS e
            FROM base WHERE k % 3 = 0
        )
        SELECT k % 7 AS grp,
               COUNT(*) AS n_versions,
               CAST(SUM({cents_sql('price')}) AS BIGINT) AS total_cents,
               CAST(SUM(s) AS BIGINT) AS sum_start,
               CAST(SUM(COALESCE(e, 0)) AS BIGINT) AS sum_end,
               CAST(COUNT(CASE WHEN e IS NULL THEN 1 END) AS BIGINT)
                   AS n_open
        FROM hist GROUP BY grp ORDER BY grp
    """
