"""Deterministic epoch shuffling — the training-data loader's
"shuffle the corpus differently every epoch, identically on every
re-run" primitive.

Reference parity note: like ``ext/rowid.py`` and ``ext/packing.py``
this extends the engine past the reference's gold layer into
training-pipeline territory: a 100 TB corpus is consumed in a
pseudorandom but REPRODUCIBLE order (crash-recovery, elastic workers,
and eval ablations all need to replay the exact byte order of epoch
k), and the order must change between epochs without rewriting data.

Design for 100 TB:

- The permutation is ``ORDER BY md5(key || ':' || epoch)`` — a keyed
  hash, not ``rand()``: deterministic for a (row, epoch) pair across
  runs, engines and retries (Spark task retries re-evaluate
  expressions; ``F.rand`` gives a retried task a fresh draw — the
  classic nondeterminism bug salting already avoids with xxhash64).
  md5 is chosen over xxhash64 here because both Spark and the DuckDB
  oracle compute the identical lowercase-hex digest, making the WHOLE
  permutation cross-engine checkable, not just row membership.
- Positions come from :func:`..ext.rowid.assign_row_ids` — one range
  shuffle on the digest plus a metadata-sized offset pass. No global
  window, no single-partition Exchange, no driver-side sort.
- Shard assignment is pure arithmetic on the position (round-robin
  ``pos % n``), so the n_shards output files are equal-sized ±1 and a
  reader streaming shard s in position order replays exactly its slice
  of the global permutation. Writing then needs only
  ``.repartition(n, "shard_id")`` — one more shuffle, co-locating each
  shard's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries._util import load
from .rowid import assign_row_ids

_KEY = "__epoch_shuffle_key"


def epoch_shuffle(
    df: DataFrame,
    key_cols: list[str],
    epoch: int,
    pos_col: str = "shuffle_pos",
    n_shards: int | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """``df`` with a 1-based ``pos_col`` giving the row's position in
    the epoch's deterministic pseudorandom permutation (and, when
    ``n_shards`` is set, a round-robin ``shard_col``). ``key_cols``
    must uniquely identify rows — the key doubles as the tie-break so
    the permutation is a total order even under digest collisions.
    A NULL in any key column RAISES (VERDICT r09): concat_ws would
    silently skip it, colliding distinct composite keys (["a", NULL,
    "b"] vs ["a", "b", NULL]) onto one digest and weakening the
    tie-break — a quiet violation of the uniqueness contract."""
    parts = []
    for c in key_cols:
        parts.append(
            F.when(
                F.col(c).isNull(),
                F.raise_error(
                    F.lit(
                        f"epoch_shuffle: NULL in key column {c!r} — "
                        "key_cols must uniquely identify every row"
                    )
                ).cast("string"),
            ).otherwise(F.col(c).cast("string"))
        )
    key = F.md5(F.concat_ws(":", *parts, F.lit(str(epoch))))
    out = assign_row_ids(
        df.withColumn(_KEY, key), [_KEY, *key_cols], id_col=pos_col
    ).drop(_KEY)
    if n_shards is not None:
        out = out.withColumn(
            shard_col, ((F.col(pos_col) - 1) % n_shards).cast("int")
        )
    return out


def data_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents corpus in epoch-7's permutation, sharded 8 ways —
    the pre-training export shape. The oracle replays the identical
    md5 permutation, pinning position-for-position equality of the
    whole shuffle (not merely membership)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return epoch_shuffle(docs, ["doc_id"], epoch=7, n_shards=8).select(
        "doc_id", "n_chars", "shuffle_pos", "shard_id"
    )


def data_epoch_shuffle_oracle() -> str:
    return """
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id
               ) AS shuffle_pos,
               CAST((ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id
               ) - 1) % 8 AS INT) AS shard_id
        FROM documents
    """
