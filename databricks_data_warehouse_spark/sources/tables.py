"""Managed tables: partitioned parquet + MVCC pointer + MERGE emulation.

The reference persists everything as Delta tables and writes exclusively
via ``DeltaTable.merge`` (SURVEY.md §2.A S4-S7). ``delta-spark`` is not
available in this environment, so this module provides the same four
write primitives over plain parquet with a tiny MVCC layer:

- every write creates a new immutable version directory ``v=N``;
- ``_LATEST`` is a pointer file swapped atomically (os.replace);
- ``_SCHEMA`` persists the declared schema (JSON) so a fresh process —
  or an empty freshly-created table, which has no data files to infer
  from — reads back correctly;
- readers always read the pointed-at version → no read-overwrite
  conflict, re-runnable pipelines, cheap "time travel" for debugging;
- old versions are retained until an explicit ``vacuum()`` (mirroring
  Delta's VACUUM) so lazily-evaluated readers of older versions keep
  working across subsequent writes.

At cluster scale the pointer swap is a metadata-only commit (same idea
as Delta's transaction log, minus concurrent-writer arbitration, which
the reference never exercises — its orchestration is sequential,
readme.md:70-88). The pointer/schema files use driver-local ``open``/
``os.replace`` — local-FS only by design in this sandbox; an object-store
deployment would swap in a conditional-PUT commit.

Primitives (reference parity):
- create_if_not_exists        — S4 (Bronze-Ingestion-Customers.py:40-45)
- merge_insert_only           — S5 idempotent append (…:51-58): source
  rows with no all-column match in the target are appended.
- merge_update                — S6 update-matched-only (Silver-DLQ-*.py)
- merge_upsert                — S7 keyed upsert (Gold-*.py:74-81)
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LATEST = "_LATEST"
_SCHEMA = "_SCHEMA"


class ManagedTable:
    """A named, partitioned, versioned parquet table."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        location: str,
        schema: StructType | None = None,
        partition_columns: Sequence[str] = (),
    ):
        self.spark = spark
        self.name = name
        self.location = location
        self.schema = schema
        self.partition_columns = list(partition_columns)
        if self.schema is None:
            self.schema = self._load_schema()

    # ------------------------------------------------------------------ meta
    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.location, _LATEST)

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.location, _SCHEMA)

    def exists(self) -> bool:
        return os.path.exists(self._pointer_path)

    def current_version(self) -> int:
        if not self.exists():
            return -1
        with open(self._pointer_path) as f:
            return int(f.read().strip())

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.location, f"v={version}")

    def _commit(self, version: int) -> None:
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer_path)  # atomic pointer swap

    def _save_schema(self) -> None:
        if self.schema is None:
            return
        os.makedirs(self.location, exist_ok=True)
        tmp = self._schema_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.schema.json())
        os.replace(tmp, self._schema_path)

    def _load_schema(self) -> StructType | None:
        if not os.path.exists(self._schema_path):
            return None
        with open(self._schema_path) as f:
            return StructType.fromJson(json.loads(f.read()))

    # ------------------------------------------------------------------ DDL
    def create_if_not_exists(
        self, schema: StructType | None = None
    ) -> "ManagedTable":
        """S4: declare the table (schema + partitioning + location)."""
        if self.exists():
            return self
        schema = schema or self.schema
        if schema is None:
            raise ValueError(f"table {self.name}: no schema to create from")
        self.schema = schema
        empty = self.spark.createDataFrame([], schema)
        self._write_version(empty)
        return self

    # ------------------------------------------------------------------ I/O
    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"table {self.name} does not exist yet")
        if self.schema is None:
            self.schema = self._load_schema()
        reader = self.spark.read
        if self.schema is not None:
            # Explicit schema: (a) an empty freshly-created partitioned
            # table has zero data files — schema inference would throw
            # UNABLE_TO_INFER_SCHEMA; (b) partition columns come back with
            # directory-inferred types unless declared; (c) no cast-wrapping
            # projection needed, so filters still prune partitions.
            reader = reader.schema(self.schema)
        df = reader.parquet(self._version_dir(v))
        if self.schema is not None and df.columns != [f.name for f in self.schema.fields]:
            df = df.select(*[f.name for f in self.schema.fields])
        return df

    to_df = read  # reference idiom: DeltaTable.forName(...).toDF()

    def _write_version(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        path = self._version_dir(v)
        writer = df.write.mode("overwrite")
        if self.partition_columns:
            writer = writer.partitionBy(*self.partition_columns)
        writer.parquet(path)
        if self.schema is None:
            self.schema = df.schema
        self._save_schema()
        self._commit(v)
        return v

    def vacuum(self, keep: int = 2) -> None:
        """Drop version dirs older than the newest ``keep``.

        Explicit — mirroring Delta's VACUUM — because auto-gc inside every
        write would delete files still referenced by lazily-evaluated
        DataFrames returned from earlier ``read()`` calls.
        """
        current = self.current_version()
        if not os.path.isdir(self.location):
            return
        for entry in os.listdir(self.location):
            if entry.startswith("v="):
                v = int(entry.split("=", 1)[1])
                if v <= current - keep:
                    shutil.rmtree(os.path.join(self.location, entry), ignore_errors=True)

    def overwrite(self, df: DataFrame) -> int:
        return self._write_version(df.select(*[f.name for f in (self.schema or df.schema).fields]))

    # ---------------------------------------------------------------- MERGE
    def merge_insert_only(
        self, source: DataFrame, match_columns: Sequence[str] | None = None
    ) -> int:
        """S5: idempotent append — insert source rows with no match.

        ``match_columns`` defaults to all non-``ingestion_time`` columns
        (the reference's all-column condition, CommonFunctions.py:39-59).
        Implemented as a left-anti join + append: nulls in any match
        column never match (parity with SQL equality in Delta MERGE).
        """
        target = self.read()
        if match_columns is None:
            match_columns = [
                c for c in source.columns if "ingestion_time" not in c
            ]
        existing = target.select(*match_columns).distinct()
        new_rows = source.join(
            existing,
            on=[source[c] == existing[c] for c in match_columns],
            how="left_anti",
        )
        merged = target.unionByName(new_rows.select(*target.columns))
        return self._write_version(merged)

    def merge_upsert(self, source: DataFrame, key_columns: Sequence[str]) -> int:
        """S7: keyed upsert — matched target rows replaced by source values,
        unmatched source rows inserted (Gold-*.py whenMatchedUpdate +
        whenNotMatchedInsert). Equivalent relational form: target rows
        whose key has no source match, UNION ALL source."""
        target = self.read()
        keys = [k for k in key_columns]
        kept = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(source.select(*target.columns))
        return self._write_version(merged)

    def merge_update(
        self,
        source: DataFrame,
        key_columns: Sequence[str],
        set_map: Mapping[str, str] | None = None,
    ) -> int:
        """S6: update-matched-only (DLQ status refresh). Target rows with a
        source match take the source's values for ``set_map`` entries
        (target_col -> source column or expression, ``"alias.col"`` accepted
        for reference parity); unmatched target rows unchanged; unmatched
        source rows ignored. Raises if the source has duplicate keys —
        Delta MERGE errors on multiple matches; silently picking one would
        mask source-data bugs.
        """
        target = self.read()
        keys = list(key_columns)
        if set_map is None:
            resolved = {
                c: c for c in target.columns if c not in keys and c in source.columns
            }
        else:
            resolved = {}
            for tgt_col, src_expr in set_map.items():
                expr = src_expr
                # reference passes "updates.col" strings; strip the alias
                if "." in expr and expr not in source.columns:
                    candidate = expr.split(".", 1)[1]
                    if candidate in source.columns:
                        expr = candidate
                resolved[tgt_col] = expr
        dup = (
            source.groupBy(*keys).count().where(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                f"merge_update into {self.name}: source has duplicate keys on "
                f"{keys} — Delta MERGE raises on multiple matches"
            )
        src = source.select(
            *keys, *[F.expr(e).alias(f"__src_{c}") for c, e in resolved.items()]
        )
        src_key_marker = "__src_match"
        joined = target.join(src.withColumn(src_key_marker, F.lit(True)), on=keys, how="left")
        out_cols = []
        for c in target.columns:
            if c in resolved:
                out_cols.append(
                    F.when(F.col(src_key_marker), F.col(f"__src_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                out_cols.append(F.col(c))
        return self._write_version(joined.select(*out_cols))
