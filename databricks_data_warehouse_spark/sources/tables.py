"""Managed tables: partitioned parquet + manifest MVCC + MERGE emulation.

The reference persists everything as Delta tables and writes exclusively
via ``DeltaTable.merge`` (SURVEY.md §2.A S4-S7). ``delta-spark`` is not
available in this environment, so this module provides the same four
write primitives over plain parquet with a manifest-based MVCC layer
(the same shape as Delta/Iceberg snapshots):

- every version is a **manifest**: a map from partition value tuple to
  the immutable data directory holding that partition's current files;
- a write stages only the partitions it touches into a fresh
  ``data/w=<version>/`` tree and the new manifest reuses the previous
  entries for every untouched partition — **merge cost scales with the
  batch's partitions, not with table size** (a full-table copy per
  micro-batch would be fatal at 100 TB);
- ``_LATEST`` is a pointer file swapped atomically (os.replace);
- ``_SCHEMA`` persists the declared schema (JSON) so a fresh process —
  or an empty freshly-created table, which has no data files to infer
  from — reads back correctly;
- readers always read the pointed-at manifest → no read-overwrite
  conflict, re-runnable pipelines, cheap time travel for debugging;
- data dirs are retained until an explicit ``vacuum()`` (mirroring
  Delta's VACUUM) so lazily-evaluated readers of older versions keep
  working across subsequent writes.

At cluster scale the pointer swap is a metadata-only commit (same idea
as Delta's transaction log, minus concurrent-writer arbitration, which
the reference never exercises — its orchestration is sequential,
readme.md:70-88). The pointer/schema/manifest files use driver-local
``open``/``os.replace`` — local-FS only by design in this sandbox; an
object-store deployment would swap in a conditional-PUT commit.

Partition-scoped merging requires that a source row can only match
target rows in its own partition: always true for the all-column match
of ``merge_insert_only``; true for keyed merges when the partition
columns are a subset of the merge keys (the reference's gold tables all
satisfy this — e.g. Gold-Orders-By-City.py:69-80 merges on
city/year/month over a year/month layout). Otherwise these fall back to
a full rewrite, like Delta falls back to scanning all files when no
pruning predicate exists.

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
from functools import reduce
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_LATEST = "_LATEST"
_SCHEMA = "_SCHEMA"
_MANIFEST_PREFIX = "_MANIFEST.v="
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class ManagedTable:
    """A named, partitioned, versioned parquet table."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        location: str,
        schema: StructType | None = None,
        partition_columns: Sequence[str] = (),
        sort_columns: Sequence[str] = (),
        retain_versions: int | None = None,
    ):
        self.spark = spark
        self.name = name
        self.location = location
        self.schema = schema
        self.partition_columns = list(partition_columns)
        # clustering within files: rows sorted by these columns before
        # write, so parquet row-group min/max stats prune point/range
        # scans on them (the Z-order-lite that plain parquet offers)
        self.sort_columns = list(sort_columns)
        # auto-vacuum: keep only the newest N versions after each commit
        # (Delta's checkpoint-retention analogue for write-heavy tables,
        # e.g. a streaming sink committing per micro-batch). None (the
        # default) retains everything until an explicit vacuum() —
        # auto-gc is only safe when no reader holds a lazily-evaluated
        # DataFrame of an older version across commits, which is true
        # for the read-merge-write cycle inside foreachBatch but not in
        # general.
        self.retain_versions = retain_versions
        if self.schema is None:
            self.schema = self._load_schema()

    # ------------------------------------------------------------------ meta
    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.location, _LATEST)

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.location, _SCHEMA)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.location, f"{_MANIFEST_PREFIX}{version}")

    def exists(self) -> bool:
        return os.path.exists(self._pointer_path)

    def current_version(self) -> int:
        if not self.exists():
            return -1
        with open(self._pointer_path) as f:
            return int(f.read().strip())

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

    def _read_manifest(self, version: int) -> dict[str, str]:
        path = self._manifest_path(version)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"table {self.name}: manifest for version {version} missing "
                "(vacuumed or never written)"
            )
        with open(path) as f:
            return json.loads(f.read())["entries"]

    def _write_manifest(self, version: int, entries: Mapping[str, str]) -> None:
        os.makedirs(self.location, exist_ok=True)
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"entries": dict(entries)}, sort_keys=True))
        os.replace(tmp, self._manifest_path(version))

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
        self._save_schema()
        self._write_manifest(0, {})
        self._commit(0)
        return self

    # ------------------------------------------------------------------ I/O
    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"table {self.name} does not exist yet")
        if self.schema is None:
            self.schema = self._load_schema()
        if self.schema is None:
            raise ValueError(f"table {self.name}: no schema available")
        cols = [f.name for f in self.schema.fields]
        entries = self._read_manifest(v)
        if not entries:
            return self.spark.createDataFrame([], self.schema)
        # group entry dirs by their write root so partition-column
        # recovery (basePath-relative dir names) works per group; one
        # scan per write root, unioned. Untouched partitions keep their
        # original files, so a manifest typically spans few write roots
        # (and compact() collapses them to one).
        groups: dict[str, list[str]] = {}
        for rel in entries.values():
            parts = rel.split("/")
            wroot = "/".join(parts[:2])  # data/w=<N>
            groups.setdefault(wroot, []).append(rel)
        scans = []
        for wroot, rels in sorted(groups.items()):
            reader = self.spark.read.schema(self.schema).option(
                "basePath", os.path.join(self.location, wroot)
            )
            scans.append(
                reader.parquet(
                    *[os.path.join(self.location, r) for r in sorted(rels)]
                ).select(*cols)
            )
        return reduce(DataFrame.unionByName, scans)

    to_df = read  # reference idiom: DeltaTable.forName(...).toDF()

    # ----------------------------------------------------------- write core
    def _walk_staged(self, write_dir: str, write_rel: str) -> dict[str, str]:
        """Discover partition dirs produced by a staged write.

        Keys are JSON lists of partition value strings (None for the
        hive null dir) — derived from directory names on every write, so
        they are canonical across writes regardless of source types.
        """
        if not self.partition_columns:
            return {"[]": write_rel}
        staged: dict[str, str] = {}

        def rec(d: str, rel: str, vals: list[str | None]) -> None:
            if len(vals) == len(self.partition_columns):
                staged[json.dumps(vals)] = rel
                return
            if not os.path.isdir(d):
                return
            for entry in sorted(os.listdir(d)):
                if "=" not in entry or entry.startswith(("_", ".")):
                    continue
                raw = entry.split("=", 1)[1]
                val = None if raw == _HIVE_NULL else unquote(raw)
                rec(os.path.join(d, entry), f"{rel}/{entry}", vals + [val])

        rec(write_dir, write_rel, [])
        return staged

    def _stage_and_commit(self, df: DataFrame, *, replace_all: bool) -> int:
        """Write ``df``'s partitions as version ``current+1``.

        With ``replace_all`` the new manifest contains only the staged
        partitions; otherwise staged partitions replace their previous
        entries and all other entries carry over untouched (their files
        are never rewritten — byte-identical across the merge).
        """
        v_new = self.current_version() + 1
        write_rel = f"data/w={v_new}"
        write_dir = os.path.join(self.location, write_rel)
        if self.sort_columns:
            df = df.sortWithinPartitions(*self.sort_columns)
        writer = df.write.mode("overwrite")
        if self.partition_columns:
            writer = writer.partitionBy(*self.partition_columns)
        writer.parquet(write_dir)
        staged = self._walk_staged(write_dir, write_rel)
        if replace_all or v_new == 0:
            entries = staged
        else:
            entries = {**self._read_manifest(v_new - 1), **staged}
        if self.schema is None:
            self.schema = df.schema
        self._save_schema()
        self._write_manifest(v_new, entries)
        self._commit(v_new)
        if self.retain_versions is not None:
            self.vacuum(keep=self.retain_versions)
        return v_new

    def _commit_metadata_only(self) -> int:
        """Bump the version carrying the current schema but the PREVIOUS
        manifest's entries unchanged — no data files are written. Used
        when a merge changes the schema (evolution) but inserts nothing."""
        v_new = self.current_version() + 1
        self._save_schema()
        self._write_manifest(v_new, self._read_manifest(v_new - 1))
        self._commit(v_new)
        if self.retain_versions is not None:
            self.vacuum(keep=self.retain_versions)
        return v_new

    def overwrite(self, df: DataFrame) -> int:
        cols = [f.name for f in (self.schema or df.schema).fields]
        return self._stage_and_commit(df.select(*cols), replace_all=True)

    def compact(self) -> int:
        """Rewrite the whole table into a single write root (collapses
        the union of scans ``read`` builds after many partial writes)."""
        return self.overwrite(self.read())

    def history(self) -> list[dict]:
        """Version history from the manifests still on disk (newest
        first): version, partition count, write roots — the DESCRIBE
        HISTORY analogue."""
        out = []
        if not os.path.isdir(self.location):
            return out
        for entry in sorted(os.listdir(self.location), reverse=True):
            if not entry.startswith(_MANIFEST_PREFIX):
                continue
            v = int(entry[len(_MANIFEST_PREFIX):])
            entries = self._read_manifest(v)
            roots = {"/".join(rel.split("/")[:2]) for rel in entries.values()}
            out.append(
                {"version": v, "partitions": len(entries), "write_roots": len(roots)}
            )
        out.sort(key=lambda d: -d["version"])
        return out

    def describe(self) -> dict:
        """Current-table summary: schema, layout, version, partitions."""
        return {
            "name": self.name,
            "location": self.location,
            "version": self.current_version(),
            "partition_columns": list(self.partition_columns),
            "sort_columns": list(self.sort_columns),
            "schema": self.schema.simpleString() if self.schema else None,
            "partitions": len(self._read_manifest(self.current_version()))
            if self.exists()
            else 0,
        }

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Delta Change-Data-Feed analogue: the row-level content diff
        between two snapshots, as full rows tagged ``_change_type`` ∈
        {insert, delete} (an update surfaces as delete+insert of the
        changed row — the same convention Delta CDF uses without
        update preimage tracking).

        Computed as two EXCEPT ALLs over the snapshot reads, so it needs
        no per-write change journal: any pair of still-readable versions
        can be diffed after the fact. Multiset semantics (exceptAll)
        keep duplicate-row cardinality honest. At scale each EXCEPT is a
        shuffle on the full row hash — the same cost Delta pays when CDF
        wasn't enabled at write time and it must diff snapshots.
        """
        v_to = self.current_version() if to_version is None else to_version
        old = self.read(from_version)
        new = self.read(v_to)
        inserts = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        deletes = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        return inserts.unionByName(deletes)

    def vacuum(self, keep: int = 2) -> None:
        """Drop data dirs not referenced by the newest ``keep`` manifests
        (and the superseded manifests themselves).

        Explicit — mirroring Delta's VACUUM — because auto-gc inside
        every write would delete files still referenced by lazily-
        evaluated DataFrames returned from earlier ``read()`` calls.
        """
        current = self.current_version()
        if current < 0 or not os.path.isdir(self.location):
            return
        oldest_kept = max(0, current - keep + 1)
        referenced: set[str] = set()
        dropped_manifests: list[int] = []
        for entry in os.listdir(self.location):
            if not entry.startswith(_MANIFEST_PREFIX):
                continue
            v = int(entry[len(_MANIFEST_PREFIX):])
            if v >= oldest_kept:
                referenced |= set(self._read_manifest(v).values())
            else:
                dropped_manifests.append(v)
        dead: set[str] = set()
        for v in dropped_manifests:
            dead |= set(self._read_manifest(v).values())
        for rel in dead - referenced:
            shutil.rmtree(os.path.join(self.location, rel), ignore_errors=True)
        for v in dropped_manifests:
            os.remove(self._manifest_path(v))
        # prune now-empty write roots
        data_root = os.path.join(self.location, "data")
        if os.path.isdir(data_root):
            for entry in os.listdir(data_root):
                d = os.path.join(data_root, entry)
                for dirpath, dirnames, filenames in os.walk(d, topdown=False):
                    if not dirnames and not filenames:
                        os.rmdir(dirpath)
                    elif all(f in ("_SUCCESS",) for f in filenames) and not dirnames:
                        shutil.rmtree(dirpath, ignore_errors=True)

    # ------------------------------------------------------------ partitions
    def _source_partition_filter(self, source: DataFrame) -> Column | None:
        """Predicate selecting the target partitions present in ``source``
        (collected — partition tuples are low-cardinality by layout
        design, the same assumption Delta makes when listing partitions).
        Returns None when the source is empty."""
        tuples = source.select(*self.partition_columns).distinct().collect()
        if not tuples:
            return None
        ors = []
        for t in tuples:
            ands = [
                F.col(c).isNull() if t[c] is None else (F.col(c) == F.lit(t[c]))
                for c in self.partition_columns
            ]
            ors.append(reduce(lambda a, b: a & b, ands))
        return reduce(lambda a, b: a | b, ors)

    # ------------------------------------------------------- schema evolution
    def _evolve_schema(self, source: DataFrame) -> tuple[DataFrame, StructType]:
        """Delta ``autoMerge`` semantics for the manifest-MVCC substitute:
        new source columns are APPENDED to the table schema (nullable —
        pre-existing rows read back NULL for them, exactly as Spark's
        parquet reader null-fills a column absent from old files);
        table columns missing from the source are null-filled in the
        returned aligned source; a same-named column with a different
        type is cast to the table's type, raising if the cast is not
        allowed (Delta raises on incompatible evolution too).

        Pure — returns ``(aligned_source, evolved_schema)`` WITHOUT
        touching ``self.schema``: the caller installs the evolved schema
        around the commit and rolls it back if the write fails, so a
        failed merge can't leave the in-memory schema projecting phantom
        columns no committed version carries. The evolved schema is
        persisted by the commit that carries it (``_stage_and_commit`` →
        ``_save_schema``); old manifests and their untouched files stay
        readable under the widened schema — snapshot reads of
        pre-evolution versions simply show NULL for the appended
        columns.
        """
        if self.schema is None:
            return source, source.schema
        evolved = self.schema
        table_names = {f.name for f in evolved.fields}
        added = [
            StructField(f.name, f.dataType, True)
            for f in source.schema.fields
            if f.name not in table_names
        ]
        if added:
            evolved = StructType(list(evolved.fields) + added)
        src_types = {f.name: f.dataType for f in source.schema.fields}
        aligned = []
        for f in evolved.fields:
            if f.name not in src_types:
                aligned.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif src_types[f.name] != f.dataType:
                aligned.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                aligned.append(F.col(f.name))
        return source.select(*aligned), evolved

    def _check_source_columns(self, source: DataFrame) -> None:
        """Without ``merge_schema``, any column drift is an error — the
        reference's Delta merges fail the same way when a source adds or
        drops a column and autoMerge is off."""
        if self.schema is None:
            return
        table_cols = {f.name for f in self.schema.fields}
        src_cols = set(source.columns)
        if table_cols != src_cols:
            extra = sorted(src_cols - table_cols)
            missing = sorted(table_cols - src_cols)
            raise ValueError(
                f"merge into {self.name}: source schema drift "
                f"(extra columns {extra}, missing columns {missing}); "
                "pass merge_schema=True to evolve the table schema"
            )

    # ---------------------------------------------------------------- MERGE
    def merge_insert_only(
        self,
        source: DataFrame,
        match_columns: Sequence[str] | None = None,
        merge_schema: bool = False,
    ) -> int:
        """S5: idempotent append — insert source rows with no match.

        ``match_columns`` defaults to all non-``ingestion_time`` columns
        (the reference's all-column condition, CommonFunctions.py:39-59).
        Implemented as a left-anti join + append with NULL-SAFE equality
        (``<=>``): a replayed row whose match columns contain NULLs
        still matches its earlier copy, keeping the re-run idempotent —
        the whole point of this primitive. (Delta MERGE with a plain
        ``=`` condition re-inserts NULL-bearing rows on replay; the
        reference's data has no NULLs in its match columns, so this
        deviation is invisible there and strictly safer here — it bit
        for real when schema evolution null-filled an added column.)

        Only the source's partitions gain rows, so they alone are
        rewritten; every other partition's entry (and files) carries
        over untouched. The anti-join's match set is restricted to those
        partitions too when the match columns cover the partition
        columns (all-column match always does); for a narrower keyed
        match the whole table's keys are scanned (a match may live in
        another partition) but the rewrite stays partition-scoped.

        ``merge_schema`` enables Delta-autoMerge-style evolution: new
        source columns are appended to the table schema, missing ones
        null-filled (:meth:`_evolve_schema`). The default (all-column)
        match condition is built from the SOURCE's real columns before
        alignment, so a null-filled column never silently joins the
        match key.

        A merge that inserts NOTHING commits nothing (one limit-1 probe
        of the anti-join): the reference's idempotent re-run pattern
        (Bronze-Ingestion-Customers.py:51-58 replaying an already-
        ingested batch) costs ~0 instead of a table rewrite — the same
        no-op short-circuit Delta's MERGE does when no file changes.
        If the schema evolved but no rows landed, a metadata-only
        version carries the widened schema.
        """
        if match_columns is None:
            match_columns = [
                c for c in source.columns if "ingestion_time" not in c
            ]
        prev_schema = self.schema
        if merge_schema:
            source, evolved = self._evolve_schema(source)
            self.schema = evolved  # rolled back below if the merge fails
        else:
            self._check_source_columns(source)
        try:
            target = self.read()
            if self.partition_columns:
                pf = self._source_partition_filter(source)
                if pf is None:  # empty source: no-op, no schema change
                    self.schema = prev_schema
                    return self.current_version()
                match_covers_partitions = set(self.partition_columns) <= set(
                    match_columns
                )
                existing_src = (
                    target.filter(pf) if match_covers_partitions else target
                )
                target = target.filter(pf)
            else:
                existing_src = target
            existing = existing_src.select(*match_columns).distinct()
            new_rows = source.join(
                existing,
                on=[source[c].eqNullSafe(existing[c]) for c in match_columns],
                how="left_anti",
            )
            if new_rows.isEmpty():
                if merge_schema and evolved != prev_schema:
                    return self._commit_metadata_only()
                return self.current_version()
            merged = target.unionByName(new_rows.select(*target.columns))
            return self._stage_and_commit(
                merged, replace_all=not self.partition_columns
            )
        except BaseException:
            self.schema = prev_schema
            raise

    def merge_upsert(
        self,
        source: DataFrame,
        key_columns: Sequence[str],
        merge_schema: bool = False,
    ) -> int:
        """S7: keyed upsert — matched target rows replaced by source values,
        unmatched source rows inserted (Gold-*.py whenMatchedUpdate +
        whenNotMatchedInsert). Equivalent relational form: target rows
        whose key has no source match, UNION ALL source.

        Partition-scoped when the partition columns are part of the key
        (a key's rows then live in exactly one partition); otherwise a
        matching key could exist in an untouched partition and the whole
        table is rewritten.

        ``merge_schema`` evolves the table schema as in
        :meth:`merge_insert_only`.
        """
        keys = list(key_columns)
        prev_schema = self.schema
        if merge_schema:
            source, evolved = self._evolve_schema(source)
            self.schema = evolved  # rolled back below if the merge fails
        else:
            self._check_source_columns(source)
        try:
            if source.isEmpty():  # no-op: nothing matched, nothing inserted
                self.schema = prev_schema
                return self.current_version()
            scoped = bool(self.partition_columns) and set(
                self.partition_columns
            ) <= set(keys)
            target = self.read()
            if scoped:
                pf = self._source_partition_filter(source)
                if pf is None:
                    self.schema = prev_schema
                    return self.current_version()
                target = target.filter(pf)
            kept = target.join(
                source.select(*keys).distinct(), on=keys, how="left_anti"
            )
            merged = kept.unionByName(source.select(*target.columns))
            return self._stage_and_commit(merged, replace_all=not scoped)
        except BaseException:
            self.schema = prev_schema
            raise

    def merge_delete(self, source: DataFrame, key_columns: Sequence[str]) -> int:
        """Delta ``whenMatchedDelete`` parity: target rows whose key
        matches a source row are REMOVED; everything else carries over.
        The right-to-erasure primitive (delete all rows for a set of
        user ids) and the retraction half of a CDC apply.

        Partition-scoped exactly like :meth:`merge_upsert`: when the
        partition columns are part of the key, only the source's
        partitions are rewritten — a keyed delete against a 100 TB
        table touches only the partitions holding those keys.
        """
        keys = list(key_columns)
        scoped = bool(self.partition_columns) and set(
            self.partition_columns
        ) <= set(keys)
        target = self.read()
        if scoped:
            pf = self._source_partition_filter(source)
            if pf is None:
                return self.current_version()
            target = target.filter(pf)
        src_keys = source.select(*keys).distinct()
        # nothing matches → nothing to delete → commit-free no-op
        # (one limit-1 semi-join probe, vs a full rewrite)
        if target.join(src_keys, on=keys, how="left_semi").isEmpty():
            return self.current_version()
        kept = target.join(src_keys, on=keys, how="left_anti")
        return self._stage_and_commit(kept, replace_all=not scoped)

    def delete_where(self, condition: Column) -> int:
        """``DELETE FROM table WHERE ...`` parity: rewrite the table
        without the matching rows. A predicate on partition columns
        alone would allow a manifest-only commit; this general form
        rewrites data (like Delta's DELETE when files mix matching and
        non-matching rows).

        SQL DELETE removes only rows where the predicate is TRUE; a
        NULL predicate (e.g. a NULL column compared with ``==``) means
        "not matched, keep" — hence the ``coalesce(cond, false)`` before
        negating, where a bare ``filter(~cond)`` would silently delete
        the NULL-predicate rows too (ADVICE r05)."""
        return self._stage_and_commit(
            self.read().filter(~F.coalesce(condition, F.lit(False))),
            replace_all=True,
        )

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

        Partition-scoped when partition columns are part of the key AND
        no partition column is updated (an update moving a row across
        partitions must rewrite both sides — full rewrite handles it).
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
        scoped = (
            bool(self.partition_columns)
            and set(self.partition_columns) <= set(keys)
            and not (set(resolved) & set(self.partition_columns))
        )
        if scoped:
            pf = self._source_partition_filter(source)
            if pf is None:
                return self.current_version()
            target = target.filter(pf)
        # no matched target row → update-only merge is a commit-free
        # no-op (one limit-1 semi-join probe, vs a full rewrite)
        if target.join(
            source.select(*keys).distinct(), on=keys, how="left_semi"
        ).isEmpty():
            return self.current_version()
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
        return self._stage_and_commit(joined.select(*out_cols), replace_all=not scoped)
