"""Identity columns (Delta `GENERATED ALWAYS AS IDENTITY`): fresh,
never-reused ids on every ingest, assigned with the scalable two-phase
shape (per-partition counts + offsets — no global window), with the
high watermark advancing atomically with the consuming commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from databricks_data_warehouse_spark.sources.sql_dml import SqlSession
from databricks_data_warehouse_spark.sources.tables import (
    ConcurrentWriteError,
    ManagedTable,
)

_SCHEMA = StructType(
    [
        StructField("rid", LongType()),
        StructField("name", StringType()),
        StructField("id", LongType()),
    ]
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    ).repartition(4)


@pytest.fixture()
def table(spark, tmp_path):
    t = ManagedTable(spark, "ident", str(tmp_path / "ident"), schema=_SCHEMA)
    t.set_identity_column("id", start=1, step=1)
    return t


def test_ids_unique_contiguous_per_commit(spark, table):
    table.overwrite(_batch(spark, 0, 500))
    got = table.read()
    agg = got.agg(
        F.min("id"), F.max("id"), F.countDistinct("id"), F.count("*")
    ).collect()[0]
    assert tuple(agg) == (1, 500, 500, 500)


def test_ids_never_reused_across_appends(spark, table):
    table.overwrite(_batch(spark, 0, 300))
    table.append(_batch(spark, 300, 500))
    got = table.read()
    agg = got.agg(
        F.min("id"), F.max("id"), F.countDistinct("id"), F.count("*")
    ).collect()[0]
    assert tuple(agg) == (1, 500, 500, 500)


def test_start_and_step(spark, tmp_path):
    t = ManagedTable(spark, "id2", str(tmp_path / "id2"), schema=_SCHEMA)
    t.set_identity_column("id", start=1000, step=10)
    t.overwrite(_batch(spark, 0, 50))
    ids = sorted(r.id for r in t.read().select("id").collect())
    assert ids == list(range(1000, 1500, 10))
    t.append(_batch(spark, 50, 60))
    assert t.read().agg(F.max("id")).collect()[0][0] == 1000 + 10 * 59


def test_supplying_the_column_is_rejected(spark, table):
    table.overwrite(_batch(spark, 0, 10))
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        table.append(
            _batch(spark, 10, 20).withColumn("id", F.lit(999))
        )


def test_stale_watermark_fails_claim_and_retry_mints_fresh(spark, table):
    table.overwrite(_batch(spark, 0, 100))
    # writer A mints ids against the current watermark…
    df_a, claim_a = table._assign_identity(_batch(spark, 100, 150))
    # …writer B lands first through a separate handle
    other = ManagedTable(
        spark, "ident", table.location, schema=_SCHEMA
    )
    other.append(_batch(spark, 500, 550))
    # A's commit must now fail the claim check (its ids would collide)
    with pytest.raises(ConcurrentWriteError, match="watermark moved"):
        table._stage_and_commit(
            df_a.select("rid", "name", "id"),
            replace_all=False,
            append_only=True,
            identity_claim=claim_a,
        )
    # the public retry path re-reads the watermark and succeeds
    table.append(_batch(spark, 100, 150))
    got = table.read()
    agg = got.agg(F.countDistinct("id"), F.count("*")).collect()[0]
    assert tuple(agg) == (200, 200)


def test_restore_keeps_watermark_monotonic(spark, table):
    table.overwrite(_batch(spark, 0, 100))
    v1 = table.current_version()
    table.append(_batch(spark, 100, 200))
    table.restore(v1)  # rolls data back to 100 rows…
    table.append(_batch(spark, 200, 250))
    ids = [r.id for r in table.read().select("id").collect()]
    # …but ids 101-200 are never re-minted
    assert len(ids) == len(set(ids)) == 150
    assert min(i for i in ids if i > 100) > 200


def test_sql_create_identity_and_insert(spark, tmp_path):
    s = SqlSession(spark, base_location=str(tmp_path))
    s.sql(
        "CREATE TABLE users (uid BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 100 INCREMENT BY 5), name STRING)"
    )
    t = s.table("users")
    assert t.identity == {"uid": {"start": 100, "step": 5, "next": 100}}
    s.sql("INSERT INTO users VALUES ('ada'), ('bob'), ('eve')")
    rows = sorted(
        (r.uid, r.name) for r in s.sql("SELECT * FROM users").collect()
    )
    assert [u for u, _n in rows] == [100, 105, 110]
    assert sorted(n for _u, n in rows) == ["ada", "bob", "eve"]


def test_merge_upsert_keeps_matched_ids_and_mints_for_inserts(spark, tmp_path):
    t = ManagedTable(spark, "mui", str(tmp_path / "mui"), schema=_SCHEMA)
    t.set_identity_column("id", start=1)
    t.overwrite(_batch(spark, 0, 100))
    before = {
        r.rid: r.id for r in t.read().select("rid", "id").collect()
    }
    # upsert: 50 existing keys updated + 20 new keys inserted
    src = spark.range(50, 120).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("updated"), F.col("id")).alias("name"),
    )
    t.merge_upsert(src, key_columns=["rid"])
    after = {r.rid: r for r in t.read().collect()}
    assert len(after) == 120
    # matched keys kept their ids (stable id per key through the upsert)
    for rid in range(50, 100):
        assert after[rid].id == before[rid]
        assert after[rid].name == f"updated{rid}"
    # untouched rows unchanged; inserted keys got fresh, unique ids
    for rid in range(0, 50):
        assert after[rid].id == before[rid]
    new_ids = {after[rid].id for rid in range(100, 120)}
    assert len(new_ids) == 20
    assert min(new_ids) > max(before.values())
    all_ids = [r.id for r in after.values()]
    assert len(all_ids) == len(set(all_ids))
    # replay of the same upsert is stable: no ids minted for matches
    hwm = t._read_identity(t.current_version())["id"]["next"]
    t.merge_upsert(src, key_columns=["rid"])
    after2 = {r.rid: r.id for r in t.read().collect()}
    assert after2 == {rid: r.id for rid, r in after.items()}


def test_merge_partial_identity_supply_rejected(spark, tmp_path):
    schema = StructType(
        [
            StructField("rid", LongType()),
            StructField("name", StringType()),
            StructField("id", LongType()),
            StructField("id2", LongType()),
        ]
    )
    t = ManagedTable(spark, "mpi", str(tmp_path / "mpi"), schema=schema)
    t.set_identity_column("id")
    t.set_identity_column("id2", start=1000)
    t.overwrite(_batch(spark, 0, 10))
    src = _batch(spark, 10, 20).withColumn("id", F.lit(5))
    with pytest.raises(ValueError, match="ALL identity columns"):
        t.merge_upsert(src, key_columns=["rid"])


def test_update_where_rejects_identity_assignment(spark, tmp_path):
    """Round 14: UPDATE must not assign a GENERATED ALWAYS identity
    column (Delta refuses — an assignment breaks the never-reused id
    contract)."""
    t = ManagedTable(spark, "idg1", str(tmp_path / "idg1"))
    t.set_identity_column("id")
    t.create_if_not_exists(
        spark.createDataFrame([], "id long, k long").schema
    )
    t.append(spark.createDataFrame([(1,), (2,)], "k long"))
    with pytest.raises(ValueError, match="IDENTITY"):
        t.update_where({"id": "99"}, F.col("k") == 1)
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_merge_update_rejects_identity_assignment(spark, tmp_path):
    """Same contract for update-matched-only merges, including the
    implicit set_map=None resolution when the source carries the
    identity column."""
    t = ManagedTable(spark, "idg2", str(tmp_path / "idg2"))
    t.set_identity_column("id")
    t.create_if_not_exists(
        spark.createDataFrame([], "id long, k long, v long").schema
    )
    t.append(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    src = spark.createDataFrame([(1, 5, 11)], "k long, id long, v long")
    with pytest.raises(ValueError, match="IDENTITY"):
        t.merge_update(src, ["k"], {"id": "id", "v": "v"})
    with pytest.raises(ValueError, match="IDENTITY"):
        t.merge_update(src, ["k"])  # implicit resolution hits id too
    assert {r.k: (r.id, r.v) for r in t.read().collect()} == {
        1: (1, 10),
        2: (2, 20),
    }
