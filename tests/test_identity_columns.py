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
