"""Deterministic epoch shuffle — reproducibility, epoch variation,
shard balance, and the no-global-window plan guarantee."""

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext.shuffle import epoch_shuffle


def _docs(spark, n=500):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("n_chars")
    )


def test_same_epoch_is_reproducible(spark):
    df = _docs(spark)
    a = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(df, ["doc_id"], 3).collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(df, ["doc_id"], 3).collect()}
    assert a == b


def test_positions_are_a_permutation(spark):
    df = _docs(spark, 300)
    pos = [r["shuffle_pos"] for r in epoch_shuffle(df, ["doc_id"], 1).collect()]
    assert sorted(pos) == list(range(1, 301))


def test_different_epochs_differ(spark):
    df = _docs(spark)
    a = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(df, ["doc_id"], 1).collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(df, ["doc_id"], 2).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > len(a) * 0.9  # a real permutation change, not a tweak


def test_shuffle_breaks_input_order(spark):
    df = _docs(spark)
    out = epoch_shuffle(df, ["doc_id"], 5)
    same = (
        out.where(F.col("shuffle_pos") == F.col("doc_id") + 1).count()
    )
    assert same < 10  # ~n/n! fixed points expected; 10/500 is generous


def test_shards_balanced_and_round_robin(spark):
    df = _docs(spark, 1000)
    out = epoch_shuffle(df, ["doc_id"], 2, n_shards=8)
    sizes = {
        r["shard_id"]: r["n"]
        for r in out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # round-robin: shard = (pos-1) % n
    bad = out.where(
        F.col("shard_id") != (F.col("shuffle_pos") - 1) % 8
    ).count()
    assert bad == 0


def test_no_single_partition_exchange_in_plan(spark):
    """The scale guarantee: the plan must not contain the global
    window's SinglePartition exchange."""
    df = _docs(spark, 100)
    plan = epoch_shuffle(df, ["doc_id"], 1)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_epoch_shuffle_null_key_raises(spark):
    """VERDICT r09 item 4: a NULL key column must raise loudly, not
    silently collide digests (concat_ws skips NULLs)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from databricks_data_warehouse_spark.ext.shuffle import epoch_shuffle

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k long, s string"
    )
    # assign_row_ids runs a job eagerly, so the raise surfaces here
    with pytest.raises(Exception, match="NULL in key column"):
        epoch_shuffle(df, ["k", "s"], epoch=1).collect()
    # non-NULL keys still shuffle fine
    ok = epoch_shuffle(df.where(F.col("s").isNotNull()), ["k", "s"], epoch=1)
    assert sorted(r["shuffle_pos"] for r in ok.collect()) == [1, 2]
