"""Property test: sources/_xxh64.py must be BIT-IDENTICAL to Spark's
``xxhash64`` for every type the bloom index hashes — including the
two-argument fold ``xxhash64(col, lit(i))`` the bloom positions use."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

from databricks_data_warehouse_spark.sources._xxh64 import (
    SEED,
    hash_bytes,
    hash_int,
    hash_long,
    hash_value,
    signed,
)

random.seed(1234)


def _spark_hashes(spark, dtype, values, extra_seed=None):
    schema = StructType([StructField("v", dtype)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    col = (
        F.xxhash64(F.col("v"))
        if extra_seed is None
        else F.xxhash64(F.col("v"), F.lit(extra_seed))
    )
    return [r.h for r in df.select(col.alias("h")).collect()]


def _ours(values, simple_type, extra_seed=None):
    out = []
    for v in values:
        h = hash_value(v, simple_type, SEED)
        if extra_seed is not None:
            h = hash_int(extra_seed, h)
        out.append(signed(h))
    return out


def test_longs_match_spark(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 42] + [
        random.randint(-(2**63), 2**63 - 1) for _ in range(50)
    ]
    assert _spark_hashes(spark, LongType(), vals) == _ours(vals, "bigint")


def test_ints_shorts_bytes_match_spark(spark):
    ints = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        random.randint(-(2**31), 2**31 - 1) for _ in range(30)
    ]
    assert _spark_hashes(spark, IntegerType(), ints) == _ours(ints, "int")
    shorts = [0, -5, 32767, -32768] + [
        random.randint(-(2**15), 2**15 - 1) for _ in range(20)
    ]
    assert _spark_hashes(spark, ShortType(), shorts) == _ours(
        shorts, "smallint"
    )
    tiny = [0, 1, -1, 127, -128]
    assert _spark_hashes(spark, ByteType(), tiny) == _ours(tiny, "tinyint")


def test_strings_match_spark(spark):
    vals = ["", "a", "ab", "abc", "abcd", "hello world", "x" * 7,
            "y" * 8, "z" * 31, "w" * 32, "v" * 33, "long" * 50,
            "ünïcode-Ω≈ç√", "emoji 🙂 tail"] + [
        "".join(random.choice("abcdefgh0123 _-") for _ in
                range(random.randint(0, 100)))
        for _ in range(40)
    ]
    assert _spark_hashes(spark, StringType(), vals) == _ours(vals, "string")


def test_dates_match_spark(spark):
    vals = [
        datetime.date(1970, 1, 1),
        datetime.date(1969, 12, 31),
        datetime.date(2024, 2, 29),
        datetime.date(2100, 1, 1),
    ] + [
        datetime.date(1970, 1, 1) + datetime.timedelta(
            days=random.randint(-30000, 30000)
        )
        for _ in range(20)
    ]
    assert _spark_hashes(spark, DateType(), vals) == _ours(vals, "date")


def test_two_arg_fold_matches_spark(spark):
    """The exact shape bloom positions use: xxhash64(col, lit(i))."""
    vals = [random.randint(-(2**63), 2**63 - 1) for _ in range(20)]
    for i in (0, 1, 6):
        assert _spark_hashes(spark, LongType(), vals, extra_seed=i) == \
            _ours(vals, "bigint", extra_seed=i)
    svals = ["", "abc", "hello world", "x" * 40]
    for i in (0, 3):
        assert _spark_hashes(spark, StringType(), svals, extra_seed=i) == \
            _ours(svals, "string", extra_seed=i)


def test_null_passes_seed_through(spark):
    got = _spark_hashes(spark, LongType(), [None])
    assert got == [signed(hash_value(None, "bigint", SEED))] == [42]
