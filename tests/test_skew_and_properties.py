"""Salted-join equivalence + property-based checks over the pure-Python
merge helpers and the cleansing chain's fixed-point behavior."""

from __future__ import annotations
import pytest

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.functions.cleaning import clean_string_in_df
from databricks_data_warehouse_spark.functions.merge_helpers import (
    build_insert_columns_dict,
    condition_builder,
)
from databricks_data_warehouse_spark.functions.skew import salted_join

_ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu"), whitelist_characters="_"),
    min_size=1,
    max_size=12,
)


@given(st.lists(_ident, min_size=1, max_size=8, unique=True))
@settings(max_examples=50, deadline=None)
def test_condition_builder_properties(columns):
    cond = condition_builder(columns, "t", "s")
    non_ingestion = [c for c in columns if "ingestion_time" not in c]
    # one equality conjunct per non-ingestion-time column, ANDed
    assert cond.count(" AND ") == max(len(non_ingestion) - 1, 0)
    for c in non_ingestion:
        assert f"t.{c} = s.{c}" in cond
    for c in columns:
        if "ingestion_time" in c:
            assert f"t.{c}" not in cond


@given(st.lists(_ident, min_size=1, max_size=8, unique=True))
@settings(max_examples=50, deadline=None)
def test_insert_dict_covers_all_columns(columns):
    d = build_insert_columns_dict(columns, "u")
    assert set(d) == set(columns)
    assert all(v == f"u.{k}" for k, v in d.items())


def test_clean_string_is_idempotent_on_nasty_corpus(spark):
    """Cleansing a cleansed string is a no-op (fixed point) — the
    property that makes DLQ re-cleansing safe to re-run."""
    corpus = [
        "  test #   1231phrase 1/2   /",
        "\t\ttabs\tand   spaces\t",
        "MIXED case WORDS",
        "symbols !@#$%^&*()",
        "",
        "a",
        "multi  word   phrase here",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "id long, s string")
    once = clean_string_in_df(df, "s", new_column="c1")
    twice = clean_string_in_df(once, "c1", new_column="c2")
    mismatches = twice.filter(F.col("c1") != F.col("c2")).count()
    assert mismatches == 0


def test_salted_join_equals_plain_join(spark):
    # skewed: one hot key with 500 rows, long tail of singletons
    rows = [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 40)]
    skewed = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 40)], "k long, name string"
    )
    plain = skewed.join(small, on="k").select("k", "payload", "name")
    salted = salted_join(skewed, small, on=["k"]).select("k", "payload", "name")
    assert plain.count() == salted.count() == 538
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # id
            st.sampled_from(["a", "b", "c"]),          # name
            st.sampled_from([2023, 2024]),             # year
            st.integers(min_value=1, max_value=3),     # month
        ),
        min_size=0,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from([2023, 2024]),
            st.integers(min_value=1, max_value=3),
        ),
        min_size=0,
        max_size=12,
    ),
)
@settings(max_examples=10, deadline=None)
@pytest.mark.slow
def test_merge_insert_only_is_idempotent_union(spark, tmp_path_factory, batch1, batch2):
    """Property (random batches): merge_insert_only twice == once, and
    the table contents equal the DISTINCT union of all merged batches
    (the reference's all-column-match semantics, S5)."""
    from databricks_data_warehouse_spark.sources.tables import ManagedTable

    base = tmp_path_factory.mktemp("prop")
    schema = "id long, name string, year int, month int"
    t = ManagedTable(
        spark, "p", str(base / "p"),
        schema=spark.createDataFrame([], schema).schema,
        partition_columns=["year", "month"],
    ).create_if_not_exists()
    df1 = spark.createDataFrame(batch1, schema)
    df2 = spark.createDataFrame(batch2, schema)
    t.merge_insert_only(df1)
    t.merge_insert_only(df1)  # idempotent re-run
    t.merge_insert_only(df2)
    expected = {tuple(r) for r in df1.unionByName(df2).distinct().collect()}
    got = {tuple(r) for r in t.read().collect()}
    assert got == expected
