"""Regression tests for the round-8 VERDICT defects.

1. ``join_skew_salted_oracle`` must CAST its SUM to BIGINT — DuckDB's
   SUM(int) returns HUGEINT (arrow decimal128) while Spark returns
   int64; the driver's type-sensitive value-hash diverges even when
   every value matches (the single r08 red).
2. ``scripts/check_oracle.py`` must catch that class of bug locally:
   its old str/float normalize() erased the int-vs-decimal difference,
   reporting "0 bad" on an entry the driver hashed red.  The type gate
   (``compare_types``) compares arrow type-classes field by field.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa


# --------------------------------------------- 1: the oracle itself
def test_skew_oracle_sum_is_bigint():
    from databricks_data_warehouse_spark.ext.skew import join_skew_salted_oracle

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    tbl = con.execute(join_skew_salted_oracle()).arrow()
    typ = tbl.schema.field("n_below").type
    assert pa.types.is_integer(typ), f"n_below must be integer, got {typ}"
    # total comes from COUNT(*) (already BIGINT in DuckDB)
    assert pa.types.is_integer(tbl.schema.field("total").type)


def test_every_oracle_sum_is_cast(monkeypatch):
    """No SUM( in any oracle without a CAST wrapping it or ROUND on a
    float aggregate.  Heuristic guard: an oracle line with a bare
    integer ``SUM(`` aliased straight to a column is the bug class;
    we assert at minimum the skew oracle carries the cast."""
    from databricks_data_warehouse_spark.ext.skew import join_skew_salted_oracle

    sql = join_skew_salted_oracle().upper()
    assert "CAST(SUM(" in sql.replace(" ", "").replace("\n", "") or (
        "CAST(SUM" in sql
    )


# --------------------------------------------- 2: the local type gate
def test_compare_types_catches_decimal_vs_int():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import numpy as np
    import pandas as pd

    spark_pd = pd.DataFrame({"n": np.array([1, 2], dtype="int64")})
    # the HUGEINT shape: DuckDB SUM(int) comes out of fetchdf as float64
    duck_pd = pd.DataFrame({"n": np.array([1.0, 2.0], dtype="float64")})
    bad = mod.compare_types(spark_pd, duck_pd)
    assert "float" in bad and "n" in bad

    # width difference is not a class difference
    ok = mod.compare_types(
        spark_pd, pd.DataFrame({"n": np.array([1, 2], dtype="int32")})
    )
    assert ok == ""

    # tz-aware vs naive timestamps: both "datetime" (driver-green shape)
    ok2 = mod.compare_types(
        pd.DataFrame({"t": pd.to_datetime(["2024-01-01"]).tz_localize("UTC")}),
        pd.DataFrame({"t": pd.to_datetime(["2024-01-01"])}),
    )
    assert ok2 == ""
