"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from databricks_data_warehouse_spark.session import get_spark

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> str:
    if len(spark_pd) != len(duck_pd):
        return f"ROWS {len(spark_pd)} vs {len(duck_pd)}"
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return f"COLS {sorted(spark_pd.columns)} vs {sorted(duck_pd.columns)}"
    a, b = normalize(spark_pd), normalize(duck_pd)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = both_nan | (av == bv)
            if not eq.all():
                i = int(np.argmin(eq))
                return f"VAL col={c} row={i}: {av[i]!r} vs {bv[i]!r} (maxdiff={np.nanmax(np.abs(av - bv))})"
        else:
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not np.asarray(eq).all():
                i = int(np.argmin(np.asarray(eq)))
                return f"VAL col={c} row={i}: {av[i]!r} vs {bv[i]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} SPARK-ERROR {type(e).__name__}: {str(e)[:160]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name:35s} rows-only ({len(spark_pd)} rows)")
            n_rows_only += 1
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} DUCK-ERROR {type(e).__name__}: {str(e)[:160]}")
            n_bad += 1
            continue
        verdict = compare(name, spark_pd, duck_pd)
        print(f"{name:35s} {verdict}  ({len(spark_pd)} rows)")
        if verdict != "OK":
            n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rows_only} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
