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


def _dtype_class(s: "pd.Series") -> str:
    """Collapse a pandas dtype into the class the driver's value-hash
    is sensitive to.  Calibrated against driver history: the r08
    `join_skew_salted` red was DuckDB SUM(int)→HUGEINT→float64 (via
    fetchdf) vs Spark int64 — values identical, hash divergent — while
    decimal(22,1)→float64 vs Spark double (`agg_value_histogram`) and
    tz-aware vs naive timestamps (every stream_* entry) hash GREEN.
    So: int vs float is the defect class; widths/tz are not.  The old
    str/float normalize() erased the int-vs-float difference, so the
    local gate said "0 bad" on an entry the driver hashed red
    (VERDICT r08 item 2)."""
    import pandas.api.types as pt

    dt = s.dtype
    if pt.is_bool_dtype(dt):
        return "bool"
    if pt.is_integer_dtype(dt):
        return "int"
    if pt.is_float_dtype(dt):
        return "float"
    if pt.is_datetime64_any_dtype(dt):
        return "datetime"
    if pt.is_timedelta64_dtype(dt):
        return "timedelta"
    if dt == object:
        v = s.dropna()
        if len(v):
            x = v.iloc[0]
            import datetime
            import decimal

            if isinstance(x, bool):
                return "bool"
            if isinstance(x, decimal.Decimal):
                # fetchdf only leaves Decimal objects for widths pandas
                # can't hold — the driver side sees these as numbers
                return "int" if x == x.to_integral_value() else "float"
            if isinstance(x, int):
                return "int"
            if isinstance(x, float):
                return "float"
            if isinstance(x, (datetime.datetime, datetime.date)):
                return "datetime"
            if isinstance(x, str):
                return "string"
            if isinstance(x, (list, tuple)):
                return "list"
            if isinstance(x, (bytes, bytearray)):
                return "binary"
        return "object"
    return str(dt)


def compare_types(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> str:
    """Column-by-column dtype-class comparison (the driver's hash
    sensitivity), run only after values already matched."""
    bad = []
    for name in sorted(set(spark_pd.columns) & set(duck_pd.columns)):
        cs = _dtype_class(spark_pd[name])
        cd = _dtype_class(duck_pd[name])
        if cs != cd:
            bad.append(
                f"{name}: spark={spark_pd[name].dtype}({cs}) "
                f"vs duck={duck_pd[name].dtype}({cd})"
            )
    return "; ".join(bad)


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
        if verdict == "OK":
            type_bad = compare_types(spark_pd, duck_pd)
            if type_bad:
                verdict = f"TYPE {type_bad}"
        print(f"{name:35s} {verdict}  ({len(spark_pd)} rows)")
        if verdict != "OK":
            n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rows_only} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
