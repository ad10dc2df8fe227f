"""End-of-round certification: time every oracle_sql() in ONE warm
DuckDB process (3-rep medians) and compare the total against the Spark
side recorded by bench.py (bench_detail.json) — the builder's replica
of the judge's bench-vs-baseline ratio.

Usage: python scripts/certify.py [sf_dir] [bench_detail.json]
Prints one JSON line: {"spark_total": s, "duckdb_total": s,
"ratio": spark/duckdb, "n_shared": N, "worst": [...]}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    detail = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"
    with open(detail) as f:
        spark_q = json.load(f)["queries"]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    shared = sorted(set(oracles) & set(spark_q))
    times: dict[str, float] = {}
    for name in shared:
        reps = []
        for _ in range(3):
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            reps.append(time.time() - t0)
        times[name] = statistics.median(reps)
        print(f"{name:40s} duck={times[name]:7.3f}  spark={spark_q[name]:7.3f}",
              file=sys.stderr)
    spark_total = sum(spark_q[n] for n in shared)
    duck_total = sum(times.values())
    worst = sorted(
        ((n, round(spark_q[n] / max(times[n], 1e-3), 1)) for n in shared),
        key=lambda kv: -kv[1],
    )[:8]
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_shared": len(shared),
        "spark_total": round(spark_total, 1),
        "duckdb_total": round(duck_total, 1),
        "ratio": round(spark_total / duck_total, 3),
        "worst_spark_vs_duck": worst,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
