"""Repeated-measure timing for selected queries() entries.

Usage: python scripts/time_queries.py [--sf SF_DIR] [--reps N] query [query ...]

Prints per-query sorted rep times and the median — the n>=3 measurement
VERDICT r03 asked for before trusting any single-run regression.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from databricks_data_warehouse_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(
        app_name="time-queries",
        master=f"local[{args.cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.read.parquet(os.path.join(args.sf, "nation.parquet")).count()

    qs = entry_mod.queries()
    out = {}
    for name in args.queries:
        fn = qs[name]
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = {"reps": sorted(reps), "median": round(statistics.median(reps), 3)}
        print(f"{name:35s} median={out[name]['median']:7.3f}  reps={sorted(reps)}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
