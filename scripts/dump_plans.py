"""Dump `.explain("formatted")` for every declared query to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence the
judge checks plan claims against (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes — before and after each change).

Usage: python scripts/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]
e.g.   python scripts/dump_plans.py plans/r15 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from databricks_data_warehouse_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 3:  # ADVICE r15: usage, not IndexError
        print(__doc__.strip(), file=sys.stderr)
        return 2
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or list(entry_mod.queries())
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="dump-plans", extra_conf={"spark.ui.enabled": "false"}
    )
    qs = entry_mod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    bad = 0
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception:
            plan = "PLAN FAILED:\n" + traceback.format_exc()
            bad += 1
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars")
    print(f"done: {len(names)} plans, {bad} failed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
