"""Measure the merge-on-read delete/update paths vs copy-on-write, the
incremental change feed vs the full diff, and reorg — the SCALE.md
numbers for the deletion-vector subsystem.

Usage: python scripts/measure_dv.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.queries._util import load
from databricks_data_warehouse_spark.session import get_spark
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:55s} {dt:8.2f} s")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="measure-dv",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    root = tempfile.mkdtemp(prefix="dv_measure_")
    try:
        orders = load(spark, sf_dir, "orders")
        n = orders.count()
        print(f"orders rows: {n}  ({sf_dir})")

        def mk(name):
            tb = ManagedTable(spark, name, os.path.join(root, name))
            tb.overwrite(orders.repartitionByRange(16, "o_orderkey"))
            return tb

        a = t("land (16 range files)", lambda: mk("a"))
        b = mk("b")
        c = mk("c")
        # selective delete: 100 keys spread across the range
        keys = [r.o_orderkey for r in orders.limit(100).collect()]
        cond = F.col("o_orderkey").isin(keys)
        t("delete_where 100 rows, DV (merge-on-read)", lambda: a.delete_where(cond))
        t(
            "delete_where 100 rows, copy-on-write",
            lambda: b.delete_where(cond, deletion_vectors=False),
        )
        t(
            "changes() after DV delete (incremental)",
            lambda: a.changes(0).count(),
        )
        assert a.last_changes_strategy == "incremental"
        t(
            "changes() after CoW delete (full diff)",
            lambda: b.changes(0).count(),
        )
        assert b.last_changes_strategy == "diff"
        t(
            "update_where 100 rows, DV (vector + append, one commit)",
            lambda: c.update_where(
                {"o_totalprice": "o_totalprice + 10"}, cond
            ),
        )
        t("read() over DV snapshot (anti-join applied)", lambda: a.read().count())
        t("read() clean snapshot (no DV)", lambda: b.read().count())
        t("reorg (purge the touched dirs only)", lambda: a.reorg())
        t("read() after reorg", lambda: a.read().count())
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
