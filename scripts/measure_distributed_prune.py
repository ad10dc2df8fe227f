"""Measure distributed prune vs the driver loop on a 10k-file table
(VERDICT r06 item 2's 'Done' measurement for SCALE.md).

Builds a synthetic ManagedTable whose manifest indexes 10 000 files
(tiny files — the cost under test is metadata/planning, not data I/O),
checkpoints it, then times:
  - the per-file Python loop (_prune, driver mode)
  - the Spark job over the stats checkpoint (_prune_distributed)
and asserts decision parity.

Usage: python scripts/measure_distributed_prune.py [n_files]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.session import get_spark
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark(
        app_name="prune-bench",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="prune10k")
    t = ManagedTable(spark, "big", os.path.join(root, "big"))
    # n_files disjoint id-ranges -> file-level bounds prune cleanly
    df = spark.range(0, n_files * 10).select(
        F.col("id"), (F.col("id") % 97).alias("a")
    )
    build0 = time.perf_counter()
    t.overwrite(df.repartitionByRange(n_files, "id"))
    build1 = time.perf_counter()
    t.checkpoint()
    build2 = time.perf_counter()
    print(
        f"build {build1 - build0:.1f} s for {n_files} files; "
        f"checkpoint {build2 - build1:.1f} s"
    )

    probe = [("id", "between", 12_345, 12_360)]
    drv = ManagedTable(spark, "big", t.location,
                       distributed_prune_threshold=10**9)
    dist = ManagedTable(spark, "big", t.location,
                        distributed_prune_threshold=0)

    def rep(fn, n=5):
        ts = []
        for _ in range(n):
            s = time.perf_counter()
            r = fn()
            ts.append(time.perf_counter() - s)
        return r, statistics.median(ts)

    a, t_drv = rep(lambda: drv._prune(probe, None))
    b, t_dist = rep(lambda: dist._prune(probe, None))
    assert sorted(a[0]) == sorted(b[0]) and a[1:] == b[1:], "parity violated"
    print(
        f"files_total={a[2]} kept={len(a[0])} | driver loop "
        f"{t_drv*1000:.0f} ms (incl. manifest JSON parse) vs distributed "
        f"{t_dist*1000:.0f} ms (checkpoint scan, no per-file driver work)"
    )
    # the manifest-parse share of the driver number, for context
    s = time.perf_counter()
    drv._read_stats(drv.current_version())
    parse = time.perf_counter() - s
    print(f"manifest stats JSON parse alone: {parse*1000:.0f} ms")
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
