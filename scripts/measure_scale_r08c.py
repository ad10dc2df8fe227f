"""Round-8 (continued) scale measurements: bloom index, partition-stat
pruning on scan, generated-column derivation, identity assignment —
each at the 10x corpus (/tmp/sf1x via scripts/make_10x.py).

Prints one JSON dict; numbers land in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_data_warehouse_spark.queries._util import load  # noqa: E402
from databricks_data_warehouse_spark.session import get_spark  # noqa: E402
from databricks_data_warehouse_spark.sources.tables import (  # noqa: E402
    ManagedTable,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
ROOT = "/tmp/r08c_scale"


def timed(fn, reps=3):
    best = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        best.append(time.time() - t0)
    best.sort()
    return round(best[len(best) // 2], 3)


def main() -> int:
    spark = get_spark(extra_conf={"spark.ui.enabled": "false"})
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    shutil.rmtree(ROOT, ignore_errors=True)
    out: dict = {"sf_dir": SF}

    # ---- bloom index: 1.5M orders, 64 scattered files ----------------
    orders = load(spark, SF, "orders")
    n_orders = orders.count()
    t = ManagedTable(spark, "bl", os.path.join(ROOT, "bl"))
    t.set_bloom_index("o_orderkey", fpp=0.01, ndv=32_768)
    t0 = time.time()
    t.overwrite(orders.repartition(64))
    out["bloom_write_64files_sec"] = round(time.time() - t0, 3)
    plain = ManagedTable(spark, "pl", os.path.join(ROOT, "pl"))
    plain.overwrite(orders.repartition(64))
    probe = [("o_orderkey", "in", [1, 5, 33, 1000, 4000])]
    out["bloom_rows"] = n_orders
    out["bloom_report"] = t.skipping_report(probe)
    out["plain_report"] = plain.skipping_report(probe)
    out["bloom_probe_sec"] = timed(lambda: t.scan(probe).count())
    out["plain_probe_sec"] = timed(lambda: plain.scan(probe).count())
    # sidecar footprint
    bdir = os.path.join(t.location, "_bloom")
    out["bloom_sidecar_bytes"] = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _d, fs in os.walk(bdir)
        for f in fs
    )

    # ---- generated-column day partitioning: 1M events ----------------
    from pyspark.sql.types import (
        DateType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("day", DateType()),
        ]
    )
    g = ManagedTable(
        spark, "gen", os.path.join(ROOT, "gen"),
        schema=schema, partition_columns=["day"],
    )
    g.set_generated_column("day", "CAST(ts AS DATE)")
    ev = load(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    t0 = time.time()
    g.overwrite(ev)
    out["gen_write_sec"] = round(time.time() - t0, 3)
    out["gen_rows"] = ev.count()
    import datetime as dt

    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12, 23, 59, 59)
    out["gen_report"] = g.skipping_report([("ts", "between", lo, hi)])
    out["gen_probe_sec"] = timed(
        lambda: g.scan([("ts", "between", lo, hi)]).count()
    )
    out["gen_full_read_sec"] = timed(
        lambda: g.read().filter(F.col("ts").between(lo, hi)).count()
    )

    # ---- identity assignment: 1.5M rows, two-phase vs global window --
    idt = ManagedTable(
        spark, "idt", os.path.join(ROOT, "idt"),
        schema=StructType(
            [
                StructField("o_orderkey", LongType()),
                StructField("o_custkey", LongType()),
                StructField("id", LongType()),
            ]
        ),
    )
    idt.set_identity_column("id")
    src = orders.select("o_orderkey", "o_custkey")
    t0 = time.time()
    idt.overwrite(src)
    out["identity_write_sec"] = round(time.time() - t0, 3)
    from pyspark.sql import Window

    out["naive_window_ids_sec"] = timed(
        lambda: src.withColumn(
            "id", F.row_number().over(Window.orderBy("o_orderkey"))
        ).agg(F.max("id")).collect(),
        reps=1,
    )
    from databricks_data_warehouse_spark.ext.rowid import assign_row_ids

    out["two_phase_ids_sec"] = timed(
        lambda: assign_row_ids(src, ["o_orderkey"])
        .agg(F.max("row_id")).collect(),
        reps=1,
    )

    print(json.dumps(out, indent=1, default=str))
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
