"""Plan-quality audit: dump PushedFilters / ReadSchema / join strategies
for the headline queries so scan pruning and broadcast decisions are
reviewable without a Spark UI.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from databricks_data_warehouse_spark.session import get_spark

DEFAULT_QUERIES = (
    "tpch_q6_forecast_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "gold_orders_by_city",
    "gold_customer_status_by_city",
    "dash_avg_delivery_by_nation",
    "dedup_ngram_jaccard",
    "tpch_q8_market_share",
    "tpch_q18_large_volume_customers",
    "text_decontaminate",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="explain-audit", extra_conf={"spark.ui.enabled": "false"})
    qs = entry_mod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(mode)
        print(f"\n===== {name}")
        for line in plan.splitlines():
            ls = line.strip()
            if ls.startswith(("PushedFilters", "ReadSchema", "PartitionFilters")):
                print("  ", ls[:200])
            for marker in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                           "BroadcastNestedLoopJoin", "HashAggregate", "WindowExec",
                           "TakeOrderedAndProject"):
                if marker in ls and ls.startswith(("+", ":", "*")):
                    print("   PLAN:", ls.split("(", 1)[0].strip()[:100])
                    break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
