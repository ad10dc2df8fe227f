"""Round-8 scale measurements for the two VERDICT r07 perf-weak
operators, on the grown-corpus fixture (make_10x_corpus.py: documents
and embeddings genuinely 10x, not dimension-sized).

1. semantic_dedup: auto centroids (max(16, ceil(n/64))) vs the old
   fixed 16 at 10x the embeddings — the per-block pair stage must stay
   bounded (auto) instead of quadratic (fixed).
2. incremental_dedup_batch: CONSTANT batch against a 1x vs 10x corpus
   + persisted index — per-batch wall time must stay ~flat now that
   the index window and the corpus shingling are semi-joined down to
   batch-touched rows first.

Usage: python scripts/measure_scale_r08.py [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from databricks_data_warehouse_spark.ext import similarity as sim  # noqa: E402
from databricks_data_warehouse_spark.ext.dedup_incremental import (  # noqa: E402
    band_index_rows,
    incremental_dedup_batch,
)
from databricks_data_warehouse_spark.queries._util import load  # noqa: E402
from databricks_data_warehouse_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
GROWN = "/tmp/sf1x_corpus"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def timed(fn, *args, **kw):
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        n = fn(*args, **kw).count()
        ts.append(time.time() - t0)
    return median(ts), n


def main() -> int:
    spark = get_spark(
        app_name="scale_r08",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )

    # ---- 1. semantic dedup: auto vs fixed-16 centroids at 10x corpus
    t_1x, n_1x = timed(sim.semantic_dedup, spark, SF01)
    k_1x = sim._auto_centroids(spark, SF01)
    t_10x_auto, n_10x = timed(sim.semantic_dedup, spark, GROWN)
    k_10x = sim._auto_centroids(spark, GROWN)
    t_10x_fixed, _ = timed(sim.semantic_dedup, spark, GROWN, n_centroids=16)
    print(
        f"semantic_dedup 1x ({k_1x} centroids): {t_1x:.2f}s ({n_1x} rows); "
        f"10x auto ({k_10x} centroids): {t_10x_auto:.2f}s ({n_10x} rows); "
        f"10x FIXED 16: {t_10x_fixed:.2f}s"
    )

    # ---- 2. incremental dedup: constant batch, 1x vs 10x corpus/index
    batch = (
        load(spark, SF01, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 4 == 0)
    )

    def run(corpus_dir):
        corpus = load(spark, corpus_dir, "documents").select("doc_id", "text")
        existing = corpus.join(
            batch.select("doc_id"), "doc_id", "left_anti"
        )
        index = band_index_rows(existing).localCheckpoint()  # build OFF the clock
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            incremental_dedup_batch(batch, index, existing).count()
            ts.append(time.time() - t0)
        return median(ts)

    t_inc_1x = run(SF01)
    t_inc_10x = run(GROWN)
    print(
        f"incremental_dedup constant batch ({batch.count()} docs): "
        f"1x corpus {t_inc_1x:.2f}s; 10x corpus {t_inc_10x:.2f}s "
        f"(ratio {t_inc_10x / t_inc_1x:.2f}x)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
