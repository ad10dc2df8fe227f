"""Incremental dedup vs a persisted band index (VERDICT r06 item 6):
the incremental answer must equal the full recompute over
existing ∪ batch, and index maintenance must be idempotent through
merge_insert_only."""

import os

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext.dedup import minhash_candidate_pairs
from databricks_data_warehouse_spark.ext.dedup_incremental import (
    band_index_rows,
    incremental_dedup_batch,
    update_band_index,
)
from databricks_data_warehouse_spark.sources.tables import ManagedTable


def _corpus(spark, tmp_path):
    """4 existing docs, 3 arriving: one exact dup of doc 1, one light
    paraphrase of doc 2, one novel."""
    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "spark structured streaming handles late data with watermarks"),
        (3, "completely different content about databases and storage"),
        (5, "yet another unrelated document speaking of nothing at all"),
    ]
    batch = [
        (100, "the quick brown fox jumps over the lazy dog again and again"),
        (101, "spark structured streaming handles late data with watermarks ok"),
        (102, "genuinely novel text that resembles no existing document here"),
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    mk(base + batch).write.parquet(os.path.join(sf, "documents.parquet"))
    return mk(base), mk(batch), sf


def test_incremental_equals_full_recompute(spark, tmp_path):
    existing, batch, sf = _corpus(spark, tmp_path)
    idx = band_index_rows(existing)
    res = {
        r.doc_id: r
        for r in incremental_dedup_batch(batch, idx, existing).collect()
    }
    assert set(res) == {100, 101, 102}
    assert res[100].is_dup and res[100].best_match == 1
    assert res[100].best_jaccard == 1.0
    assert not res[102].is_dup and res[102].best_match is None
    # the full recompute over the union: every (batch, existing)
    # verified pair must be reflected identically
    full = minhash_candidate_pairs(spark, sf)
    full_pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in full.collect()
        if (r.doc_b >= 100) != (r.doc_a >= 100)  # cross existing/batch
    }
    for did, r in res.items():
        expected = {
            (min(a, b), j)
            for (a, b), j in full_pairs.items()
            if max(a, b) == did
        }
        if r.is_dup:
            best = max(expected, key=lambda t: (t[1], -t[0]))
            assert (r.best_match, r.best_jaccard) == best
        else:
            assert not expected


def test_index_update_idempotent(spark, tmp_path):
    existing, batch, _ = _corpus(spark, tmp_path)
    t = ManagedTable(spark, "bidx", str(tmp_path / "bidx"))
    t.overwrite(band_index_rows(existing))
    n0 = t.read().count()
    update_band_index(t, batch)
    n1 = t.read().count()
    assert n1 > n0
    # replay: nothing inserted, decisions against the index unchanged
    update_band_index(t, batch)
    assert t.read().count() == n1
    res = incremental_dedup_batch(
        batch, t.read().where(F.col("doc_id") < 100), existing
    ).collect()
    assert {r.doc_id for r in res} == {100, 101, 102}
