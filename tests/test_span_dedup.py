"""Span-level exact substring dedup (ext/span_dedup.py — Lee et al.
2022 ExactSubstr shape): hand-computed spans on a tiny corpus, merge
semantics, and the per-doc accounting invariants on real data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext import span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_spans(spark):
    # shared passage "a b c d" (k=4) at doc0[2..5] and doc1[0..3];
    # doc2 is clean
    docs = _docs(
        spark,
        [
            (0, "x y a b c d q r"),
            (1, "a b c d z w v u"),
            (2, "p q r s t u v w"),
        ],
    )
    got = [
        tuple(r)
        for r in span_dedup.dup_spans_df(docs, k=4).collect()
    ]
    assert got == [(0, 2, 5, 4), (1, 0, 3, 4)]


def test_overlapping_and_adjacent_occurrences_merge(spark):
    # "a b c d e" appears twice -> doc0 has overlapping duplicated
    # 3-grams [0..2],[1..3],[2..4] which must merge into ONE [0..4]
    docs = _docs(
        spark,
        [
            (0, "a b c d e x y z"),
            (1, "q a b c d e w t"),
        ],
    )
    got = [
        tuple(r) for r in span_dedup.dup_spans_df(docs, k=3).collect()
    ]
    assert got == [(0, 0, 4, 5), (1, 1, 5, 5)]


def test_two_separate_spans_stay_separate(spark):
    # two duplicated 3-gram passages with a 2-token unique gap between
    docs = _docs(
        spark,
        [
            (0, "a b c GAP0 GAP1 d e f"),
            (1, "a b c XX YY d e f"),
        ],
    )
    got = [
        tuple(r) for r in span_dedup.dup_spans_df(docs, k=3).collect()
    ]
    assert got == [
        (0, 0, 2, 3), (0, 5, 7, 3),
        (1, 0, 2, 3), (1, 5, 7, 3),
    ]


def test_same_doc_repetition_counts(spark):
    # a passage repeated WITHIN one doc is a duplicate too (corpus-wide
    # occurrence count >= 2)
    docs = _docs(spark, [(0, "a b c x x x a b c")])
    got = [
        tuple(r) for r in span_dedup.dup_spans_df(docs, k=3).collect()
    ]
    assert got == [(0, 0, 2, 3), (0, 6, 8, 3)]


def test_accounting_invariants_on_corpus(spark):
    sf = "/root/testdata/sf0.001"
    acc = span_dedup.dedup_substrings(spark, sf).collect()
    assert len(acc) == 500  # every doc has a row
    for r in acc:
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert r["kept_tokens"] == r["n_tokens"] - r["dup_tokens"]
        assert (r["n_spans"] == 0) == (r["dup_tokens"] == 0)
        # a span is at least k tokens by construction
        if r["n_spans"]:
            assert r["dup_tokens"] >= span_dedup.K
    # spans agree with the accounting
    spans = span_dedup.dup_spans(spark, sf)
    per_doc = {
        r["doc_id"]: (r["dup"], r["n"])
        for r in spans.groupBy("doc_id")
        .agg(
            F.sum("span_tokens").alias("dup"), F.count("*").alias("n")
        )
        .collect()
    }
    for r in acc:
        assert per_doc.get(r["doc_id"], (0, 0)) == (
            r["dup_tokens"], r["n_spans"]
        )
