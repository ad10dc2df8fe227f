"""Mini-BPE trainer/encoder (VERDICT r06 item 7). No SQL oracle exists
for iterative BPE, so these properties ARE the exactness contract:
hand-computed merges on a known corpus, driver ≡ distributed training,
determinism, monotonicity in num_merges, and whitespace upper bounds —
plus the budgeting/packing integration the counts exist for."""

import pytest

import os

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext.bpe import (
    _merge_word,
    bpe_token_counts,
    text_token_counts_bpe,
    train_bpe,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merge_word_single_pass_semantics():
    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert _merge_word(["ab", "c"], "ab", "c") == ["abc"]
    assert _merge_word(list("xyz"), "a", "b") == ["x", "y", "z"]


def test_hand_computed_merges(spark):
    # corpus: "aaab" x3, "ab" x2 → pair counts round 0:
    # (a,a): 2*3=6, (a,b): 3+2=5 → merge (a,a) first;
    # round 1: words aa,a,b x3 / a,b x2 → (a,b): 5 → merge (a,b)
    docs = _docs(spark, [(1, "aaab aaab aaab"), (2, "ab ab")])
    m = [(r.rank, r.left, r.right)
         for r in train_bpe(docs, num_merges=2).collect()]
    assert sorted(m) == [(0, "a", "a"), (1, "a", "b")]
    counts = {r.doc_id: r.n_tokens
              for r in bpe_token_counts(docs, m).collect()}
    # "aaab" -> [aa, ab] = 2 tokens x3 words; "ab" -> [ab] x2
    assert counts == {1: 6, 2: 2}


def test_driver_and_distributed_trainers_identical(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox the quick fox"),
            (2, "pack my box with five dozen jugs"),
            (3, "the the the quick quick brown"),
        ],
    )
    a = sorted(
        (r.rank, r.left, r.right)
        for r in train_bpe(docs, num_merges=12, distributed=False).collect()
    )
    b = sorted(
        (r.rank, r.left, r.right)
        for r in train_bpe(docs, num_merges=12, distributed=True).collect()
    )
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_determinism_and_monotonicity(spark):
    docs = _docs(
        spark,
        [(i, f"alpha beta gamma delta epsilon tok{i % 3} alpha beta")
         for i in range(20)],
    )
    m1 = sorted(tuple(r) for r in train_bpe(docs, num_merges=16).collect())
    m2 = sorted(tuple(r) for r in train_bpe(docs, num_merges=16).collect())
    assert m1 == m2  # retraining is bit-identical
    # more merges can only shrink every document's count
    prev = None
    for k in (0, 4, 16):
        m = [(r.rank, r.left, r.right)
             for r in train_bpe(docs, num_merges=k).collect()]
        counts = {r.doc_id: r.n_tokens
                  for r in bpe_token_counts(docs, m).collect()}
        if prev is not None:
            assert all(counts[d] <= prev[d] for d in counts)
        prev = counts
    # zero merges == character count of the words
    m0 = []
    c0 = {r.doc_id: r.n_tokens for r in bpe_token_counts(docs, m0).collect()}
    exp = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.aggregate(
                F.split(F.trim("text"), r"\s+"),
                F.lit(0).cast("long"),
                lambda acc, w: acc + F.length(w),
            ).alias("n"),
        ).collect()
    }
    assert c0 == exp


def test_entry_counts_bounded_by_ws_and_chars(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    rows = text_token_counts_bpe(spark, sf).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.bpe_tokens >= r.ws_tokens  # merging never crosses words
    # empty/blank docs count 0 (if any exist, they must not be dropped)
    n_docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
    assert len(rows) == n_docs


def test_budget_and_packing_accept_bpe_counts(spark):
    from databricks_data_warehouse_spark.ext.packing import pack_sequences
    from databricks_data_warehouse_spark.ext.text import sample_token_budget

    sf = "/root/testdata/sf0.001"
    counts = text_token_counts_bpe(spark, sf).select(
        "doc_id", F.col("bpe_tokens").alias("n_tokens")
    )
    bud = sample_token_budget(spark, sf, 800, token_counts_df=counts)
    # admitted cumulative totals respect the budget under BPE counts
    assert bud.where(F.col("cum_tokens") > 800).count() == 0
    got = {r.doc_id: r.n_tokens for r in bud.collect()}
    ref = {r.doc_id: r.n_tokens for r in counts.collect()}
    assert all(ref[d] == n for d, n in got.items())
    plan = pack_sequences(spark, sf, 128, token_counts_df=counts)
    rows = plan.collect()
    # conservation: per source, offsets are the exclusive prefix sums
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.start_offset == off
            assert r.seq_id == off // 128 and r.seq_offset == off % 128
            off += r.n_tokens
