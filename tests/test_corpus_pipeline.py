"""End-to-end training-corpus preparation: the composed LLM pipeline —
near-dup resolution → per-language quality floor → token-budget
sampling — run as one flow over the documents table, with the
cross-stage invariants a real data-prep job relies on. Each stage is
individually oracle-checked (dedup_keep_canonical, text_quality_floor,
sample_token_budget); this test pins that they COMPOSE: stage outputs
are consistent subsets, no near-duplicate pair survives, and the token
budget binds after the upstream filters."""

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext import dedup, text

SF = "/root/testdata/sf0.01"


def test_corpus_pipeline_stages_compose(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()

    survivors = dedup.dedup_keep_canonical(spark, SF)
    surv_ids = {r.doc_id for r in survivors.select("doc_id").collect()}
    assert 0 < len(surv_ids) <= n_docs

    # 1. no near-dup pair survives canonical resolution
    pairs = dedup.ngram_jaccard_pairs(spark, SF)
    both_alive = pairs.filter(
        F.col("doc_a").isin(surv_ids) & F.col("doc_b").isin(surv_ids)
    ).count()
    assert both_alive == 0

    # 2. quality floor is a subset of the corpus and keeps per-language
    # representation (no language wiped out by the relative threshold)
    floor = text.quality_percentile_filter(spark, SF)
    floor_ids = {r.doc_id for r in floor.select("doc_id").collect()}
    assert floor_ids <= {r.doc_id for r in docs.select("doc_id").collect()}
    langs_all = {r.lang for r in docs.select("lang").distinct().collect()}
    langs_kept = {r.lang for r in floor.select("lang").distinct().collect()}
    assert langs_kept == langs_all

    # 3. composed corpus: dedup ∩ quality, then the token budget on top
    composed = surv_ids & floor_ids
    assert composed  # the stages don't annihilate each other
    budget = text.sample_token_budget(spark, SF)
    per_source = (
        budget.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    )
    assert per_source and all(r.tok <= 800 for r in per_source)
