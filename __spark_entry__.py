"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gold query at sf0.001.
``queries()`` maps every implemented operator (SURVEY.md §2 + the
LLM-pipeline extensions) to a ``(spark, sf_dir) -> DataFrame`` callable.
``oracle_sql()`` holds the DuckDB-equivalent SQL for each; column names
and float rounding are kept identical on both sides so the driver's
order-insensitive value-hash matches.

Oracle portability notes:
- DuckDB has no ``initcap`` → emulated with list_transform over words.
- DuckDB RE2 has no lookaround → the reference's lone-slash regex
  ``(?<![0-9])/(?![0-9])`` is emulated with a capture-group replace
  applied twice (second pass catches overlap-consumed slashes).
- DuckDB ``SUM(BIGINT)`` returns HUGEINT → always CAST to BIGINT.
- Float aggregates are ROUND()ed on both sides; int/int division is
  IEEE-identical across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from databricks_data_warehouse_spark.ext import (
    asof,
    bpe,
    dedup,
    dedup_incremental,
    graph,
    json_ops,
    multimodal,
    packing,
    rowid,
    sampling,
    shuffle,
    similarity,
    skew,
    span_dedup,
    text,
    udf_ext,
)
from databricks_data_warehouse_spark.queries._util import rnd_sql as _util_rnd_sql
from databricks_data_warehouse_spark.queries import (
    aggregates,
    dashboard,
    managed_scan,
    sql_dml_query,
    stats,
    gold,
    ops,
    tpch,
)
from databricks_data_warehouse_spark import streaming
from databricks_data_warehouse_spark.sources import formats as formats_mod
from databricks_data_warehouse_spark.pipelines import cdc as cdc_pipeline
from databricks_data_warehouse_spark.pipelines import mv as mv_pipeline


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: orders ⋈ customer ⋈ nation rollup (J1+A2+H4)."""
    return gold.gold_orders_by_city(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order = driver check priority (first 50 checked/round).

    The executing window is ``_R15_WINDOW`` (defined below, next to
    the catalog) — see its comment for this round's selection
    rationale. Everything not in the window keeps catalog order after
    it."""
    cat = {
        # ====== (a) never driver-checked ===================================
        # pandas-UDAF / Python-UDTF API-class demos + r05 additions the
        # judge verified with the driver protocol; driver green wanted
        "udaf_weighted_delay": udf_ext.udaf_weighted_delay,
        "udtf_word_bigrams": udf_ext.udtf_word_bigrams,
        "events_transition_matrix": json_ops.events_transition_matrix,
        "events_path_topk": json_ops.events_path_topk,
        "agg_revenue_pareto": aggregates.agg_revenue_pareto,
        "dedup_ratio_by_source": dedup.dup_ratio_by_source,
        # NEW round 6: the UDTF demo's JVM-side production shape
        # (split/zip_with/posexplode — VERDICT r05 item 8); same oracle
        "text_word_bigrams": udf_ext.word_bigrams_builtin,
        # NEW round 6: exact-integer statistical aggregates (corr/covar/
        # least-squares) and the ManagedTable data-skipping probe
        # (write → OPTIMIZE ZORDER → stats-pruned scan ≡ SQL filter)
        "stats_corr_price_qty": stats.stats_corr_price_qty,
        "stats_delay_regression": stats.stats_delay_regression,
        "table_zorder_scan": managed_scan.table_zorder_scan,
        # NEW round 7: the same Z-order probe through the AUTOMATIC
        # skipping path — plain SQL WHERE over a registered view, with
        # Catalyst pushing the conjuncts into the manifest pruner
        # (no scan() call, no explicit triples; VERDICT r06 item 1)
        "table_zorder_scan_sql": managed_scan.table_zorder_scan_sql,
        # NEW round 8 (cont.): Databricks BLOOMFILTER INDEX analogue —
        # per-file bitmaps prune =/IN point lookups on a scattered
        # high-cardinality column where min/max bounds prove nothing
        "table_bloom_scan": managed_scan.table_bloom_scan,
        # NEW round 9: liquid-clustering analogue — CLUSTER BY keys +
        # INCREMENTAL OPTIMIZE (only unclustered files rewrite,
        # builder-asserts inode-stability of clustered files)
        "table_cluster_scan": managed_scan.table_cluster_scan,
        # NEW round 9: CONVERT TO DELTA parity — plain-parquet dir
        # adopted zero-copy (absolute-path manifest, footer stats
        # harvested), probed through the stats-pruned scan
        "table_convert_scan": managed_scan.table_convert_scan,
        # NEW round 10: write-side CDC (delta.enableChangeDataFeed) —
        # the rewrite commit stages its exact diff; the feed reads the
        # staged files (strategy literal pinned in the oracle hash)
        "table_cdf_staged_scan": managed_scan.table_cdf_staged_scan,
        # NEW round 11: blind-append commit rebase — two appends race
        # on one base version (REAL manifest-claim collision, builder-
        # asserted); both must land, nothing lost or doubled
        "table_append_race": managed_scan.table_append_race,
        "table_disjoint_merge_race": managed_scan.table_disjoint_merge_race,
        # NEW round 13: FILE-level conflict detection — merge-on-read
        # DML racing on an UNPARTITIONED table (one base entry key, so
        # entry-level disjointness is unprovable); the loser rebases
        # when the winner's file set and its read predicate are
        # provably disjoint (REAL interposed claim collision,
        # builder-asserted)
        "table_unpartitioned_race": managed_scan.table_unpartitioned_race,
        # NEW round 13: maintenance-vs-ingest race — OPTIMIZE of one
        # partition collides with a scoped MERGE into another; the
        # loser rebases reusing its compacted files (REAL interposed
        # collision, builder-asserted)
        "table_optimize_race": managed_scan.table_optimize_race,
        # NEW round 13: merge-on-read MERGE (Delta MERGE with DVs) —
        # mixed delete/update/insert clauses through ONE DV commit;
        # untouched files carried byte-identical (builder-asserted)
        "table_merge_on_read": managed_scan.table_merge_on_read,
        # NEW round 14: COPY-ON-WRITE race — entry-scoped CoW
        # DELETE/UPDATE declare file-granular write sets, so two CoW
        # DMLs on different files of an UNPARTITIONED table land in
        # parallel (REAL interposed collision, builder-asserted)
        "table_cow_race": managed_scan.table_cow_race,
        # NEW round 15: per-FILE CoW race — the write set is the exact
        # matched files and untouched neighbors re-enter the manifest
        # as @carry: file entries, so two CoW DMLs on different files
        # of the SAME entry of an UNPARTITIONED table land in parallel
        # (REAL interposed collision, builder-asserted carry + rebase)
        "table_file_cow_race": managed_scan.table_file_cow_race,
        # NEW round 15: above-cap key-set race — a MERGE on >1024
        # scattered keys declares BETWEEN + a bloom sketch of the
        # exact key set; the loser probes the racer's added file's
        # actual values and rebases over a mid-span add that BETWEEN
        # would serialize against (REAL interposed collision,
        # builder-asserted above-cap DNF + rebase)
        "table_sparse_bloom_race": managed_scan.table_sparse_bloom_race,
        # NEW round 14: identity columns under merge-on-read MERGE —
        # matched rewrites keep ids, inserts mint against the high
        # watermark atomically with the DV commit; base pairing and
        # the minted id set are oracle-exact (builder-asserted op
        # MERGE (DV) + byte-identical carry of the pre-merge files)
        "table_identity_merge_dv": managed_scan.table_identity_merge_dv,
        # NEW round 11: row tracking — dense durable id set {0..N-1}
        # preserved through backfill + append + materializing OPTIMIZE
        "table_row_tracking_scan": managed_scan.table_row_tracking_scan,
        # NEW round 12: row commit versions (row tracking's second
        # field) — per-row last-modified version preserved through
        # OPTIMIZE, bumped by exactly the rows a CoW UPDATE touched
        "table_row_versions_scan": managed_scan.table_row_versions_scan,
        # NEW round 8 (cont.): Delta generated columns — `day =
        # CAST(ts AS DATE)` computed on ingest, and a bare `ts BETWEEN`
        # filter derives the partition filter automatically
        "table_generated_scan": managed_scan.table_generated_scan,
        # NEW round 8 (cont.): COPY INTO loaded twice — the second run
        # must be a ledger no-op, so content ≡ the source exactly once
        "table_copy_into": managed_scan.table_copy_into,
        # NEW round 8 (cont.): the two canonical distribution-shape
        # operators, each pinned exactly equal to its naive form —
        # global ROW_NUMBER without the single-partition window
        # collapse, and a salted join over a maximally skewed key
        "op_assign_row_ids": rowid.op_assign_row_ids,
        # NEW round 9: deterministic epoch shuffle + round-robin
        # sharding — the reproducible training-data loader order
        # (keyed md5 permutation: cross-engine AND retry-deterministic,
        # positions via the scalable rowid pass — no global window)
        "data_epoch_shuffle": shuffle.data_epoch_shuffle,
        "join_skew_salted": skew.join_skew_salted,
        # NEW round 7: Delta-style SQL DML over a ManagedTable — DELETE
        # and UPDATE run merge-on-read (deletion vectors + appended
        # rewrites), MERGE upserts; the oracle replays the statements
        # relationally (VERDICT r06 "What's missing" item 6)
        "table_sql_dml": sql_dml_query.table_sql_dml,
        # NEW round 9: replaceWhere / INSERT OVERWRITE [PARTITION] —
        # the selective-overwrite write modes (partition-aligned
        # metadata-only drop, straddling remainder rewrite, static
        # partition swap), builder-asserted to take the right path
        "table_replace_where": sql_dml_query.table_replace_where,
        # NEW round 9: Delta's FULL MERGE grammar in one statement —
        # conditional/ordered WHEN MATCHED clauses, column-list INSERT,
        # and WHEN NOT MATCHED BY SOURCE (snapshot-sync)
        "table_merge_sync": sql_dml_query.table_merge_sync,
        # NEW round 9: subquery-predicated DML — IN-subquery DELETE
        # against another table + scalar-subquery UPDATE over the
        # mutated table's own post-delete snapshot, both DV commits
        "table_dml_subquery": sql_dml_query.table_dml_subquery,
        # NEW round 7: incremental change feed (manifest/DV diff) over
        # the DV-delete commit — O(changed rows), no full-table diff
        "table_cdf": sql_dml_query.table_cdf,
        # NEW round 8: change-feed-driven incremental MV maintenance —
        # DML-aware (insert/delete algebra over the attributed feed),
        # exactly-once via txn watermark; oracle = full re-aggregation
        "table_mv_incremental": mv_pipeline.table_mv_incremental,
        # NEW round 9: APPLY CHANGES INTO (DLT CDC apply) — three
        # sequential change batches through SCD1 (latest state, one
        # merge_clauses join per batch) and SCD2 (full history,
        # changed-keys-only DV rewrite); oracle = relational fixpoint
        "table_apply_changes_scd1": cdc_pipeline.table_apply_changes_scd1,
        "table_apply_changes_scd2": cdc_pipeline.table_apply_changes_scd2,
        # NEW round 10: DLT TRACK HISTORY ON column subset — untracked
        # changes update the open SCD2 version in place (no new row),
        # tracked changes open versions; oracle = relational history
        "table_scd2_track_history": cdc_pipeline.table_scd2_track_history,
        # NEW round 10: DLT apply_changes_from_snapshot — the change
        # feed DERIVED by diffing successive full snapshots (insert /
        # value-change / disappear->delete / unchanged->no event),
        # then the same SCD1/SCD2 apply; oracle = relational fixpoint
        "table_apply_snapshot_scd1": cdc_pipeline.table_apply_snapshot_scd1,
        "table_apply_snapshot_scd2": cdc_pipeline.table_apply_snapshot_scd2,
        # NEW round 7: dropped-mass observability for the dedup caps
        # (_MAX_BAND_BUCKET/_MAX_GRAM_DF), caps tightened to 3/3 so
        # they BIND here (VERDICT r06 item 5 — no silent truncation)
        "dedup_cap_report": dedup.dedup_cap_report_bound,
        # NEW round 7: SemDeDup-style composed semantic dedup — IVF
        # clustering -> intra-cluster cosine pairs -> connected
        # components -> keep-canonical (VERDICT r06 item 3)
        "dedup_semantic": similarity.semantic_dedup,
        # NEW round 7: new-batch-vs-persisted-index near-dup — the
        # 100 TB ingestion shape; oracle = full non-incremental
        # recompute over existing ∪ batch (VERDICT r06 item 6)
        "dedup_incremental": dedup_incremental.dedup_incremental,
        # round 7: corpus-trained mini-BPE token accounting — merge
        # table persisted as a ManagedTable. Round 8: now EXACT-oracled
        # (VERDICT r07 item 4): the iterative training is replayed at
        # oracle-construction time by the same in-memory reference
        # trainer the distributed path is property-tested against, the
        # resulting (word -> token count) vocabulary is emitted as a
        # corpus-fingerprint-keyed VALUES relation, and DuckDB does the
        # relational half (tokenize, vocabulary join, per-doc sums)
        "text_token_counts_bpe": bpe.text_token_counts_bpe,
        # NEW round 7: CCNet-style LM quality filter in exact integer
        # arithmetic (floor-log2 bigram familiarity — no float logs)
        "text_lm_familiarity": text.lm_familiarity,
        # NEW round 8: span-level exact substring dedup (Lee et al.
        # 2022 ExactSubstr) — maximal duplicated k-gram spans +
        # per-doc removal accounting
        "text_dup_spans": span_dedup.dup_spans,
        "text_dedup_substrings": span_dedup.dedup_substrings,
        # NEW round 6: incremental Gold — additive per-key aggregates
        # maintained across micro-batches with txn-watermark
        # exactly-once (Delta txnAppId parity); equals the batch
        # GROUP BY over all events
        "stream_gold_counts_table": streaming.stream_gold_counts_table,
        # NEW round 7: streaming FROM a ManagedTable (Delta streaming-
        # source parity) — offsets are table versions; the drained sink
        # must equal the batch GROUP BY over the raw source
        "stream_table_source": streaming.stream_table_source,
        # NEW round 7: streaming CDC — the change feed AS a stream
        # (readChangeFeed), per-commit attribution, O(changed rows)
        "stream_table_cdf": streaming.stream_table_cdf,
        # NEW round 9: Auto-Loader-shaped streaming COPY — cloud_files
        # discovery stream + ledger-guarded COPY sink, drained twice
        # (second drain = full re-delivery) and still exactly-once
        "stream_copy_into": streaming.stream_copy_into_query,
        # NEW round 9: streaming CDC apply — file-landed change batches
        # drained through apply_changes; second drain from a FRESH
        # checkpoint re-delivers everything and must no-op (sequence-
        # owned exactly-once, no txn watermark)
        "stream_apply_changes": streaming.stream_apply_changes_query,
        # NEW round 11: DLT expectations on a STREAMING frame — the
        # per-micro-batch observedMetrics summed across the drain must
        # equal the batch totals; the sink count proves drop enforcement
        "stream_expectations": streaming.stream_expectations,
        # NEW round 6: directed n-gram containment (doc-in-doc dup the
        # symmetric Jaccard misses)
        "dedup_containment_pairs": dedup.ngram_containment_pairs,
        # NEW round 6: online near-dup filtering of a document stream
        # (3rd custom stateful operator, full value-hash oracle)
        "stream_dedup_simhash": streaming.stream_dedup_simhash,
        # NEW round 6: multi-probe LSH (probe Hamming<=1 buckets; the
        # standard recall fix - 0.1-0.2 single-probe -> 0.6-0.9)
        "ann_lsh_topk_multiprobe": similarity.ann_lsh_topk_multiprobe,
        # ====== (b) code or oracle changed in round 6 ======================
        # connected_components now releases superseded checkpoint blocks
        "dedup_clusters": dedup.near_dup_clusters,
        "dedup_keep_canonical": dedup.dedup_keep_canonical,
        # no-op merges commit-free; null-safe idempotency match;
        # stream sink partitioned by event_type with retain_versions=2
        "stream_ingest_managed_table": streaming.stream_events_to_table,
        "op_pipeline_validate": ops.op_pipeline_validate,
        # q2 single-pass window min; all four share the hoisted
        # supplier count in derived_partsupp
        "tpch_q2_min_cost_supplier": tpch.tpch_q2_min_cost_supplier,
        "tpch_q11_important_stock": tpch.tpch_q11_important_stock,
        "tpch_q16_supplier_part_counts": tpch.tpch_q16_supplier_part_counts,
        "tpch_q20_excess_stock_suppliers": tpch.tpch_q20_excess_stock_suppliers,
        # oracle SQL now derives the LSH plane count from COUNT(*) so
        # any-scale checks match the Spark auto-planes (ADVICE r05)
        "ann_lsh_buckets": similarity.ann_lsh_buckets,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_lsh_near_dup_pairs": similarity.lsh_near_dup_pairs,
        # drain now enforces the single-batch assumption (ADVICE r05)
        "stream_expanding_zscore": streaming.stream_expanding_zscore,
        # ====== (c) r03 greens on untouched files (oldest in registry) =====
        "sample_hash_split": sampling.sample_hash_split,
        # NEW round 12: quality-temperature mixing — include docs with
        # prob q^(1/T) at T=0.5 (q², sharpen) and T=2 (√q, flatten);
        # md5-uniform + exactly-rounded IEEE thresholds, bit-exact
        "sample_quality_temperature": sampling.sample_quality_temperature,
        # NEW round 12: multi-format source parity — ORC/CSV/JSON
        # round-trips re-read through the production readers must be
        # value-exact vs the parquet source (keys, doubles, dates)
        "formats_multiformat_scan": formats_mod.formats_multiformat_scan,
        "sample_stratified": sampling.sample_stratified,
        "asof_events_latest_order": asof.asof_events_latest_order,
        "range_join_value_bands": asof.range_join_value_bands,
        "mm_media_metadata": multimodal.media_metadata,
        "mm_decode_features": multimodal.mm_decode_features,
        "mm_frame_sample": multimodal.mm_frame_sample,
        "stream_sliding_windows": streaming.stream_sliding_windows,
        "stream_session_windows": streaming.stream_session_windows,
        "stream_dedup_events": streaming.stream_dedup_events,
        "stream_enriched_counts": streaming.stream_enriched_counts,
        "text_chunks": text.text_chunks,
        "agg_distinct_counts": aggregates.agg_distinct_counts,
        # ====== (d) r04 greens at the freshness bar ========================
        "tpch_q4_order_priority": tpch.tpch_q4_order_priority,
        "tpch_q7_volume_shipping": tpch.tpch_q7_volume_shipping,
        "tpch_q8_market_share": tpch.tpch_q8_market_share,
        "tpch_q9_product_profit": tpch.tpch_q9_product_profit,
        "tpch_q10_returned_items": tpch.tpch_q10_returned_items,
        "tpch_q12_shipping_modes": tpch.tpch_q12_shipping_modes,
        "tpch_q13_customer_distribution": tpch.tpch_q13_customer_distribution,
        "tpch_q14_promo_revenue": tpch.tpch_q14_promo_revenue,
        "tpch_q15_top_supplier": tpch.tpch_q15_top_supplier,
        "tpch_q17_small_quantity_revenue": tpch.tpch_q17_small_quantity_revenue,
        "tpch_q18_large_volume_customers": tpch.tpch_q18_large_volume_customers,
        "tpch_q19_discounted_revenue": tpch.tpch_q19_discounted_revenue,
        "tpch_q21_suppliers_kept_waiting": tpch.tpch_q21_suppliers_kept_waiting,
        "tpch_q22_sales_opportunity": tpch.tpch_q22_sales_opportunity,
        "agg_rollup_customers": aggregates.agg_rollup_customers,
        "agg_order_gaps": aggregates.agg_order_gaps,
        "agg_rolling_revenue": aggregates.agg_rolling_revenue,
        "agg_cube_orders": aggregates.agg_cube_orders,
        # ====== beyond the 50-entry prefix ================================
        # ---- r04-green: remaining stretch aggregates (front of the
        #      round-7 window, with the rest of the r04 cohort below)
        "agg_grouping_sets": aggregates.agg_grouping_sets,
        "agg_delay_percentiles": aggregates.agg_delay_percentiles,
        "set_ops_customers": aggregates.set_ops_customers,
        "agg_pivot_status_by_segment": aggregates.agg_pivot_status_by_segment,
        "agg_daily_revenue_gapfill": aggregates.agg_daily_revenue_gapfill,
        "agg_customer_quartiles": aggregates.agg_customer_quartiles,
        "agg_value_mad": aggregates.agg_value_mad,
        # ---- r04-green: dedup index builds (cluster/canonical stages
        #      are in the prefix and re-certify the shared helpers)
        "dedup_exact": dedup.dedup_exact,
        "dedup_minhash_signatures": dedup.minhash_signatures,
        "dedup_minhash_pairs": dedup.minhash_candidate_pairs,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs_cached,
        # NEW round 12: integer PageRank over the symmetrized near-dup
        # candidate graph (corpus-curation authority signal) — ranks in
        # BIGINT 1e-12 units, floor-division power steps, bit-exact twin
        "graph_pagerank_docs": graph.pagerank_near_dup,
        "dedup_simhash": dedup.simhash,
        # ---- r04-green: packing / mixture / TF-IDF / BM25 / boilerplate
        "pack_sequences": lambda spark, sf: packing.pack_sequences(
            spark, sf, seq_len=512
        ),
        "mixture_weights": packing.mixture_weights,
        "mixture_sample": packing.mixture_sample,
        "tfidf_top_terms": packing.tfidf_top_terms,
        "text_boilerplate": text.boilerplate_ngrams,
        "text_bm25": packing.text_bm25,
        # ---- r04-green: events analytics
        "events_sessionize": json_ops.events_sessionize,
        "events_funnel": json_ops.events_funnel,
        "events_retention": json_ops.events_retention,
        "events_scd2_status": json_ops.events_scd2_status,
        # ---- r04-green: embeddings / IVF
        "emb_quantize_int8": similarity.emb_quantize_int8,
        # NEW round 8: product quantization (Jégou et al. 2011) —
        # per-subspace codebook assignment, the ADC serving layout
        "emb_pq_codes": similarity.emb_pq_codes,
        # ADC search over the codes: scan touches only integers + a
        # broadcast 64-double LUT — the PQ serving probe
        "ann_pq_topk": similarity.ann_pq_topk,
        # the production pattern: ADC shortlist -> exact re-rank of
        # only the shortlist's vectors (recall set by shortlist size)
        "ann_pq_rerank_topk": similarity.ann_pq_rerank_topk,
        # hard-negative mining for contrastive training: per query,
        # top-k most-similar vectors with a DIFFERENT label
        "emb_hard_negatives": similarity.emb_hard_negatives,
        "emb_centroid_per_label": similarity.emb_centroid_per_label,
        "ann_kmeans_refine": similarity.ann_kmeans_refine,
        "ann_ivf_assignments": similarity.ann_ivf_assignments,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        # ---- r04-green: streaming
        "stream_hourly_tumbling": streaming.stream_hourly_tumbling,
        "stream_click_purchase_join": streaming.stream_click_purchase_join,
        "stream_user_running_counts": streaming.stream_user_running_counts,
        # ---- r05-green (1 round old), files untouched in round 6
        "events_anomaly_zscore": json_ops.events_anomaly_zscore,
        "text_quality_floor": text.quality_percentile_filter,
        "sample_token_budget": text.sample_token_budget,
        "agg_unpivot_status": aggregates.agg_unpivot_status,
        "agg_value_histogram": aggregates.agg_value_histogram,
        "op_profile_customer": ops.op_profile_customer,
        # NEW round 10: DLT-style expectations (expect / expect_or_drop
        # / expect_or_fail) — one-pass metric aggregation + the drop
        # filter both pinned inside the hash via rows_kept
        "pipeline_expectations": ops.op_pipeline_expectations,
        "op_clean_string": ops.op_clean_string,
        "op_clean_string_address": ops.op_clean_string_address,
        "op_validate_columns": ops.op_validate_columns,
        "op_validate_domain": ops.op_validate_domain,
        "op_validate_relationship": ops.op_validate_relationship,
        "op_identify_duplicates": ops.op_identify_duplicates,
        "op_ingestion_status": ops.op_ingestion_status,
        "ann_cosine_topk": similarity.ann_cosine_topk,
        # NEW round 12: hybrid retrieval — RRF fusion of the BM25
        # lexical ranking and the cosine vector ranking (both sides'
        # scores rounded BEFORE ranking, fixed tiebreaks, fusion over
        # bounded candidate lists only)
        "retrieval_hybrid_rrf": similarity.retrieval_hybrid_rrf,
        # NEW round 9: the serving-quality measurement as a first-class
        # hash-checked query — recall@k of PQ/ADC vs exact brute force
        "ann_recall_report": similarity.ann_recall_report,
        "ann_pairs_per_label": similarity.pairwise_topk_per_label,
        "events_json_extract": json_ops.events_json_extract,
        "events_json_agg": json_ops.events_json_agg,
        # NEW round 11: VARIANT (Spark 4 / Delta 4 type) — parse once,
        # extract typed paths via variant_get; missing-path NULL +
        # schema_of_variant shape pinned in the hash
        "events_variant_agg": json_ops.events_variant_agg,
        "events_variant_shapes": json_ops.events_variant_shapes,
        "events_hourly_windows": json_ops.events_hourly_windows,
        "gold_customer_status_by_city": gold.gold_customer_status_by_city,
        "gold_orders_by_city": gold.gold_orders_by_city,
        "gold_orders_by_customer_week": gold.gold_orders_by_customer_week,
        "gold_customer_breakdown": gold.gold_customer_breakdown,
        "gold_orders_delivery_time": gold.gold_orders_delivery_time,
        "dash_top_nations_by_segment": dashboard.dash_top_nations_by_segment,
        "dash_customer_share_by_segment": dashboard.dash_customer_share_by_segment,
        "dash_low_order_customers": dashboard.dash_low_order_customers,
        "dash_avg_delivery_by_nation": dashboard.dash_avg_delivery_by_nation,
        "dash_late_orders_by_priority": dashboard.dash_late_orders_by_priority,
        "tpch_q1_pricing_summary": tpch.tpch_q1_pricing_summary,
        "tpch_q3_shipping_priority": tpch.tpch_q3_shipping_priority,
        "tpch_q5_local_supplier_volume": tpch.tpch_q5_local_supplier_volume,
        "tpch_q6_forecast_revenue": tpch.tpch_q6_forecast_revenue,
        "text_quality": text.text_quality,
        "text_token_counts": text.token_counts,
        "text_lang_id": text.lang_id,
        "text_fingerprint": text.doc_fingerprint,
        "text_pii_scrub": text.text_pii_scrub,
        "text_decontaminate": text.decontaminate_splits,
        "text_repetition": text.repetition_scores,
        "text_corpus_filter": text.corpus_filter,
        # ---- approx twins (r09: hash-checked via deterministic-bound
        # verdicts — sketch estimate vs exact anchor, flag asserted TRUE)
        "agg_delay_percentiles_approx": aggregates.agg_delay_percentiles_approx,
        "agg_distinct_counts_approx": aggregates.agg_distinct_counts_approx,
    }
    # strict indexing: a typo'd / renamed window name must fail fast
    # at registry build, not silently forfeit its driver slot
    ordered = {k: cat[k] for k in _R15_WINDOW}
    ordered.update({k: v for k, v in cat.items() if k not in ordered})
    return ordered


# The 50-slot driver window for round 15 (VERDICT r14 "Next round" 1):
# after r14 repaid all r09/r10 staleness, the oldest driver green is
# r11 on exactly 40 entries — ALL of them take slots (b), making the
# oldest driver green >= r12 everywhere after this round. The remaining
# 10 slots, (a): new round-15 oracles (post-freeze additions take a
# slot, the r11 process rule) and touched-path re-checks for the files
# this round rewires — tables.py (per-FILE CoW write sets, above-cap
# bloom key predicates): table_cow_race, table_merge_on_read,
# table_unpartitioned_race; pipelines/cdc.py (exact gap boundary
# anchors): table_apply_changes_scd1 / table_apply_snapshot_scd2 are
# already in (b); streaming lifecycle shave: stream_hourly_tumbling as
# the representative re-check (the 8 stream_* entries in (b) cover the
# rest). Unused reserve slots fall through to catalog order.
_R15_WINDOW = [
    # (a) new round-15 oracles + touched-path re-checks
    "table_file_cow_race",
    "table_sparse_bloom_race",
    "stream_hourly_tumbling",
    "table_cow_race",
    "table_merge_on_read",
    "table_unpartitioned_race",
    # (b) the full r11 staleness tail (oldest driver greens, all 40)
    "agg_distinct_counts",
    "agg_revenue_pareto",
    "asof_events_latest_order",
    "dedup_ratio_by_source",
    "events_path_topk",
    "events_transition_matrix",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_media_metadata",
    "range_join_value_bands",
    "sample_hash_split",
    "sample_stratified",
    "stats_corr_price_qty",
    "stats_delay_regression",
    "stream_dedup_events",
    "stream_dedup_simhash",
    "stream_enriched_counts",
    "stream_expanding_zscore",
    "stream_expectations",
    "stream_session_windows",
    "stream_sliding_windows",
    "stream_table_cdf",
    "stream_table_source",
    "table_apply_changes_scd1",
    "table_apply_snapshot_scd2",
    "table_cdf",
    "table_cdf_staged_scan",
    "table_dml_subquery",
    "table_replace_where",
    "text_chunks",
    "text_word_bigrams",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q20_excess_stock_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "udaf_weighted_delay",
    "udtf_word_bigrams",
]


# ---------------------------------------------------------------- SQL helpers

# DuckDB initcap emulation (Spark: first letter of each space-delimited
# word uppercased, rest lowercased)
def _initcap(expr: str) -> str:
    return (
        "array_to_string(list_transform(string_split(" + expr + ", ' '), "
        "w -> CASE WHEN length(w) = 0 THEN '' "
        "ELSE upper(w[1]) || lower(w[2:]) END), ' ')"
    )


# default-mode clean chain: tab→space, non-letters→space, initcap,
# collapse whitespace, trim
def _clean_default(expr: str) -> str:
    s = f"regexp_replace({expr}, '\\t', ' ', 'g')"
    s = f"regexp_replace({s}, '[^a-zA-Z ]', ' ', 'g')"
    s = _initcap(s)
    s = f"regexp_replace({s}, '\\s+', ' ', 'g')"
    return f"trim({s})"


# address-mode clean chain: keep alnum + '/', drop slashes not between
# digits (lookaround emulated by a twice-applied capture-group replace)
def _clean_address(expr: str) -> str:
    s = f"regexp_replace({expr}, '\\t', ' ', 'g')"
    s = f"regexp_replace({s}, '[^a-zA-Z0-9 /]', ' ', 'g')"
    lone = "'(^|[^0-9])/($|[^0-9])'"
    s = f"regexp_replace({s}, {lone}, '\\1 \\2', 'g')"
    s = f"regexp_replace({s}, {lone}, '\\1 \\2', 'g')"
    s = _initcap(s)
    s = f"regexp_replace({s}, '\\s+', ' ', 'g')"
    return f"trim({s})"


# normalized text for dedup: lower, collapse whitespace, trim
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# whitespace tokens of normalized text
_TOKS_NORM = f"string_split_regex({_NORM}, '\\s+')"
# whitespace tokens of raw trimmed text
_TOKS_RAW = "string_split_regex(trim(text), '\\s+')"

# derived partsupp (queries/tpch.py:derived_partsupp) — the dbgen spread
# over the runtime supplier count + integer multiplicative hashes; pure
# BIGINT arithmetic, so this CTE is the bit-identical DuckDB twin
_PARTSUPP_CTE = """
    s_cnt AS (SELECT COUNT(*) AS c FROM supplier),
    ps0 AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + i * (c // 4) + p_partkey // c) % c AS ps_suppkey
        FROM part, s_cnt, (SELECT UNNEST([0, 1, 2, 3]) AS i)
    ),
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               CAST((ps_partkey * 2654435761 + ps_suppkey * 40503 + 7)
                    % 9999 + 1 AS INTEGER) AS ps_availqty,
               ((ps_partkey * 1299709 + ps_suppkey * 104729 + 13)
                    % 99900 + 100) / 100.0 AS ps_supplycost
        FROM ps0
    )
"""

# word bigrams (udtf_word_bigrams AND its built-in twin
# text_word_bigrams): tokenizer pinned to the explicit ASCII class
# [ \t\n\r\f] on all three sides — the Python UDTF, the Spark split(),
# and this RE2 split (str.split/\s differ on non-ASCII whitespace,
# ADVICE r05)
# shared CTE prefix of the span-dedup twins (ext/span_dedup.py, k=8):
# tokenize -> positioned k-grams -> corpus-repeated grams -> duplicated
# occurrences -> gaps-and-islands merge state
_SPAN_K = 8
_SPAN_DEDUP_SQL = f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS p,
               array_to_string(t.toks[u.i:u.i + {_SPAN_K} - 1], ' ') AS gram
        FROM t, UNNEST(range(1, len(t.toks) - {_SPAN_K} + 2)) AS u(i)
        WHERE len(t.toks) >= {_SPAN_K}
    ),
    rep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    occ AS (
        SELECT g.doc_id, g.p, g.p + {_SPAN_K} - 1 AS e
        FROM g JOIN rep USING (gram)
    ),
    m AS (
        SELECT doc_id, p, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_e
        FROM occ
    ),
    isl AS (
        SELECT doc_id, p, e,
               SUM(CASE WHEN prev_e IS NULL OR p > prev_e + 1
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM m
    )
"""

_BIGRAMS_SQL = """
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                           x -> x <> '') AS toks
        FROM documents
    )
    SELECT t.doc_id, CAST(u.i AS INTEGER) AS bigram_idx,
           t.toks[u.i] || ' ' || t.toks[u.i + 1] AS bigram
    FROM t, UNNEST(range(1, len(t.toks))) AS u(i)
"""

# PII regexes shared verbatim with the Spark side (RE2 ⊂ Java regex)
from databricks_data_warehouse_spark.ext.text import PII_PATTERNS as _PII  # noqa: E402

# distinct word 3-shingles of normalized text (short docs → whole doc)
_SHINGLES3 = (
    f"list_distinct(CASE WHEN len({_TOKS_NORM}) < 3 "
    f"THEN [array_to_string({_TOKS_NORM}, ' ')] "
    f"ELSE list_transform(range(1, len({_TOKS_NORM}) - 1), "
    f"i -> array_to_string({_TOKS_NORM}[i:i+2], ' ')) END)"
)

_LANG_SQL_MARKERS = {
    "en": "['the','and','of','to','a']",
    "es": "['el','la','de','que','y']",
    "fr": "['le','la','et','les','des']",
    "de": "['der','die','und','das','ein']",
}


def _minhash_expr(j: int) -> str:
    return f"list_aggregate(list_transform(sh, s -> md5('{j}|' || s)), 'min')"


def _minhash_sql(j: int) -> str:
    return f"{_minhash_expr(j)} AS mh_{j}"


# sign-LSH twins of ext/similarity._bucket_id: ±1 plane weight for dim i
# is the parity of the first hex char of md5('{plane}|{i}'); the
# projection is an in-order list fold, identical to Spark's zip_with +
# aggregate left fold.
def _lsh_proj_sql(vec: str, plane: int) -> str:
    w = (
        f"CASE WHEN (strpos('0123456789abcdef', "
        f"substr(md5('{plane}|' || CAST(i AS VARCHAR)), 1, 1)) - 1) % 2 = 0 "
        f"THEN 1.0 ELSE -1.0 END"
    )
    return (
        f"list_aggregate(list_transform(range(0, len({vec})), "
        f"i -> CAST({vec}[i + 1] AS DOUBLE) * ({w})), 'sum')"
    )


# The Spark side derives the plane count from the corpus size
# (similarity._auto_planes: n<=64 -> 4, else max(4, ceil(log2(n/64))));
# the oracle must follow the SAME knob or any hash check above sf0.01
# silently diverges (ADVICE r05). ``np`` is a one-row CTE holding that
# count; the bucket is a masked sum of _LSH_MAX_PLANES plane terms,
# each active only when its index < n_planes. 24 terms covers corpora
# to 64·2^24 ≈ 1e9 vectors — far past any oracle-checkable scale.
_LSH_MAX_PLANES = 24
_LSH_PLANES_CTE = """np AS (
        SELECT CASE WHEN COUNT(*) <= 64 THEN 4
               ELSE GREATEST(4, CAST(CEIL(LOG2(COUNT(*) / 64.0)) AS INT))
               END AS n_planes
        FROM embeddings
    )"""


def _lsh_bucket_sql(vec: str, planes_expr: str = "np.n_planes") -> str:
    parts = [
        f"(CASE WHEN {j} < {planes_expr} AND {_lsh_proj_sql(vec, j)} >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(_LSH_MAX_PLANES)
    ]
    return "CAST(" + " + ".join(parts) + " AS INT)"


# cosine between two already-DOUBLE list expressions (same fold order as
# ext/similarity.cosine)
def _cos_sql(a: str, b: str) -> str:
    dp = (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i]), 'sum')"
    )
    na = f"sqrt(list_aggregate(list_transform({a}, x -> x * x), 'sum'))"
    nb = f"sqrt(list_aggregate(list_transform({b}, x -> x * x), 'sum'))"
    return f"({dp} / ({na} * {nb}))"


# simhash twins of ext/dedup.simhash: h = first 4 md5 hex chars as int;
# bit i of the fingerprint = majority vote of h's bit i across tokens
_SIMHASH_H = (
    "list_sum(list_transform(range(1, 5), "
    "i -> (strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1)"
    " * (1 << (4 * (4 - i)))))"
)
_SIMHASH_VOTES = " + ".join(
    f"(CASE WHEN SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
    f"THEN {1 << i} ELSE 0 END)"
    for i in range(16)
)


_BPE_VOCAB_CACHE: list[str] = []


def _bpe_vocab_values() -> str:
    """The trained-BPE vocabulary as a fingerprint-keyed SQL VALUES
    relation — the oracle for ``text_token_counts_bpe``.

    BPE TRAINING is iterative state, not a relational expression, so
    the oracle replays it at construction time with the package's
    in-memory reference trainer (``_train_driver`` — the implementation
    the distributed trainer is property-tested identical to,
    tests/test_bpe.py) over each known testdata corpus, encodes every
    distinct word once, and emits ``(corpus_fingerprint, word,
    n_tokens)`` rows. The SQL side then does the relational half
    honestly: fingerprint the ``documents`` view, select the matching
    vocabulary, tokenize, join, aggregate per document. A corpus that
    is none of the known testdata dirs selects an empty vocabulary and
    mismatches loudly (rows with NULL bpe) rather than silently.

    The fingerprint is computed HERE via DuckDB with the byte-identical
    expression the oracle SQL uses, so the join key can never drift
    between Python and SQL semantics."""
    if _BPE_VOCAB_CACHE:
        return _BPE_VOCAB_CACHE[0]
    import os
    import re as _re
    from collections import Counter

    import duckdb as _dd

    from databricks_data_warehouse_spark.ext.bpe import (
        MIN_PAIR_FREQ,
        NUM_MERGES,
        _merge_word,
        _train_driver,
    )

    rows: list[tuple[str, str, int]] = []
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        con = _dd.connect()
        fp = con.execute(
            f"SELECT {_BPE_FP_EXPR} FROM read_parquet('{path}')"
        ).fetchone()[0]
        docs = con.execute(
            f"SELECT text FROM read_parquet('{path}')"
        ).fetchall()
        con.close()
        wf: Counter = Counter()
        for (t,) in docs:
            # the explicit ASCII class the other text oracles pin
            # (Java \s+ twin for this corpus)
            for w in _re.split(r"[ \t\n\r\f]+", (t or "").strip()):
                if w:
                    wf[w] += 1
        merges = _train_driver(
            sorted(wf.items()), NUM_MERGES, MIN_PAIR_FREQ
        )
        ordered = [(l, r) for _rank, l, r in sorted(merges)]
        for w in sorted(wf):
            syms = list(w)
            for left, right in ordered:
                if len(syms) == 1:
                    break
                syms = _merge_word(syms, left, right)
            rows.append((fp, w, len(syms)))
    vals = ",\n                ".join(
        "('{}', '{}', {})".format(
            f.replace("'", "''"), w.replace("'", "''"), n
        )
        for f, w, n in rows
    )
    _BPE_VOCAB_CACHE.append(vals)
    return vals


# corpus fingerprint over the documents relation, spelled once and used
# verbatim on both the Python (vocab build) and SQL (vocab select) side
_BPE_FP_EXPR = (
    "count(*) || ':' || COALESCE(SUM(length(text)), 0)"
    " || ':' || COALESCE(SUM(doc_id), 0)"
)


def oracle_sql() -> dict[str, str]:
    # exact integer-cents twins of _util.cents / _util.rnd (see those
    # docstrings): money columns are 2-decimal, so sums/products of the
    # cent representation are exact BIGINTs on both engines.
    ep_c = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    disc_c = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    tax_c = "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"
    disc_price_e4 = f"{ep_c} * (100 - {disc_c})"
    charge_e6 = f"{ep_c} * (100 - {disc_c}) * (100 + {tax_c})"
    # Inverted-index twin of ext/dedup.ngram_jaccard_pairs INCLUDING the
    # _MAX_GRAM_DF stop-gram cap (grams with block df > 1000 dropped
    # before pairing, per-doc set size n over SURVIVING grams), so the
    # exact-twin hash holds at any corpus scale, not just where the cap
    # never binds (ADVICE r03).
    ngram_pairs_sql = f"""
            WITH grams_t AS (
                SELECT doc_id, lang, source,
                       list_distinct(CASE WHEN len({_TOKS_NORM}) < 2 THEN []
                           ELSE list_transform(range(1, len({_TOKS_NORM})),
                                i -> array_to_string({_TOKS_NORM}[i:i+1], ' '))
                           END) AS grams
                FROM documents
            ),
            inv_raw AS (
                SELECT doc_id, lang, source, unnest(grams) AS gram
                FROM grams_t
            ),
            inv_df AS (
                SELECT *, COUNT(*) OVER (PARTITION BY lang, source, gram)
                           AS gram_df
                FROM inv_raw
            ),
            inv AS (
                SELECT doc_id, lang, source, gram,
                       COUNT(*) OVER (PARTITION BY doc_id) AS n
                FROM inv_df WHERE gram_df <= 1000
            ),
            scored AS (
                SELECT a.lang, a.source,
                       a.doc_id AS doc_a, b.doc_id AS doc_b,
                       floor(COUNT(*) / (a.n + b.n - COUNT(*))
                             * 10000 + 0.5) / 10000 AS jaccard
                FROM inv a
                JOIN inv b ON a.lang = b.lang AND a.source = b.source
                          AND a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.lang, a.source, a.doc_id, b.doc_id, a.n, b.n
            )
            SELECT lang, source, doc_a, doc_b, jaccard
            FROM scored WHERE jaccard >= 0.3
        """
    # directed-containment twin of ext/dedup.ngram_containment_pairs:
    # same inverted index / df cap, denominator = SOURCE doc's
    # surviving-gram count, both directions emitted
    containment_pairs_sql = f"""
            WITH grams_t AS (
                SELECT doc_id, lang, source,
                       list_distinct(CASE WHEN len({_TOKS_NORM}) < 2 THEN []
                           ELSE list_transform(range(1, len({_TOKS_NORM})),
                                i -> array_to_string({_TOKS_NORM}[i:i+1], ' '))
                           END) AS grams
                FROM documents
            ),
            inv_raw AS (
                SELECT doc_id, lang, source, unnest(grams) AS gram
                FROM grams_t
            ),
            inv_df AS (
                SELECT *, COUNT(*) OVER (PARTITION BY lang, source, gram)
                           AS gram_df
                FROM inv_raw
            ),
            inv AS (
                SELECT doc_id, lang, source, gram,
                       COUNT(*) OVER (PARTITION BY doc_id) AS n
                FROM inv_df WHERE gram_df <= 1000
            ),
            scored AS (
                SELECT a.lang, a.source,
                       a.doc_id AS doc_a, b.doc_id AS doc_b,
                       floor(COUNT(*) / a.n * 10000 + 0.5) / 10000
                           AS containment
                FROM inv a
                JOIN inv b ON a.lang = b.lang AND a.source = b.source
                          AND a.gram = b.gram AND a.doc_id <> b.doc_id
                GROUP BY a.lang, a.source, a.doc_id, b.doc_id, a.n
            )
            SELECT lang, source, doc_a, doc_b, containment
            FROM scored WHERE containment >= 0.6
        """
    mh_cols = ",\n               ".join(_minhash_sql(j) for j in range(8))
    lang_scores = ",\n               ".join(
        f"len(list_intersect(toks, {arr})) AS score_{code}"
        for code, arr in _LANG_SQL_MARKERS.items()
    )
    # Integer-PageRank twin of ext/graph.pagerank_near_dup: the fixed
    # power iterations are UNROLLED (one CTE trio per step — dangling
    # mass, in-sums, next ranks); every op is BIGINT/HUGEINT floor
    # arithmetic, so the match is bit-exact with no fp rounding dance.
    # Constants imported from the module so the twin can't drift.
    _pr_scale, _pr_dn, _pr_dd = graph.RANK_SCALE, graph.DAMP_NUM, graph.DAMP_DEN
    _pr_teleport = (
        f"(({_pr_dd - _pr_dn}) * ({_pr_scale} // (SELECT n FROM pr_n)))"
        f" // {_pr_dd}"
    )
    pr_ctes = [
        f"""pr_vp AS (SELECT doc_a, doc_b FROM ({ngram_pairs_sql})),
            pr_edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM pr_vp
                UNION ALL
                SELECT doc_b AS src, doc_a AS dst FROM pr_vp
            ),
            pr_deg AS (SELECT src, COUNT(*) AS deg FROM pr_edges GROUP BY src),
            pr_nodes AS (
                SELECT d.doc_id, COALESCE(g.deg, 0) AS degree
                FROM documents d LEFT JOIN pr_deg g ON d.doc_id = g.src
            ),
            pr_n AS (SELECT COUNT(*) AS n FROM documents),
            pr_it0 AS (
                SELECT doc_id, degree,
                       CAST({_pr_scale} // (SELECT n FROM pr_n) AS BIGINT) AS r
                FROM pr_nodes
            )"""
    ]
    for _k in range(1, 4):  # iterations=3, matching the Spark default
        pr_ctes.append(
            f"""pr_dang{_k} AS (
                SELECT COALESCE(SUM(r), 0) // (SELECT n FROM pr_n) AS dn
                FROM pr_it{_k - 1} WHERE degree = 0
            ),
            pr_in{_k} AS (
                SELECT e.dst, SUM(p.r // p.degree) AS insum
                FROM pr_edges e JOIN pr_it{_k - 1} p ON e.src = p.doc_id
                WHERE p.degree > 0
                GROUP BY e.dst
            ),
            pr_it{_k} AS (
                SELECT nd.doc_id, nd.degree,
                       CAST({_pr_teleport}
                            + ({_pr_dn} * (COALESCE(s.insum, 0)
                                           + (SELECT dn FROM pr_dang{_k})))
                              // {_pr_dd}
                            AS BIGINT) AS r
                FROM pr_nodes nd
                LEFT JOIN pr_in{_k} s ON nd.doc_id = s.dst
            )"""
        )
    pagerank_sql = (
        "WITH "
        + ",\n            ".join(pr_ctes)
        + "\n            SELECT doc_id, degree, r AS pagerank_e12 FROM pr_it3"
    )
    d = {
        # ------------------------------------------- stats (round 6)
        # exact integer sufficient statistics (HUGEINT here,
        # decimal(38,0) on the Spark side) assembled into corr/covar/
        # slope in IEEE doubles at the very end — bit-identical inputs,
        # bit-identical doubles, rnd-floored for belt and braces
        "stats_corr_price_qty": f"""
            WITH base AS (
                SELECT l_returnflag,
                       CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
                FROM lineitem
            ),
            s AS (
                SELECT l_returnflag,
                       CAST(COUNT(*) AS HUGEINT) AS n,
                       CAST(SUM(x) AS HUGEINT) AS sx,
                       CAST(SUM(y) AS HUGEINT) AS sy,
                       CAST(SUM(x * y) AS HUGEINT) AS sxy,
                       CAST(SUM(x * x) AS HUGEINT) AS sxx,
                       CAST(SUM(y * y) AS HUGEINT) AS syy
                FROM base GROUP BY l_returnflag
            )
            SELECT l_returnflag,
                   CAST(n AS BIGINT) AS n_items,
                   {_util_rnd_sql(
                       "CAST(n*sxy - sx*sy AS DOUBLE)"
                       " / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))"
                       " * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))", 6)}
                       AS corr_qty_price,
                   {_util_rnd_sql(
                       "CAST(n*sxy - sx*sy AS DOUBLE)"
                       " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))"
                       " / 10000", 4)} AS covar_qty_price
            FROM s ORDER BY l_returnflag
        """,
        "stats_delay_regression": f"""
            WITH base AS (
                SELECT o.o_orderpriority,
                       CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) AS x,
                       CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) AS BIGINT) AS y
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            ),
            s AS (
                SELECT o_orderpriority,
                       CAST(COUNT(*) AS HUGEINT) AS n,
                       CAST(SUM(x) AS HUGEINT) AS sx,
                       CAST(SUM(y) AS HUGEINT) AS sy,
                       CAST(SUM(x * y) AS HUGEINT) AS sxy,
                       CAST(SUM(x * x) AS HUGEINT) AS sxx,
                       CAST(SUM(y * y) AS HUGEINT) AS syy
                FROM base GROUP BY o_orderpriority
            ),
            d AS (
                SELECT o_orderpriority, CAST(n AS BIGINT) AS n_items,
                       CAST(n*sxy - sx*sy AS DOUBLE) AS cov,
                       CAST(n*sxx - sx*sx AS DOUBLE) AS varx,
                       CAST(n*syy - sy*sy AS DOUBLE) AS vary,
                       CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd,
                       CAST(n AS DOUBLE) AS nd
                FROM s
            )
            SELECT o_orderpriority, n_items,
                   {_util_rnd_sql("(cov / varx) * 100", 6)}
                       AS slope_days_per_unit,
                   {_util_rnd_sql("(syd - (cov / varx) * sxd) / nd", 6)}
                       AS intercept_days,
                   {_util_rnd_sql(
                       "(cov / (sqrt(varx) * sqrt(vary)))"
                       " * (cov / (sqrt(varx) * sqrt(vary)))", 6)} AS r2
            FROM d ORDER BY o_orderpriority
        """,
        # the stats-pruned ManagedTable scan must equal the plain filter
        "table_zorder_scan": managed_scan.table_zorder_scan_oracle(),
        # the automatic (SQL WHERE → Catalyst pushdown) path must too
        "table_zorder_scan_sql": managed_scan.table_zorder_scan_sql_oracle(),
        "table_bloom_scan": managed_scan.table_bloom_scan_oracle(),
        "table_cluster_scan": managed_scan.table_cluster_scan_oracle(),
        "table_convert_scan": managed_scan.table_convert_scan_oracle(),
        "table_cdf_staged_scan":
            managed_scan.table_cdf_staged_scan_oracle(),
        # blind-append rebase: both racing appends must land exactly once
        "table_append_race": managed_scan.table_append_race_oracle(),
        "table_disjoint_merge_race":
            managed_scan.table_disjoint_merge_race_oracle(),
        "table_unpartitioned_race":
            managed_scan.table_unpartitioned_race_oracle(),
        "table_optimize_race": managed_scan.table_optimize_race_oracle(),
        "table_merge_on_read": managed_scan.table_merge_on_read_oracle(),
        "table_cow_race": managed_scan.table_cow_race_oracle(),
        "table_file_cow_race": managed_scan.table_file_cow_race_oracle(),
        "table_sparse_bloom_race":
            managed_scan.table_sparse_bloom_race_oracle(),
        "table_identity_merge_dv":
            managed_scan.table_identity_merge_dv_oracle(),
        "table_row_tracking_scan":
            managed_scan.table_row_tracking_scan_oracle(),
        "table_row_versions_scan":
            managed_scan.table_row_versions_scan_oracle(),
        "table_generated_scan": managed_scan.table_generated_scan_oracle(),
        "table_copy_into": managed_scan.table_copy_into_oracle(),
        # distribution-shape operators ≡ their naive relational forms
        "op_assign_row_ids": rowid.op_assign_row_ids_oracle(),
        "data_epoch_shuffle": shuffle.data_epoch_shuffle_oracle(),
        "join_skew_salted": skew.join_skew_salted_oracle(),
        # SQL DELETE/UPDATE/MERGE through the DV merge-on-read path
        # must reach the same fixpoint as the relational replay
        "table_sql_dml": sql_dml_query.table_sql_dml_oracle(),
        "table_replace_where": sql_dml_query.table_replace_where_oracle(),
        "table_merge_sync": sql_dml_query.table_merge_sync_oracle(),
        "table_dml_subquery": sql_dml_query.table_dml_subquery_oracle(),
        # the incremental CDF must equal the delete's relational row set
        "table_cdf": sql_dml_query.table_cdf_oracle(),
        # incremental MV ≡ from-scratch GROUP BY over the replayed DML
        "table_mv_incremental": mv_pipeline.table_mv_oracle(),
        "table_apply_changes_scd1":
            cdc_pipeline.table_apply_changes_scd1_oracle(),
        "table_apply_changes_scd2":
            cdc_pipeline.table_apply_changes_scd2_oracle(),
        "table_scd2_track_history":
            cdc_pipeline.table_scd2_track_history_oracle(),
        "table_apply_snapshot_scd1":
            cdc_pipeline.table_apply_snapshot_scd1_oracle(),
        "table_apply_snapshot_scd2":
            cdc_pipeline.table_apply_snapshot_scd2_oracle(),
        # additive micro-batch merging must reconstruct the global
        # GROUP BY exactly (integer cents, txn-watermark exactly-once)
        "stream_gold_counts_table": """
            SELECT event_type,
                   CAST(CAST(CAST(CAST(ts AS TIMESTAMP_NS) AS DATE)
                        AS TIMESTAMP) AS TIMESTAMP_NS) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) / 100 AS total_value
            FROM events
            GROUP BY 1, 2
        """,
        # a stream drained FROM the managed table (version-window file
        # planning) must deliver exactly the union of its commits
        "stream_table_source": streaming.stream_table_source_oracle(),
        # the streamed change feed must be the exact attributed multiset
        "stream_table_cdf": streaming.stream_table_cdf_oracle(),
        # Auto-Loader drain (twice, second = full re-delivery) must
        # hold exactly one copy of every order
        "stream_copy_into": streaming.stream_copy_into_oracle(),
        "stream_apply_changes": streaming.stream_apply_changes_oracle(),
        # streamed expectations: observed metrics + enforcement hashed
        "stream_expectations": streaming.stream_expectations_oracle(),
        # ---------------------------------------------------------- gold
        "gold_customer_breakdown": """
            SELECT c.c_mktsegment, n.n_name, COUNT(*) AS customer_count
            FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        """,
        "gold_customer_status_by_city": """
            WITH ranked AS (
                SELECT o_custkey, o_orderstatus,
                       RANK() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC) AS rk
                FROM orders
            )
            SELECT l.o_orderstatus AS latest_order_status, c.c_mktsegment,
                   COUNT(*) AS customer_count
            FROM customer c
            LEFT JOIN (SELECT * FROM ranked WHERE rk = 1) l
              ON c.c_custkey = l.o_custkey
            GROUP BY 1, 2
        """,
        "gold_orders_by_city": """
            SELECT n.n_name,
                   year(o.o_orderdate) AS order_year,
                   month(o.o_orderdate) AS order_month,
                   COUNT(o.o_orderkey) AS order_count,
                   floor(CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                              AS BIGINT)
                         / COUNT(o.o_totalprice) / 100 * 100 + 0.5) / 100
                       AS avg_total_price
            FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3
        """,
        "gold_orders_by_customer_week": """
            SELECT o.o_custkey,
                   year(o.o_orderdate) AS order_year,
                   weekofyear(o.o_orderdate) AS order_week,
                   c.c_mktsegment,
                   COUNT(o.o_orderkey) AS order_count
            FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2, 3, 4
        """,
        "gold_orders_delivery_time": """
            SELECT o.o_orderpriority,
                   date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) AS ship_delay_days,
                   year(o.o_orderdate) AS order_year,
                   COUNT(*) AS line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 3
        """,
        # ------------------------------------------------------ dashboard
        "dash_top_nations_by_segment": """
            SELECT n.n_name, COUNT(*) AS customer_count
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY n.n_name
            ORDER BY customer_count DESC, n.n_name
            LIMIT 5
        """,
        "dash_customer_share_by_segment": """
            WITH counts AS (
                SELECT c.c_mktsegment, n.n_name, COUNT(*) AS customer_count
                FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                GROUP BY 1, 2
            )
            SELECT c_mktsegment, n_name, customer_count,
                   floor(customer_count / SUM(customer_count)
                         OVER (PARTITION BY c_mktsegment) * 100 * 100 + 0.5) / 100
                       AS pct_of_segment
            FROM counts
        """,
        "dash_low_order_customers": """
            SELECT o.o_custkey, COUNT(*) AS order_count
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE year(o.o_orderdate) = 1995
              AND weekofyear(o.o_orderdate) = 28
              AND c.c_mktsegment = 'MACHINERY'
            GROUP BY o.o_custkey
            HAVING COUNT(*) < 5
        """,
        "dash_avg_delivery_by_nation": """
            WITH per_year AS (
                SELECT n.n_name, year(o.o_orderdate) AS order_year,
                       CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE))) AS BIGINT) AS sum_delay,
                       COUNT(*) AS line_count
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                GROUP BY 1, 2
            )
            SELECT n_name,
                   floor(CAST(SUM(sum_delay) AS BIGINT)
                         / CAST(SUM(line_count) AS BIGINT) * 100 + 0.5) / 100
                       AS weighted_avg_delay,
                   CAST(SUM(line_count) AS BIGINT) AS line_count
            FROM per_year
            GROUP BY n_name
        """,
        "dash_late_orders_by_priority": """
            WITH total AS (
                SELECT o_orderpriority, COUNT(*) AS total_orders
                FROM orders GROUP BY 1
            ),
            late AS (
                SELECT o.o_orderpriority,
                       COUNT(DISTINCT o.o_orderkey) AS late_orders
                FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) > 7
                GROUP BY 1
            )
            SELECT t.o_orderpriority, t.total_orders, l.late_orders,
                   floor(l.late_orders / t.total_orders * 100 * 100 + 0.5) / 100
                       AS late_pct
            FROM total t JOIN late l ON t.o_orderpriority = l.o_orderpriority
        """,
        # ---------------------------------------------------------- tpch
        "tpch_q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(SUM({ep_c}) AS BIGINT) / 100 AS sum_base_price,
                   CAST(SUM({disc_price_e4}) AS BIGINT) / 10000 AS sum_disc_price,
                   CAST(SUM({charge_e6}) AS BIGINT) / 1000000 AS sum_charge,
                   floor(CAST(SUM(l_quantity) AS BIGINT) / COUNT(*) * 100 + 0.5)
                       / 100 AS avg_qty,
                   floor(CAST(SUM({ep_c}) AS BIGINT) / COUNT(*) / 100 * 100 + 0.5)
                       / 100 AS avg_price,
                   floor(CAST(SUM({disc_c}) AS BIGINT) / COUNT(*) / 100 * 10000 + 0.5)
                       / 10000 AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3_shipping_priority": f"""
            SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
                   o.o_orderpriority,
                   CAST(SUM({disc_price_e4.replace("l_", "l.l_")}) AS BIGINT)
                       / 10000 AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-03-15'
              AND l.l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o.o_orderkey
            LIMIT 10
        """,
        "tpch_q5_local_supplier_volume": f"""
            SELECT n.n_name,
                   CAST(SUM({disc_price_e4.replace("l_", "l.l_")}) AS BIGINT)
                       / 10000 AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n.n_name
        """,
        "tpch_q6_forecast_revenue": f"""
            SELECT CAST(SUM({ep_c} * {disc_c}) AS BIGINT) / 10000 AS revenue,
                   COUNT(*) AS line_count
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.02 AND l_discount <= 0.04
              AND l_quantity < 24
        """,
        "tpch_q4_order_priority": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
            GROUP BY o_orderpriority
        """,
        "tpch_q7_volume_shipping": f"""
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM({disc_price_e4.replace("l_", "l.l_")}) AS BIGINT)
                       / 10000 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "tpch_q8_market_share": f"""
            WITH vols AS (
                SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                       n2.n_name AS supp_nation,
                       {disc_price_e4.replace("l_", "l.l_")} AS vol
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
                JOIN region r ON n1.n_regionkey = r.r_regionkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
                WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
                  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o.o_orderdate < TIMESTAMP '1998-01-01'
            )
            SELECT o_year,
                   floor(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                                       THEN vol ELSE 0 END) AS BIGINT)
                         / CAST(SUM(vol) AS BIGINT) * 1000000 + 0.5) / 1000000
                       AS mkt_share
            FROM vols GROUP BY o_year
        """,
        "tpch_q9_product_profit": f"""
            SELECT n.n_name AS nation,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM({disc_price_e4.replace("l_", "l.l_")}) AS BIGINT)
                       / 10000 AS profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE p.p_name LIKE '%widget%'
            GROUP BY 1, 2
        """,
        "tpch_q10_returned_items": f"""
            SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                   CAST(SUM({disc_price_e4.replace("l_", "l.l_")}) AS BIGINT)
                       / 10000 AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_returnflag = 'R'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c.c_custkey
            LIMIT 20
        """,
        "tpch_q13_customer_distribution": """
            WITH per_cust AS (
                SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                                  AND o.o_orderpriority <> '5-LOW'
                GROUP BY c.c_custkey
            )
            SELECT c_count, COUNT(*) AS custdist
            FROM per_cust
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q14_promo_revenue": f"""
            SELECT floor(100 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN {disc_price_e4.replace("l_", "l.l_")}
                                 ELSE 0 END) AS BIGINT)
                         / CAST(SUM({disc_price_e4.replace("l_", "l.l_")})
                                AS BIGINT) * 10000 + 0.5) / 10000
                       AS promo_revenue
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
              AND l.l_shipdate < TIMESTAMP '1997-10-01'
        """,
        "tpch_q15_top_supplier": f"""
            WITH revenue AS (
                SELECT l_suppkey,
                       CAST(SUM({disc_price_e4}) AS BIGINT) AS rev_e4
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name, r.rev_e4 / 10000 AS total_revenue
            FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
            WHERE r.rev_e4 = (SELECT MAX(rev_e4) FROM revenue)
        """,
        "tpch_q17_small_quantity_revenue": f"""
            WITH per_part AS (
                SELECT l_partkey,
                       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                           / COUNT(*) AS avg_qty
                FROM lineitem GROUP BY l_partkey
            )
            SELECT floor(CAST(SUM({ep_c.replace("l_", "l.l_")}) AS BIGINT)
                         / 100 / 7 * 100 + 0.5) / 100 AS avg_yearly
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN per_part a ON l.l_partkey = a.l_partkey
            WHERE p.p_brand = 'Brand#12'
              AND l.l_quantity < 0.2 * a.avg_qty
        """,
        "tpch_q18_large_volume_customers": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
            )
            SELECT c.c_name, c.c_custkey, o.o_orderkey,
                   CAST(o.o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
                   o.o_totalprice, b.total_qty
            FROM big b
            JOIN orders o ON b.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 100
        """,
        "tpch_q19_discounted_revenue": f"""
            SELECT CAST(SUM({disc_price_e4.replace("l_", "l.l_")}) AS BIGINT)
                       / 10000 AS revenue,
                   COUNT(*) AS line_count
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#18' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q12_shipping_modes": """
            SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                       CAST(l.l_shipdate AS DATE)) <= 30
                            THEN 'on_time'
                        WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                       CAST(l.l_shipdate AS DATE)) <= 60
                            THEN 'late'
                        ELSE 'very_late' END AS lateness_band,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        "tpch_q21_suppliers_kept_waiting": """
            WITH late AS (
                SELECT l.l_orderkey, l.l_suppkey
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            )
            SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
            FROM late l1
            JOIN supplier s ON l1.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_3'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM late l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey)
            GROUP BY 1, 2
            ORDER BY numwait DESC, s.s_suppkey
            LIMIT 25
        """,
        "tpch_q22_sales_opportunity": """
            WITH in_scope AS (
                SELECT c_custkey, c_nationkey,
                       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
                FROM customer
                WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6) AND c_acctbal > 0
            ),
            stats AS (
                SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
                       COUNT(*) AS n_bal
                FROM in_scope
            )
            SELECT i.c_nationkey AS nationkey, COUNT(*) AS numcust,
                   CAST(SUM(i.bal_cents) AS BIGINT) / 100 AS totacctbal
            FROM in_scope i, stats
            WHERE i.bal_cents * stats.n_bal > stats.sum_cents
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = i.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '1999-01-01')
            GROUP BY i.c_nationkey
        """,
        # first-order Markov transition matrix over per-user sequences;
        # gap mean divides exact integer microseconds in oracle order
        "events_transition_matrix": """
            WITH seq AS (
                SELECT event_type,
                       epoch_us(ts) AS us,
                       LEAD(event_type) OVER w AS to_type,
                       epoch_us(LEAD(ts) OVER w) AS to_us
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_type AS from_type, to_type,
                   COUNT(*) AS n_transitions,
                   floor((CAST(SUM(to_us - us) AS BIGINT) / COUNT(*)
                          / 1000000) * 1000 + 0.5) / 1000 AS avg_gap_s
            FROM seq
            WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        """,
        # Pareto/ABC: exact integer-cents cumsum over a total order;
        # class thresholds compare integers (cum*100 vs total*70)
        "agg_revenue_pareto": """
            WITH pc AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                            AS BIGINT) AS rev_c
                FROM orders GROUP BY 1
            ),
            tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS total_c FROM pc),
            ranked AS (
                SELECT o_custkey, rev_c,
                       ROW_NUMBER() OVER w AS rank,
                       CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT) AS cum_c
                FROM pc
                WINDOW w AS (ORDER BY rev_c DESC, o_custkey)
            )
            SELECT o_custkey, rank, rev_c / 100 AS revenue,
                   floor((cum_c / total_c) * 1000000 + 0.5) / 1000000
                       AS cum_share,
                   CASE WHEN cum_c * 100 <= total_c * 70 THEN 'A'
                        WHEN cum_c * 100 <= total_c * 90 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM ranked, tot
        """,
        # per-source duplication report on exact content digests
        "dedup_ratio_by_source": f"""
            SELECT source, COUNT(*) AS n_docs,
                   COUNT(DISTINCT md5({_NORM})) AS n_distinct,
                   floor(((COUNT(*) - COUNT(DISTINCT md5({_NORM})))
                          / COUNT(*)) * 1000000 + 0.5) / 1000000
                       AS dup_ratio
            FROM documents
            GROUP BY 1
        """,
        # top-k 3-event paths; ties break on the path string
        "events_path_topk": """
            WITH seq AS (
                SELECT event_type,
                       LEAD(event_type, 1) OVER w AS t2,
                       LEAD(event_type, 2) OVER w AS t3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_type || ' > ' || t2 || ' > ' || t3 AS path,
                   COUNT(*) AS n_paths
            FROM seq
            WHERE t2 IS NOT NULL AND t3 IS NOT NULL
            GROUP BY 1
            ORDER BY n_paths DESC, path
            LIMIT 20
        """,
        # ------------------------- Python UDAF / UDTF API-class demos
        # weighted mean from exact int64 numerator/denominator — the
        # pandas GROUPED_AGG result is the same IEEE division
        "udaf_weighted_delay": """
            SELECT o_orderpriority,
                   floor((CAST(SUM(delay * qty) AS BIGINT)
                          / CAST(SUM(qty) AS BIGINT)) * 10000 + 0.5)
                       / 10000 AS weighted_avg_delay
            FROM (
                SELECT o.o_orderpriority,
                       date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) AS delay,
                       CAST(l.l_quantity AS BIGINT) AS qty
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            )
            GROUP BY 1
        """,
        # word bigrams: tokenizer pinned to the explicit ASCII class
        # [ \t\n\r\f] on BOTH sides (the Python UDTF uses the same
        # literal class; str.split/RE2-\s differ on non-ASCII
        # whitespace — ADVICE r05)
        "udtf_word_bigrams": _BIGRAMS_SQL,
        # the built-in production shape emits the identical relation
        "text_word_bigrams": _BIGRAMS_SQL,
        # exact-integer LM familiarity: the oracle computes
        # floor(log2(cnt)) integrally too (length(bin(cnt)) - 1), not
        # via float log2 — double log2 of counts just below a power of
        # two at large magnitude rounds UP to the integer (e.g.
        # floor(log2(2^60-1)) = 60 in doubles vs 59 exactly), so the
        # float spelling is only boundary-exact below ~2^48 (ADVICE
        # r07); bit-length is exact for every positive BIGINT
        # BPE token accounting: training replayed by the reference
        # in-memory trainer at oracle-construction time (see
        # _bpe_vocab_values); the SQL verifies the corpus-side
        # relational computation — tokenize, vocabulary join, per-doc
        # aggregation, whitespace twin
        "text_token_counts_bpe": f"""
            WITH fp AS (
                SELECT {_BPE_FP_EXPR} AS f FROM documents
            ),
            vocab_all(f, w, n) AS (VALUES
                {_bpe_vocab_values()}
            ),
            vocab AS (
                SELECT w, n FROM vocab_all JOIN fp ON vocab_all.f = fp.f
            ),
            t AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                           x -> x <> '') AS toks
                FROM documents
            ),
            words AS (SELECT doc_id, unnest(toks) AS w FROM t),
            bpe AS (
                SELECT words.doc_id, SUM(vocab.n) AS bpe
                FROM words JOIN vocab USING (w)
                GROUP BY words.doc_id
            )
            SELECT t.doc_id,
                   CAST(COALESCE(bpe.bpe, 0) AS BIGINT) AS bpe_tokens,
                   CAST(len(t.toks) AS BIGINT) AS ws_tokens
            FROM t LEFT JOIN bpe USING (doc_id)
        """,
        # span-level exact substring dedup: same k-gram seed, repeated-
        # gram semi-join, and gaps-and-islands merge as the Spark side
        "text_dup_spans": _SPAN_DEDUP_SQL + """
            SELECT doc_id,
                   CAST(MIN(p) AS BIGINT) AS span_start,
                   CAST(MAX(e) AS BIGINT) AS span_end,
                   CAST(MAX(e) - MIN(p) + 1 AS BIGINT) AS span_tokens
            FROM isl
            GROUP BY doc_id, island
            ORDER BY doc_id, span_start
        """,
        "text_dedup_substrings": _SPAN_DEDUP_SQL + """
            , spans AS (
                SELECT doc_id,
                       MAX(e) - MIN(p) + 1 AS span_tokens
                FROM isl GROUP BY doc_id, island
            ),
            per_doc AS (
                SELECT doc_id, SUM(span_tokens) AS dup_tokens,
                       COUNT(*) AS n_spans
                FROM spans GROUP BY doc_id
            )
            SELECT t.doc_id,
                   CAST(len(t.toks) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(per_doc.dup_tokens, 0) AS BIGINT)
                       AS dup_tokens,
                   CAST(COALESCE(per_doc.n_spans, 0) AS BIGINT) AS n_spans,
                   CAST(len(t.toks) - COALESCE(per_doc.dup_tokens, 0)
                        AS BIGINT) AS kept_tokens
            FROM t LEFT JOIN per_doc USING (doc_id)
            ORDER BY t.doc_id
        """,
        "text_lm_familiarity": f"""
            WITH bi AS ({_BIGRAMS_SQL}),
            counts AS (
                SELECT bigram, COUNT(*) AS cnt FROM bi GROUP BY bigram
            )
            SELECT bi.doc_id,
                   COUNT(*) AS n_bigrams,
                   CAST(SUM(length(bin(CAST(cnt AS BIGINT))) - 1)
                        AS BIGINT) AS familiarity
            FROM bi JOIN counts USING (bigram)
            GROUP BY bi.doc_id
            ORDER BY bi.doc_id
        """,
        # ------------------- derived-partsupp TPC-H (q2/q11/q16/q20)
        "tpch_q2_min_cost_supplier": f"""
            WITH {_PARTSUPP_CTE},
            quotes AS (
                SELECT ps.ps_partkey, p.p_brand, s.s_name, n.n_name,
                       s.s_acctbal,
                       CAST(floor(ps.ps_supplycost * 100 + 0.5) AS BIGINT)
                           AS cost_c
                FROM partsupp ps
                JOIN (SELECT p_partkey, p_brand FROM part
                      WHERE p_type = 'ECONOMY' AND p_size <= 10) p
                     ON ps.ps_partkey = p.p_partkey
                JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                     AND r.r_name = 'EUROPE'
            ),
            mc AS (SELECT ps_partkey, MIN(cost_c) AS min_cost_c
                   FROM quotes GROUP BY 1)
            SELECT q.ps_partkey AS p_partkey, q.p_brand, q.s_name, q.n_name,
                   floor(q.s_acctbal * 100 + 0.5) / 100 AS s_acctbal,
                   q.cost_c / 100 AS supplycost
            FROM quotes q
            JOIN mc ON q.ps_partkey = mc.ps_partkey
                   AND q.cost_c = mc.min_cost_c
            ORDER BY s_acctbal DESC, q.n_name, q.s_name, p_partkey
            LIMIT 100
        """,
        "tpch_q11_important_stock": f"""
            WITH {_PARTSUPP_CTE},
            natps AS (
                SELECT ps.ps_partkey,
                       CAST(floor(ps.ps_supplycost * 100 + 0.5) AS BIGINT)
                           * ps.ps_availqty AS value_c
                FROM partsupp ps
                JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                     AND n.n_name = 'NATION_3'
            ),
            pp AS (SELECT ps_partkey,
                          CAST(SUM(value_c) AS BIGINT) AS part_value_c
                   FROM natps GROUP BY 1),
            tot AS (SELECT CAST(SUM(part_value_c) AS BIGINT) AS total_c
                    FROM pp)
            SELECT ps_partkey, part_value_c / 100 AS stock_value
            FROM pp, tot
            WHERE part_value_c * 1000 > total_c
        """,
        "tpch_q16_supplier_part_counts": f"""
            WITH {_PARTSUPP_CTE}
            SELECT p.p_brand, p.p_type, p.p_size,
                   COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
            FROM partsupp ps
            JOIN part p ON ps.ps_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#2' AND p.p_type <> 'SMALL'
              AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
            GROUP BY 1, 2, 3
        """,
        "tpch_q20_excess_stock_suppliers": f"""
            WITH {_PARTSUPP_CTE},
            shipped AS (
                SELECT l_partkey, l_suppkey,
                       CAST(SUM(l_quantity) AS BIGINT) AS qty_shipped
                FROM lineitem
                WHERE year(l_shipdate) = 1996
                GROUP BY 1, 2
            ),
            excess AS (
                SELECT DISTINCT ps.ps_suppkey
                FROM partsupp ps
                JOIN (SELECT p_partkey FROM part
                      WHERE p_name LIKE 'small%') p
                     ON ps.ps_partkey = p.p_partkey
                JOIN shipped sh ON ps.ps_partkey = sh.l_partkey
                              AND ps.ps_suppkey = sh.l_suppkey
                WHERE ps.ps_availqty * 2 > sh.qty_shipped
            )
            SELECT s.s_suppkey, s.s_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
                 AND n.n_name = 'NATION_3'
            JOIN excess e ON s.s_suppkey = e.ps_suppkey
        """,
        # ------------------------------------------ stretch aggregates
        # r09: the approx twins are hash-checked via deterministic-bound
        # verdicts — the sketch estimate must land inside its published
        # error bound of the exact value (stable for fixed input), and
        # the oracle asserts the flag TRUE next to the exact anchors
        "agg_distinct_counts_approx": """
            SELECT o_orderstatus,
                   COUNT(DISTINCT o_custkey) AS exact_customers,
                   TRUE AS approx_within_3rsd
            FROM orders
            GROUP BY o_orderstatus
        """,
        "agg_delay_percentiles_approx": """
            SELECT o.o_orderpriority,
                   COUNT(*) AS line_count,
                   TRUE AS p50_within_bound,
                   TRUE AS p90_within_bound
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "agg_distinct_counts": """
            SELECT o_orderstatus,
                   COUNT(DISTINCT o_custkey) AS exact_customers
            FROM orders
            GROUP BY o_orderstatus
        """,
        "agg_order_gaps": """
            WITH g AS (
                SELECT o_custkey,
                       date_diff('day',
                           CAST(LAG(o_orderdate) OVER (
                               PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS DATE),
                           CAST(o_orderdate AS DATE)) AS gap_days
                FROM orders
            )
            SELECT c.c_mktsegment,
                   floor(CAST(SUM(gap_days) AS BIGINT) / COUNT(*) * 100 + 0.5)
                       / 100 AS avg_gap_days,
                   CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
                   COUNT(*) AS n_gaps
            FROM g JOIN customer c ON g.o_custkey = c.c_custkey
            WHERE gap_days IS NOT NULL
            GROUP BY 1
        """,
        # batch sessionization (ext/json_ops.events_sessionize):
        # gaps-and-islands with a microsecond-exact interval cut and a
        # (ts, event_id) tie-break so both engines number sessions
        # identically
        "events_sessionize": """
            WITH e AS (
                SELECT user_id, event_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
                FROM events
            ),
            m AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN prev IS NULL
                                 OR ts > prev + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_new
                FROM e
            ),
            s AS (
                SELECT user_id, ts,
                       CAST(SUM(is_new) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS sess_no
                FROM m
            )
            SELECT user_id, sess_no,
                   CAST(min(ts) AS TIMESTAMP_NS) AS session_start,
                   CAST(max(ts) AS TIMESTAMP_NS) AS session_end,
                   COUNT(*) AS event_count
            FROM s GROUP BY 1, 2
        """,
        # spend quartiles (queries/aggregates.agg_customer_quartiles):
        # ntile over the aggregated per-customer relation with a total
        # order; DuckDB ntile is BIGINT, cast to INT to match Spark
        "agg_customer_quartiles": f"""
            WITH spend AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS BIGINT) AS spend_cents
                FROM orders GROUP BY 1
            ),
            q AS (
                SELECT *, CAST(ntile(4) OVER (ORDER BY spend_cents DESC,
                               o_custkey ASC) AS INT) AS quartile
                FROM spend
            )
            SELECT quartile, COUNT(*) AS n_customers,
                   CAST(SUM(spend_cents) AS BIGINT) / 100 AS total_spend,
                   {_util_rnd_sql("CAST(SUM(spend_cents) AS BIGINT) / 100 / COUNT(*)", 2)}
                       AS avg_spend
            FROM q GROUP BY 1
        """,
        # calendar densification + LOCF (queries/aggregates.py
        # agg_daily_revenue_gapfill): generate_series spine × distinct
        # priorities, left join, IGNORE NULLS carry-forward window
        "agg_daily_revenue_gapfill": """
            WITH daily AS (
                SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
                       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS BIGINT) AS rev_cents
                FROM orders GROUP BY 1, 2
            ),
            b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                         max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
            days_t AS (
                SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                            AS DATE) AS day
                FROM b
            ),
            spine AS (
                SELECT p.o_orderpriority, d.day
                FROM (SELECT DISTINCT o_orderpriority FROM orders) p
                CROSS JOIN days_t d
            ),
            j AS (
                SELECT s.o_orderpriority, s.day, daily.rev_cents
                FROM spine s LEFT JOIN daily
                  ON s.o_orderpriority = daily.o_orderpriority
                 AND s.day = daily.day
            )
            SELECT o_orderpriority,
                   CAST(CAST(day AS TIMESTAMP) AS TIMESTAMP_NS) AS day,
                   COALESCE(rev_cents, 0) / 100 AS daily_revenue,
                   rev_cents IS NOT NULL AS has_orders,
                   COALESCE(LAST_VALUE(rev_cents IGNORE NULLS) OVER (
                        PARTITION BY o_orderpriority ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        0) / 100 AS revenue_locf
            FROM j
        """,
        "agg_rolling_revenue": """
            WITH daily AS (
                SELECT CAST(o_orderdate AS DATE) AS day,
                       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                            AS BIGINT) AS rev_cents
                FROM orders GROUP BY 1
            )
            SELECT CAST(CAST(day AS TIMESTAMP) AS TIMESTAMP_NS) AS day,
                   rev_cents / 100 AS daily_revenue,
                   CAST(SUM(rev_cents) OVER (
                       ORDER BY date_diff('day', DATE '1995-01-01', day)
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                       / 100 AS rolling_7d_revenue
            FROM daily
        """,
        "agg_rollup_customers": """
            SELECT c.c_mktsegment, n.n_name, COUNT(*) AS customer_count,
                   GROUPING(c.c_mktsegment, n.n_name) AS grouping_level
            FROM customer c
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY ROLLUP(c.c_mktsegment, n.n_name)
        """,
        "agg_cube_orders": f"""
            SELECT o_orderstatus, year(o_orderdate) AS order_year,
                   COUNT(*) AS order_count,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) / 100 AS total_price,
                   GROUPING(o_orderstatus, year(o_orderdate)) AS grouping_level
            FROM orders
            GROUP BY CUBE(o_orderstatus, year(o_orderdate))
        """,
        "agg_grouping_sets": """
            SELECT o_orderpriority,
                   year(o_orderdate) AS order_year,
                   COUNT(*) AS order_count,
                   GROUPING(o_orderpriority) + 2 * GROUPING(year(o_orderdate))
                       AS grouping_level
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority, year(o_orderdate)),
                                    (o_orderpriority), ())
        """,
        "agg_pivot_status_by_segment": """
            SELECT year(o_orderdate) AS order_year,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_open,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_filled,
                   CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_partial
            FROM orders
            GROUP BY 1
        """,
        # unpivot: the pivot matrix melted back to long form
        "agg_unpivot_status": """
            WITH wide AS (
                SELECT year(o_orderdate) AS order_year,
                       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_open,
                       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_filled,
                       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_partial
                FROM orders
                GROUP BY 1
            )
            SELECT order_year, s.status,
                   CASE s.status WHEN 'O' THEN n_open
                                 WHEN 'F' THEN n_filled
                                 ELSE n_partial END AS n_orders
            FROM wide, (SELECT UNNEST(['O', 'F', 'P']) AS status) s
        """,
        # fixed-width histogram on exact integer-cents bin assignment
        # (floor form, not //: DuckDB's // truncates, Spark floors)
        "agg_value_histogram": """
            SELECT event_type,
                   CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT)
                              / 5000.0) AS BIGINT) AS bin_id,
                   CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT)
                              / 5000.0) AS BIGINT) * 50.0 AS bin_low,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY 1, 2, 3
        """,
        "set_ops_customers": """
            WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                         WHERE year(o_orderdate) = 1995),
                 y96 AS (SELECT DISTINCT o_custkey FROM orders
                         WHERE year(o_orderdate) = 1996)
            SELECT o_custkey, 'both_years' AS cohort
            FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
            UNION ALL
            SELECT o_custkey, 'only_1995'
            FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
            UNION ALL
            SELECT o_custkey, 'only_1996'
            FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
        """,
        "agg_delay_percentiles": """
            SELECT o.o_orderpriority,
                   floor(quantile_cont(date_diff('day',
                         CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)), 0.5) * 100 + 0.5) / 100
                       AS p50_delay,
                   floor(quantile_cont(date_diff('day',
                         CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)), 0.9) * 100 + 0.5) / 100
                       AS p90_delay,
                   COUNT(*) AS line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        # ------------------------------------- behavioral analytics + robust
        # stats + embedding quantization (round 4, second session)
        "events_funnel": """
            WITH firsts AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                       min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                       min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                       min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
                FROM events GROUP BY user_id
            ),
            flags AS (
                SELECT CAST(t_signup IS NOT NULL AS BIGINT) AS r1,
                       CAST(t_signup IS NOT NULL AND t_view IS NOT NULL
                            AND t_view > t_signup AS BIGINT) AS s2,
                       CAST(t_view IS NOT NULL AND t_click IS NOT NULL
                            AND t_click > t_view AS BIGINT) AS s3,
                       CAST(t_click IS NOT NULL AND t_purchase IS NOT NULL
                            AND t_purchase > t_click AS BIGINT) AS s4
                FROM firsts
            ),
            totals AS (
                SELECT CAST(SUM(r1) AS BIGINT) AS u1,
                       CAST(SUM(r1 * s2) AS BIGINT) AS u2,
                       CAST(SUM(r1 * s2 * s3) AS BIGINT) AS u3,
                       CAST(SUM(r1 * s2 * s3 * s4) AS BIGINT) AS u4
                FROM flags
            ),
            stages AS (
                SELECT CAST(1 AS BIGINT) AS stage_no, 'signup' AS stage,
                       u1 AS users, u1 FROM totals
                UNION ALL SELECT 2, 'view', u2, u1 FROM totals
                UNION ALL SELECT 3, 'click', u3, u1 FROM totals
                UNION ALL SELECT 4, 'purchase', u4, u1 FROM totals
            )
            SELECT stage_no, stage, users,
                   floor(users * 100.0 / u1 * 100 + 0.5) / 100 AS pct_of_entry
            FROM stages
        """,
        "events_retention": """
            WITH ev AS (
                SELECT user_id, CAST(ts AS DATE) AS day FROM events
            ),
            firsts AS (
                SELECT user_id, min(day) AS cohort_date FROM ev GROUP BY user_id
            ),
            activity AS (SELECT DISTINCT user_id, day FROM ev),
            matrix AS (
                SELECT f.cohort_date,
                       CAST(date_diff('day', f.cohort_date, a.day) AS BIGINT)
                           AS day_offset,
                       CAST(COUNT(*) AS BIGINT) AS active_users
                FROM activity a JOIN firsts f ON a.user_id = f.user_id
                WHERE date_diff('day', f.cohort_date, a.day) < 14
                GROUP BY 1, 2
            ),
            sizes AS (
                SELECT cohort_date, CAST(COUNT(*) AS BIGINT) AS cohort_size
                FROM firsts GROUP BY cohort_date
            )
            SELECT m.cohort_date, m.day_offset, m.active_users,
                   floor(m.active_users * 100.0 / s.cohort_size * 100 + 0.5) / 100
                       AS retention_pct
            FROM matrix m JOIN sizes s ON m.cohort_date = s.cohort_date
        """,
        "agg_value_mad": """
            WITH med AS (
                SELECT event_type, quantile_cont(value, 0.5) AS med
                FROM events GROUP BY event_type
            )
            SELECT e.event_type,
                   floor(min(m.med) * 10000 + 0.5) / 10000 AS median_value,
                   floor(quantile_cont(abs(e.value - m.med), 0.5) * 10000 + 0.5)
                       / 10000 AS mad,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events e JOIN med m ON e.event_type = m.event_type
            GROUP BY e.event_type
        """,
        # PQ: same deterministic codebooks (first 16 vectors'
        # subvectors), same sequential squared-L2 fold, same
        # (distance, code) tie order as the Spark argmin struct
        "emb_pq_codes": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            subs AS (
                SELECT vec_id, CAST(u.s AS INT) AS sub_id,
                       e.v[u.s * 16 + 1 : u.s * 16 + 16] AS sv
                FROM e, UNNEST(range(0, 4)) AS u(s)
            ),
            books AS (
                SELECT vec_id AS code, sub_id, sv AS c
                FROM subs WHERE vec_id < 16
            ),
            scored AS (
                SELECT subs.vec_id, subs.sub_id, books.code,
                       list_aggregate(list_transform(range(1, 17),
                           i -> (subs.sv[i] - books.c[i])
                              * (subs.sv[i] - books.c[i])), 'sum') AS d
                FROM subs JOIN books USING (sub_id)
            ),
            ranked AS (
                SELECT vec_id, sub_id, code, d,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                          ORDER BY d, code) AS rn
                FROM scored
            )
            SELECT vec_id, sub_id, CAST(code AS INT) AS code,
                   floor(d * 1000000 + 0.5) / 1000000 AS dist6
            FROM ranked WHERE rn = 1
            ORDER BY vec_id, sub_id
        """,
        # ADC: the query's exact per-(subspace, code) distance table,
        # summed per vector over its codes in FIXED subspace order
        # (conditional one-element sums — a plain SUM's fold order is
        # engine-dependent and could flip the 6-dp rounding)
        "ann_pq_topk": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            subs AS (
                SELECT vec_id, CAST(u.s AS INT) AS sub_id,
                       e.v[u.s * 16 + 1 : u.s * 16 + 16] AS sv
                FROM e, UNNEST(range(0, 4)) AS u(s)
            ),
            books AS (
                SELECT vec_id AS code, sub_id, sv AS c
                FROM subs WHERE vec_id < 16
            ),
            scored AS (
                SELECT subs.vec_id, subs.sub_id, books.code,
                       list_aggregate(list_transform(range(1, 17),
                           i -> (subs.sv[i] - books.c[i])
                              * (subs.sv[i] - books.c[i])), 'sum') AS d
                FROM subs JOIN books USING (sub_id)
            ),
            codes AS (
                SELECT vec_id, sub_id, code FROM (
                    SELECT vec_id, sub_id, code,
                           ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                              ORDER BY d, code) AS rn
                    FROM scored
                ) WHERE rn = 1
            ),
            q AS (SELECT sub_id, sv AS qv FROM subs WHERE vec_id = 0),
            lut AS (
                SELECT books.sub_id, books.code,
                       list_aggregate(list_transform(range(1, 17),
                           i -> (q.qv[i] - books.c[i])
                              * (q.qv[i] - books.c[i])), 'sum') AS qd
                FROM books JOIN q USING (sub_id)
            ),
            per_vec AS (
                SELECT codes.vec_id,
                       SUM(CASE WHEN codes.sub_id = 0 THEN lut.qd END) AS d0,
                       SUM(CASE WHEN codes.sub_id = 1 THEN lut.qd END) AS d1,
                       SUM(CASE WHEN codes.sub_id = 2 THEN lut.qd END) AS d2,
                       SUM(CASE WHEN codes.sub_id = 3 THEN lut.qd END) AS d3
                FROM codes
                JOIN lut ON codes.sub_id = lut.sub_id
                        AND codes.code = lut.code
                WHERE codes.vec_id <> 0
                GROUP BY codes.vec_id
            )
            SELECT vec_id,
                   floor((((d0 + d1) + d2) + d3) * 1000000 + 0.5)
                       / 1000000 AS adc_dist6
            FROM per_vec
            ORDER BY adc_dist6 ASC, vec_id
            LIMIT 10
        """,
        # hard negatives: per query (vec_id < 8), top-5 most-similar
        # different-label vectors — same cosine fold + tie order
        "emb_hard_negatives": f"""
            WITH e AS (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            q AS (
                SELECT vec_id AS query_id, label AS q_label, v AS qv
                FROM e WHERE vec_id < 8
            ),
            scored AS (
                SELECT q.query_id, e.vec_id, e.label,
                       ROUND({_cos_sql("e.v", "q.qv")}, 6) AS cosine_sim
                FROM e CROSS JOIN q
                WHERE e.label <> q.q_label
            ),
            ranked AS (
                SELECT query_id, vec_id, label, cosine_sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cosine_sim DESC,
                                                   vec_id) AS rank
                FROM scored
            )
            SELECT query_id, CAST(rank AS INT) AS rank, vec_id, label,
                   cosine_sim
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        # shortlist (ADC order, 100 candidates) -> exact cosine rerank
        "ann_pq_rerank_topk": f"""
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            subs AS (
                SELECT vec_id, CAST(u.s AS INT) AS sub_id,
                       e.v[u.s * 16 + 1 : u.s * 16 + 16] AS sv
                FROM e, UNNEST(range(0, 4)) AS u(s)
            ),
            books AS (
                SELECT vec_id AS code, sub_id, sv AS c
                FROM subs WHERE vec_id < 16
            ),
            scored AS (
                SELECT subs.vec_id, subs.sub_id, books.code,
                       list_aggregate(list_transform(range(1, 17),
                           i -> (subs.sv[i] - books.c[i])
                              * (subs.sv[i] - books.c[i])), 'sum') AS d
                FROM subs JOIN books USING (sub_id)
            ),
            codes AS (
                SELECT vec_id, sub_id, code FROM (
                    SELECT vec_id, sub_id, code,
                           ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                              ORDER BY d, code) AS rn
                    FROM scored
                ) WHERE rn = 1
            ),
            q AS (SELECT sub_id, sv AS qv FROM subs WHERE vec_id = 0),
            lut AS (
                SELECT books.sub_id, books.code,
                       list_aggregate(list_transform(range(1, 17),
                           i -> (q.qv[i] - books.c[i])
                              * (q.qv[i] - books.c[i])), 'sum') AS qd
                FROM books JOIN q USING (sub_id)
            ),
            per_vec AS (
                SELECT codes.vec_id,
                       SUM(CASE WHEN codes.sub_id = 0 THEN lut.qd END) AS d0,
                       SUM(CASE WHEN codes.sub_id = 1 THEN lut.qd END) AS d1,
                       SUM(CASE WHEN codes.sub_id = 2 THEN lut.qd END) AS d2,
                       SUM(CASE WHEN codes.sub_id = 3 THEN lut.qd END) AS d3
                FROM codes
                JOIN lut ON codes.sub_id = lut.sub_id
                        AND codes.code = lut.code
                WHERE codes.vec_id <> 0
                GROUP BY codes.vec_id
            ),
            cand AS (
                SELECT vec_id FROM per_vec
                ORDER BY floor((((d0 + d1) + d2) + d3) * 1000000 + 0.5)
                             / 1000000 ASC, vec_id
                LIMIT 100
            ),
            qf AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT e.vec_id,
                   ROUND({_cos_sql("e.v", "qf.qv")}, 6) AS cosine_sim
            FROM e
            JOIN cand USING (vec_id)
            CROSS JOIN qf
            ORDER BY cosine_sim DESC, e.vec_id
            LIMIT 10
        """,
        "emb_quantize_int8": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            q AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) / 127.0 AS qscale
                FROM e
            ),
            c AS (
                SELECT vec_id, v, qscale,
                       CASE WHEN qscale = 0 THEN list_transform(v, x -> 0)
                            ELSE list_transform(v,
                                 x -> CAST(floor(x / qscale + 0.5) AS INTEGER))
                       END AS codes
                FROM q
            )
            SELECT vec_id,
                   qscale,
                   array_to_string(
                       list_transform(codes, cc -> CAST(cc AS VARCHAR)), ','
                   ) AS codes,
                   CASE WHEN qscale = 0 THEN 0.0
                        ELSE list_max(list_transform(range(1, len(v) + 1),
                             i -> abs(CAST(codes[i] AS DOUBLE) * qscale - v[i])))
                   END AS max_abs_err
            FROM c
        """,
        # ------------------------------- label centroids / k-means / SCD2 /
        # BM25 (round 4, third session)
        "emb_centroid_per_label": """
            WITH e AS (
                SELECT label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            ex AS (
                SELECT label, CAST(i - 1 AS BIGINT) AS dim,
                       CAST(floor(v[i] * 1000000 + 0.5) AS BIGINT) AS q
                FROM e, unnest(range(1, len(v) + 1)) AS t(i)
            )
            SELECT label, dim,
                   floor(SUM(q) / (COUNT(*) * 1000000.0) * 1000000 + 0.5)
                       / 1000000 AS centroid_val,
                   CAST(COUNT(*) AS BIGINT) AS n_vectors
            FROM ex GROUP BY label, dim
        """,
        "ann_kmeans_refine": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            c AS (
                SELECT vec_id AS centroid_id, v AS centroid
                FROM e WHERE vec_id < (SELECT GREATEST(16, CAST(ceil(sqrt(count(*) / 2.0)) AS BIGINT)) FROM embeddings)
            ),
            scored AS (
                SELECT e.vec_id, c.centroid_id,
                       list_aggregate(list_transform(range(1, len(e.v) + 1),
                           i -> e.v[i] * c.centroid[i]), 'sum')
                       / (sqrt(list_aggregate(list_transform(e.v,
                              x -> x * x), 'sum'))
                          * sqrt(list_aggregate(list_transform(c.centroid,
                              x -> x * x), 'sum'))) AS sim
                FROM e CROSS JOIN c
            ),
            ranked AS (
                SELECT vec_id, centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, centroid_id) AS rn
                FROM scored
            ),
            assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
            ex AS (
                SELECT a.centroid_id, CAST(i - 1 AS BIGINT) AS dim,
                       CAST(floor(e.v[i] * 1000000 + 0.5) AS BIGINT) AS q
                FROM e JOIN assign a USING (vec_id),
                     unnest(range(1, len(e.v) + 1)) AS t(i)
            )
            SELECT CAST(centroid_id AS INT) AS centroid_id, dim,
                   floor(SUM(q) / (COUNT(*) * 1000000.0) * 1000000 + 0.5)
                       / 1000000 AS centroid_val,
                   CAST(COUNT(*) AS BIGINT) AS n_assigned
            FROM ex GROUP BY centroid_id, dim
        """,
        "events_scd2_status": """
            WITH ordered AS (
                SELECT user_id, event_type, ts, event_id,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_status
                FROM events
            ),
            changes AS (
                SELECT user_id, event_type AS status, ts, event_id
                FROM ordered
                WHERE prev_status IS NULL OR prev_status <> event_type
            )
            SELECT user_id, status,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
                   ts AS valid_from,
                   lead(ts) OVER w AS valid_to,
                   lead(ts) OVER w IS NULL AS is_current
            FROM changes
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "text_bm25": """
            WITH d AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '\\s+', ' ', 'g')), ' ') AS toks
                FROM documents
            ),
            t AS (
                SELECT doc_id,
                       CAST(len(list_filter(toks, x -> x <> '')) AS BIGINT) AS dl,
                       CAST(len(list_filter(toks, x -> x = 'join')) AS BIGINT) AS tf_join,
                       CAST(len(list_filter(toks, x -> x = 'stream')) AS BIGINT) AS tf_stream,
                       CAST(len(list_filter(toks, x -> x = 'merge')) AS BIGINT) AS tf_merge
                FROM d
            ),
            stats AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(dl) AS BIGINT) AS total_tokens,
                       CAST(SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_join,
                       CAST(SUM(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_stream,
                       CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge
                FROM t
            ),
            scored AS (
                SELECT doc_id, dl,
                       ln(1.0 + (n_docs - df_join + 0.5) / (df_join + 0.5))
                           * tf_join * 2.2
                           / (tf_join + 1.2 * (0.25 + 0.75 * dl
                              / (total_tokens / n_docs)))
                       + ln(1.0 + (n_docs - df_stream + 0.5) / (df_stream + 0.5))
                           * tf_stream * 2.2
                           / (tf_stream + 1.2 * (0.25 + 0.75 * dl
                              / (total_tokens / n_docs)))
                       + ln(1.0 + (n_docs - df_merge + 0.5) / (df_merge + 0.5))
                           * tf_merge * 2.2
                           / (tf_merge + 1.2 * (0.25 + 0.75 * dl
                              / (total_tokens / n_docs)))
                       AS raw
                FROM t CROSS JOIN stats
            )
            SELECT doc_id, dl, floor(raw * 10000 + 0.5) / 10000 AS bm25
            FROM scored
            WHERE floor(raw * 10000 + 0.5) / 10000 > 0
            ORDER BY bm25 DESC, doc_id
            LIMIT 20
        """,
        # ------------------------------------------- operator parity (C1-C5)
        "pipeline_expectations": ops.op_pipeline_expectations_oracle(),
        "op_profile_customer": """
            SELECT 'c_custkey' AS col_name,
                   CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   COUNT(DISTINCT c_custkey) AS n_distinct,
                   CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
                   CAST(MAX(c_custkey) AS VARCHAR) AS max_value
            FROM customer
            UNION ALL
            SELECT 'c_name' AS col_name,
                   CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   COUNT(DISTINCT c_name) AS n_distinct,
                   CAST(MIN(c_name) AS VARCHAR) AS min_value,
                   CAST(MAX(c_name) AS VARCHAR) AS max_value
            FROM customer
            UNION ALL
            SELECT 'c_nationkey' AS col_name,
                   CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   COUNT(DISTINCT c_nationkey) AS n_distinct,
                   CAST(MIN(c_nationkey) AS VARCHAR) AS min_value,
                   CAST(MAX(c_nationkey) AS VARCHAR) AS max_value
            FROM customer
            UNION ALL
            SELECT 'c_acctbal' AS col_name,
                   CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   COUNT(DISTINCT c_acctbal) AS n_distinct,
                   CAST(MIN(c_acctbal) AS VARCHAR) AS min_value,
                   CAST(MAX(c_acctbal) AS VARCHAR) AS max_value
            FROM customer
            UNION ALL
            SELECT 'c_mktsegment' AS col_name,
                   CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   COUNT(DISTINCT c_mktsegment) AS n_distinct,
                   CAST(MIN(c_mktsegment) AS VARCHAR) AS min_value,
                   CAST(MAX(c_mktsegment) AS VARCHAR) AS max_value
            FROM customer
        """,
        "op_clean_string": f"""
            SELECT doc_id, {_clean_default("text")} AS clean_text
            FROM documents
        """,
        "op_clean_string_address": f"""
            SELECT p_partkey,
                   {_clean_address("(p_name || ' # ' || CAST(p_size AS VARCHAR) || ' 1/2 /')")}
                       AS clean_name
            FROM part
        """,
        "op_validate_columns": """
            SELECT event_id,
                   CASE WHEN event_type <> 'signup' THEN 'invalid' ELSE '' END
                       AS validation_status,
                   CASE WHEN event_type = 'error' THEN 'payload_ts, payload_num'
                        WHEN event_type <> 'signup' THEN 'payload_ts'
                        ELSE '' END AS invalid_cols
            FROM events
        """,
        "op_validate_domain": """
            SELECT c_custkey,
                   CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
                        THEN '' ELSE 'invalid' END AS validation_status,
                   CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
                        THEN '' ELSE 'c_mktsegment' END AS invalid_cols
            FROM customer
        """,
        "op_validate_relationship": """
            SELECT e.event_id,
                   CASE WHEN p.c_custkey IS NULL THEN 'invalid' ELSE '' END
                       AS validation_status,
                   CASE WHEN p.c_custkey IS NULL THEN 'user_id' ELSE '' END
                       AS invalid_rel
            FROM events e
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
                       WHERE c_mktsegment <> 'MACHINERY') p
              ON e.user_id = p.c_custkey
        """,
        "op_pipeline_validate": """
            SELECT o.o_orderkey AS order_id,
                   CASE WHEN o.o_orderstatus NOT IN ('O', 'F')
                          OR p.c_custkey IS NULL
                        THEN 'invalid' ELSE 'valid' END AS validation_status,
                   CASE WHEN o.o_orderstatus NOT IN ('O', 'F')
                        THEN 'o_orderstatus' ELSE '' END AS invalid_cols,
                   CASE WHEN p.c_custkey IS NULL
                        THEN 'o_custkey' ELSE '' END AS invalid_rel,
                   CASE WHEN o.o_orderkey % 3 = 0 THEN 'ingested'
                        ELSE 'not_ingested' END AS silver_ingestion_status
            FROM orders o
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
                       WHERE c_mktsegment <> 'MACHINERY') p
              ON o.o_custkey = p.c_custkey
        """,
        "op_ingestion_status": """
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN 'ingested'
                        ELSE 'not_ingested' END AS silver_ingestion_status
            FROM orders
        """,
        "op_identify_duplicates": """
            WITH base AS (
                SELECT l_orderkey, l_shipdate,
                       CASE WHEN l_orderkey % 2 = 0 THEN 'ingested'
                            ELSE 'not_ingested' END AS st
                FROM lineitem
            ),
            w AS (
                SELECT l_orderkey, st,
                       COUNT(*) OVER (PARTITION BY l_orderkey) AS cnt,
                       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                          ORDER BY l_shipdate) AS rn
                FROM base
            )
            SELECT l_orderkey,
                   CAST(SUM(CASE WHEN (st = 'not_ingested' AND cnt > 1)
                                   OR (st = 'ingested' AND cnt > 1 AND rn > 1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS dup_rows,
                   CAST(SUM(CASE WHEN (st = 'not_ingested' AND cnt > 1)
                                   OR (st = 'ingested' AND cnt > 1 AND rn > 1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS invalid_rows,
                   COUNT(*) AS n_rows
            FROM w GROUP BY l_orderkey
        """,
        # ------------------------------------------------------- dedup
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS content_md5,
                   MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS copies
            FROM documents
            GROUP BY 1
        """,
        "dedup_minhash_signatures": f"""
            WITH sh_t AS (
                SELECT doc_id, {_SHINGLES3} AS sh FROM documents
            )
            SELECT doc_id,
               {mh_cols},
               len(sh) AS n_shingles
            FROM sh_t
        """,
        "dedup_minhash_pairs": f"""
            WITH sh_t AS (
                SELECT doc_id, {_SHINGLES3} AS sh FROM documents
            ),
            bands_raw AS (
                SELECT doc_id,
                       CAST(b AS VARCHAR) || '|' || (CASE b
                           WHEN 0 THEN {_minhash_expr(0)} || '|' || {_minhash_expr(1)}
                           WHEN 1 THEN {_minhash_expr(2)} || '|' || {_minhash_expr(3)}
                           WHEN 2 THEN {_minhash_expr(4)} || '|' || {_minhash_expr(5)}
                           ELSE {_minhash_expr(6)} || '|' || {_minhash_expr(7)}
                       END) AS band_key
                FROM sh_t, (SELECT unnest(range(4)) AS b)
            ),
            -- _MAX_BAND_BUCKET twin: degenerate buckets dropped before
            -- pairing, mirroring ext/dedup.minhash_candidate_pairs
            bands AS (
                SELECT doc_id, band_key FROM (
                    SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS bn
                    FROM bands_raw
                ) WHERE bn <= 1000
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
                FROM bands a
                JOIN bands b2 ON a.band_key = b2.band_key
                            AND a.doc_id < b2.doc_id
            )
            SELECT p.doc_a, p.doc_b,
                   floor(len(list_intersect(x.sh, y.sh))
                         / len(list_distinct(list_concat(x.sh, y.sh)))
                         * 10000 + 0.5) / 10000 AS jaccard
            FROM pairs p
            JOIN sh_t x ON p.doc_a = x.doc_id
            JOIN sh_t y ON p.doc_b = y.doc_id
            WHERE floor(len(list_intersect(x.sh, y.sh))
                        / len(list_distinct(list_concat(x.sh, y.sh)))
                        * 10000 + 0.5) / 10000 >= 0.5
        """,
        "dedup_simhash": f"""
            WITH toks_t AS (
                SELECT doc_id, list_distinct({_TOKS_NORM}) AS toks
                FROM documents
            ),
            expl AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) = 0
                                   THEN [CAST(NULL AS VARCHAR)]
                                   ELSE toks END) AS t
                FROM toks_t
            ),
            ht AS (SELECT doc_id, {_SIMHASH_H} AS h FROM expl)
            SELECT doc_id, CAST({_SIMHASH_VOTES} AS BIGINT) AS simhash16
            FROM ht GROUP BY doc_id
        """,
        "dedup_ngram_jaccard": ngram_pairs_sql,
        "graph_pagerank_docs": pagerank_sql,
        # cap-cost report twin: same band keys as dedup_minhash_pairs,
        # same gram index as dedup_ngram_jaccard, caps bound at 3/3
        "dedup_cap_report": f"""
            WITH sh_t AS (
                SELECT doc_id, {_SHINGLES3} AS sh FROM documents
            ),
            bands_raw AS (
                SELECT doc_id,
                       CAST(b AS VARCHAR) || '|' || (CASE b
                           WHEN 0 THEN {_minhash_expr(0)} || '|' || {_minhash_expr(1)}
                           WHEN 1 THEN {_minhash_expr(2)} || '|' || {_minhash_expr(3)}
                           WHEN 2 THEN {_minhash_expr(4)} || '|' || {_minhash_expr(5)}
                           ELSE {_minhash_expr(6)} || '|' || {_minhash_expr(7)}
                       END) AS band_key
                FROM sh_t, (SELECT unnest(range(4)) AS b)
            ),
            bsz AS (
                SELECT band_key, COUNT(*) AS kn
                FROM bands_raw GROUP BY band_key
            ),
            b_keys AS (
                SELECT COUNT(*) AS keys_total,
                       SUM(CASE WHEN kn > 3 THEN 1 ELSE 0 END) AS keys_dropped,
                       SUM(kn) AS postings_total,
                       SUM(CASE WHEN kn > 3 THEN kn ELSE 0 END)
                           AS postings_dropped
                FROM bsz
            ),
            b_docs AS (
                SELECT COUNT(DISTINCT r.doc_id) AS docs_affected
                FROM bands_raw r JOIN bsz USING (band_key)
                WHERE bsz.kn > 3
            ),
            grams_t AS (
                SELECT doc_id, lang, source,
                       list_distinct(CASE WHEN len({_TOKS_NORM}) < 2 THEN []
                           ELSE list_transform(range(1, len({_TOKS_NORM})),
                                i -> array_to_string({_TOKS_NORM}[i:i+1], ' '))
                           END) AS grams
                FROM documents
            ),
            inv_raw AS (
                SELECT doc_id, lang, source, unnest(grams) AS gram
                FROM grams_t
            ),
            gsz AS (
                SELECT lang, source, gram, COUNT(*) AS kn
                FROM inv_raw GROUP BY lang, source, gram
            ),
            g_keys AS (
                SELECT COUNT(*) AS keys_total,
                       SUM(CASE WHEN kn > 3 THEN 1 ELSE 0 END) AS keys_dropped,
                       SUM(kn) AS postings_total,
                       SUM(CASE WHEN kn > 3 THEN kn ELSE 0 END)
                           AS postings_dropped
                FROM gsz
            ),
            g_docs AS (
                SELECT COUNT(DISTINCT i.doc_id) AS docs_affected
                FROM inv_raw i JOIN gsz USING (lang, source, gram)
                WHERE gsz.kn > 3
            )
            SELECT 'band_bucket' AS cap, CAST(3 AS BIGINT) AS threshold,
                   CAST(keys_total AS BIGINT) AS keys_total,
                   CAST(keys_dropped AS BIGINT) AS keys_dropped,
                   CAST(postings_total AS BIGINT) AS postings_total,
                   CAST(postings_dropped AS BIGINT) AS postings_dropped,
                   CAST(docs_affected AS BIGINT) AS docs_affected
            FROM b_keys, b_docs
            UNION ALL
            SELECT 'gram_df', CAST(3 AS BIGINT),
                   CAST(keys_total AS BIGINT), CAST(keys_dropped AS BIGINT),
                   CAST(postings_total AS BIGINT),
                   CAST(postings_dropped AS BIGINT),
                   CAST(docs_affected AS BIGINT)
            FROM g_keys, g_docs
            ORDER BY cap
        """,
        "dedup_containment_pairs": containment_pairs_sql,
        # incremental ingest twin: the full NON-incremental recompute —
        # band index of the existing 3/4 corpus (same bucket cap), batch
        # = doc_id % 4 = 0, candidate join + exact-Jaccard verification
        "dedup_incremental": f"""
            WITH sh_t AS (
                SELECT doc_id, {_SHINGLES3} AS sh FROM documents
            ),
            bands_all AS (
                SELECT doc_id,
                       CAST(b AS VARCHAR) || '|' || (CASE b
                           WHEN 0 THEN {_minhash_expr(0)} || '|' || {_minhash_expr(1)}
                           WHEN 1 THEN {_minhash_expr(2)} || '|' || {_minhash_expr(3)}
                           WHEN 2 THEN {_minhash_expr(4)} || '|' || {_minhash_expr(5)}
                           ELSE {_minhash_expr(6)} || '|' || {_minhash_expr(7)}
                       END) AS band_key
                FROM sh_t, (SELECT unnest(range(4)) AS b)
            ),
            idx AS (
                SELECT doc_id, band_key FROM (
                    SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS bn
                    FROM bands_all WHERE doc_id % 4 <> 0
                ) WHERE bn <= 1000
            ),
            newb AS (
                SELECT doc_id AS new_doc, band_key
                FROM bands_all WHERE doc_id % 4 = 0
            ),
            cand AS (
                SELECT DISTINCT n.new_doc, i.doc_id AS old_doc
                FROM newb n JOIN idx i USING (band_key)
                WHERE n.new_doc <> i.doc_id
            ),
            ver AS (
                SELECT c.new_doc, c.old_doc,
                       floor(len(list_intersect(x.sh, y.sh))
                             / len(list_distinct(list_concat(x.sh, y.sh)))
                             * 10000 + 0.5) / 10000 AS j
                FROM cand c
                JOIN sh_t x ON c.new_doc = x.doc_id
                JOIN sh_t y ON c.old_doc = y.doc_id
            ),
            best AS (
                SELECT new_doc, old_doc AS best_match, j AS best_jaccard,
                       ROW_NUMBER() OVER (PARTITION BY new_doc
                                          ORDER BY j DESC, old_doc) AS rn
                FROM ver WHERE j >= 0.5
            )
            SELECT d.doc_id,
                   b.best_match IS NOT NULL AS is_dup,
                   b.best_match, b.best_jaccard
            FROM documents d
            LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
              ON d.doc_id = b.new_doc
            WHERE d.doc_id % 4 = 0
        """,
        # online dedup: arrival order == doc_id order, so the streamed
        # flags equal a strictly-earlier same-lang self-join over the
        # same 16-bit fingerprints at Hamming <= 1
        "stream_dedup_simhash": f"""
            WITH toks_t AS (
                SELECT doc_id, list_distinct({_TOKS_NORM}) AS toks
                FROM documents
            ),
            expl AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) = 0
                                   THEN [CAST(NULL AS VARCHAR)]
                                   ELSE toks END) AS t
                FROM toks_t
            ),
            ht AS (SELECT doc_id, {_SIMHASH_H} AS h FROM expl),
            sim AS (
                SELECT doc_id, CAST({_SIMHASH_VOTES} AS BIGINT) AS simhash16
                FROM ht GROUP BY doc_id
            ),
            simd AS (
                SELECT s.doc_id, d.lang, s.simhash16
                FROM sim s JOIN documents d USING (doc_id)
            )
            SELECT a.doc_id, a.lang, a.simhash16,
                   COUNT(b.doc_id) > 0 AS is_dup
            FROM simd a
            LEFT JOIN simd b
              ON a.lang = b.lang AND b.doc_id < a.doc_id
             AND bit_count(CAST(xor(a.simhash16, b.simhash16) AS BIGINT)) <= 1
            GROUP BY a.doc_id, a.lang, a.simhash16
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS (
                SELECT doc_a, doc_b FROM ({ngram_pairs_sql})
            ),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(node, r) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
            ),
            comp AS (SELECT node AS doc_id, MIN(r) AS cluster_id
                     FROM reach GROUP BY node)
            SELECT doc_id, cluster_id,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
                   doc_id = cluster_id AS is_canonical
            FROM comp
        """,
        # the surviving corpus after near-dup resolution: all documents
        # minus non-canonical cluster members
        "dedup_keep_canonical": f"""
            WITH RECURSIVE pairs AS (
                SELECT doc_a, doc_b FROM ({ngram_pairs_sql})
            ),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(node, r) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
            ),
            comp AS (SELECT node AS doc_id, MIN(r) AS cluster_id
                     FROM reach GROUP BY node)
            SELECT d.doc_id, d.lang, d.source
            FROM documents d
            WHERE d.doc_id NOT IN
                (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
        """,
        # ------------------------------------------------------- text
        "text_quality": f"""
            SELECT doc_id,
                   len({_TOKS_RAW}) AS token_count,
                   floor(list_aggregate(list_transform({_TOKS_RAW},
                             x -> length(x)), 'sum')
                         / len({_TOKS_RAW}) * 100 + 0.5) / 100 AS avg_token_len,
                   floor(len(list_distinct({_TOKS_RAW}))
                         / len({_TOKS_RAW}) * 10000 + 0.5) / 10000
                       AS type_token_ratio,
                   floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         / length(text) * 10000 + 0.5) / 10000 AS alpha_ratio
            FROM documents
        """,
        "text_token_counts": f"""
            SELECT doc_id,
                   len({_TOKS_RAW}) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS bpe_ish_tokens
            FROM documents
        """,
        # per-language quality floor: percent_rank over the ROUNDED
        # alpha ratio (identical sort keys -> identical tie groups)
        "text_quality_floor": """
            WITH scored AS (
                SELECT doc_id, lang,
                       floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                             / length(text) * 10000 + 0.5) / 10000
                           AS alpha_ratio
                FROM documents
            ),
            ranked AS (
                SELECT doc_id, lang, alpha_ratio,
                       floor(percent_rank() OVER (PARTITION BY lang
                                 ORDER BY alpha_ratio, doc_id)
                             * 1000000 + 0.5) / 1000000 AS pct_rank
                FROM scored
            )
            SELECT doc_id, lang, alpha_ratio, pct_rank
            FROM ranked
            WHERE pct_rank >= 0.1
        """,
        # token-budget subsampling: md5 hash order, exact BIGINT cumsum
        "sample_token_budget": f"""
            WITH t AS (
                SELECT doc_id, source,
                       CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens,
                       md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ),
            c AS (
                SELECT doc_id, source, n_tokens,
                       CAST(SUM(n_tokens) OVER (PARTITION BY source
                                ORDER BY h, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
                           AS cum_tokens
                FROM t
            )
            SELECT doc_id, source, n_tokens, cum_tokens
            FROM c
            WHERE cum_tokens <= 800
        """,
        "text_lang_id": f"""
            WITH scored AS (
                SELECT doc_id, lang,
                   {lang_scores}
                FROM (SELECT doc_id, lang,
                             list_distinct(string_split_regex(trim(lower(text)),
                                           '\\s+')) AS toks
                      FROM documents)
            )
            SELECT doc_id, lang AS labeled_lang,
                   CASE WHEN greatest(score_en, score_es, score_fr, score_de) <= 0
                            THEN 'und'
                        WHEN score_en = greatest(score_en, score_es, score_fr, score_de)
                            THEN 'en'
                        WHEN score_es = greatest(score_en, score_es, score_fr, score_de)
                            THEN 'es'
                        WHEN score_fr = greatest(score_en, score_es, score_fr, score_de)
                            THEN 'fr'
                        ELSE 'de' END AS predicted_lang,
                   greatest(score_en, score_es, score_fr, score_de) AS marker_hits
            FROM scored
        """,
        "text_fingerprint": f"""
            WITH sh_t AS (
                SELECT doc_id, text,
                       CASE WHEN len({_TOKS_RAW}) < 5
                            THEN [array_to_string({_TOKS_RAW}, ' ')]
                            ELSE list_transform(range(1, len({_TOKS_RAW}) - 3),
                                     i -> array_to_string({_TOKS_RAW}[i:i+4], ' '))
                       END AS sh
                FROM documents
            )
            SELECT doc_id,
                   md5(text) AS exact_md5,
                   list_aggregate(list_transform(sh, s -> md5(s)), 'min')
                       AS min_shingle_md5,
                   len(sh) AS n_shingles
            FROM sh_t
        """,
        "text_pii_scrub": f"""
            WITH p AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 7 = 0
                               THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                    || '@example.com now' ELSE '' END
                       || CASE WHEN doc_id % 11 = 0
                               THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                                    || '.1 or call 555-867-5309' ELSE '' END
                       AS t0
                FROM documents
            ),
            s1 AS (SELECT doc_id,
                          len(regexp_extract_all(t0, '{_PII[0][1]}')) AS n_emails,
                          regexp_replace(t0, '{_PII[0][1]}', '{_PII[0][2]}', 'g') AS t1
                   FROM p),
            s2 AS (SELECT doc_id, n_emails,
                          len(regexp_extract_all(t1, '{_PII[1][1]}')) AS n_ips,
                          regexp_replace(t1, '{_PII[1][1]}', '{_PII[1][2]}', 'g') AS t2
                   FROM s1),
            s3 AS (SELECT doc_id, n_emails, n_ips,
                          len(regexp_extract_all(t2, '{_PII[2][1]}')) AS n_phones,
                          regexp_replace(t2, '{_PII[2][1]}', '{_PII[2][2]}', 'g') AS t3
                   FROM s2)
            SELECT doc_id, n_emails, n_ips, n_phones, t3 AS clean_text FROM s3
        """,
        "text_chunks": f"""
            WITH t AS (
                SELECT doc_id, {_TOKS_RAW} AS toks, len({_TOKS_RAW}) AS n
                FROM documents
                WHERE text IS NOT NULL AND trim(text) <> ''
            ),
            s AS (
                SELECT doc_id, toks, n,
                       unnest(generate_series(1, greatest(n - 16, 1), 48)) AS st
                FROM t
            )
            SELECT doc_id,
                   (st - 1) // 48 AS chunk_id,
                   st AS chunk_start,
                   least(64, n - st + 1) AS n_tokens,
                   array_to_string(toks[st : st + 63], ' ') AS chunk_text
            FROM s
        """,
        # ----------------------------------------------------- sampling
        # corpus heavy hitters (ext/text.boilerplate_ngrams): top-25 word
        # trigrams by total occurrences; (occurrences, doc_frequency,
        # gram) is a total order so the LIMIT set is engine-stable
        "text_boilerplate": f"""
            WITH grams_t AS (
                SELECT doc_id,
                       CASE WHEN len({_TOKS_NORM}) < 3 THEN []
                            ELSE list_transform(range(1, len({_TOKS_NORM}) - 1),
                                 i -> array_to_string({_TOKS_NORM}[i:i+2], ' '))
                       END AS grams
                FROM documents
            ),
            g AS (SELECT doc_id, unnest(grams) AS gram FROM grams_t),
            c AS (
                SELECT gram, COUNT(*) AS occurrences,
                       COUNT(DISTINCT doc_id) AS doc_frequency
                FROM g GROUP BY gram
            )
            SELECT gram, occurrences, doc_frequency FROM c
            ORDER BY occurrences DESC, doc_frequency DESC, gram ASC
            LIMIT 25
        """,
        "text_decontaminate": f"""
            WITH g AS (
                SELECT doc_id,
                       {sampling.hash_bucket_sql(
                           "'doc|' || CAST(doc_id AS VARCHAR)", salt="split"
                       )} AS bucket,
                       unnest(list_distinct(
                           CASE WHEN len({_TOKS_NORM}) < 5 THEN []
                           ELSE list_transform(range(1, len({_TOKS_NORM}) - 3),
                                i -> array_to_string({_TOKS_NORM}[i:i+4], ' '))
                           END)) AS gram
                FROM documents
            )
            SELECT t.doc_id AS train_doc_id, e.doc_id AS test_doc_id,
                   COUNT(*) AS shared_ngrams
            FROM g t JOIN g e ON t.gram = e.gram
            WHERE t.bucket < 8000 AND e.bucket >= 9000
            GROUP BY 1, 2
        """,
        "text_corpus_filter": f"""
            WITH q AS (
                SELECT doc_id, len({_TOKS_RAW}) AS token_count,
                       floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                             / length(text) * 10000 + 0.5) / 10000 AS alpha_ratio
                FROM documents
            ),
            toks_t AS (
                SELECT doc_id, {_TOKS_NORM} AS toks FROM documents
            ),
            tok_c AS (
                SELECT doc_id, t, COUNT(*) AS cnt
                FROM (SELECT doc_id, unnest(toks) AS t FROM toks_t)
                GROUP BY doc_id, t
            ),
            tok_s AS (
                SELECT doc_id, MAX(cnt) AS top_cnt,
                       CAST(SUM(cnt) AS BIGINT) AS n_toks
                FROM tok_c GROUP BY doc_id
            ),
            tri AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) < 3 THEN []
                              ELSE list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' '))
                              END) AS g
                FROM toks_t
            ),
            tri_s AS (
                SELECT doc_id, COUNT(*) AS n_tri,
                       COUNT(DISTINCT g) AS n_tri_distinct
                FROM tri GROUP BY doc_id
            ),
            rep AS (
                SELECT t.doc_id,
                       floor(top_cnt / n_toks * 10000 + 0.5) / 10000
                           AS top_token_share,
                       COALESCE(floor((1 - n_tri_distinct / n_tri) * 10000 + 0.5)
                                / 10000, 0.0) AS dup_trigram_frac
                FROM tok_s t LEFT JOIN tri_s USING (doc_id)
            ),
            scored AS (
                SELECT doc_id,
                   {lang_scores}
                FROM (SELECT doc_id,
                             list_distinct(string_split_regex(trim(lower(text)),
                                           '\\s+')) AS toks
                      FROM documents)
            ),
            lang AS (
                SELECT doc_id,
                       CASE WHEN greatest(score_en, score_es, score_fr, score_de) <= 0
                                THEN 'und'
                            WHEN score_en = greatest(score_en, score_es, score_fr, score_de)
                                THEN 'en'
                            WHEN score_es = greatest(score_en, score_es, score_fr, score_de)
                                THEN 'es'
                            WHEN score_fr = greatest(score_en, score_es, score_fr, score_de)
                                THEN 'fr'
                            ELSE 'de' END AS predicted_lang
                FROM scored
            ),
            sel AS (
                SELECT q.doc_id,
                       CASE WHEN token_count < 20 THEN 'too_short'
                            WHEN alpha_ratio < 0.6 THEN 'low_alpha'
                            WHEN top_token_share > 0.2 THEN 'repetitive_token'
                            WHEN dup_trigram_frac > 0.1 THEN 'repetitive_trigram'
                            WHEN predicted_lang = 'und' THEN 'unknown_lang'
                       END AS reason
                FROM q JOIN rep USING (doc_id) JOIN lang USING (doc_id)
            )
            SELECT doc_id, reason IS NULL AS keep,
                   COALESCE(reason, 'ok') AS reject_reason
            FROM sel
        """,
        "text_repetition": f"""
            WITH toks_t AS (
                SELECT doc_id, {_TOKS_NORM} AS toks FROM documents
            ),
            tok_c AS (
                SELECT doc_id, t, COUNT(*) AS cnt
                FROM (SELECT doc_id, unnest(toks) AS t FROM toks_t)
                GROUP BY doc_id, t
            ),
            tok_s AS (
                SELECT doc_id, MAX(cnt) AS top_cnt,
                       CAST(SUM(cnt) AS BIGINT) AS n_toks
                FROM tok_c GROUP BY doc_id
            ),
            tri AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) < 3 THEN []
                              ELSE list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' '))
                              END) AS g
                FROM toks_t
            ),
            tri_s AS (
                SELECT doc_id, COUNT(*) AS n_tri,
                       COUNT(DISTINCT g) AS n_tri_distinct
                FROM tri GROUP BY doc_id
            )
            SELECT t.doc_id,
                   floor(top_cnt / n_toks * 10000 + 0.5) / 10000
                       AS top_token_share,
                   COALESCE(floor((1 - n_tri_distinct / n_tri) * 10000 + 0.5)
                            / 10000, 0.0) AS dup_trigram_frac
            FROM tok_s t LEFT JOIN tri_s USING (doc_id)
        """,
        "sample_quality_temperature":
            sampling.sample_quality_temperature_oracle(),
        "formats_multiformat_scan":
            formats_mod.formats_multiformat_scan_oracle(),
        "sample_hash_split": f"""
            SELECT doc_id, b AS bucket,
                   CASE WHEN b < 8000 THEN 'train'
                        WHEN b < 9000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         {sampling.hash_bucket_sql(
                             "'doc|' || CAST(doc_id AS VARCHAR)", salt="split"
                         )} AS b
                  FROM documents)
        """,
        "sample_stratified": f"""
            SELECT doc_id, lang
            FROM (SELECT doc_id, lang,
                         {sampling.hash_bucket_sql(
                             "'strat|' || CAST(doc_id AS VARCHAR)",
                             salt="stratified",
                         )} AS b
                  FROM documents)
            WHERE b < (CASE lang WHEN 'en' THEN 0.25 WHEN 'es' THEN 0.5
                                 WHEN 'fr' THEN 0.75 ELSE 1.0 END) * 10000
        """,
        # ------------------------------------- packing / mixture / tf-idf
        # concat-and-chunk packing manifest: per-source running token
        # offset, cut into 512-token sequences (ext/packing.pack_sequences)
        "pack_sequences": f"""
            WITH t AS (
                SELECT doc_id, source, len({_TOKS_RAW}) AS n_tokens
                FROM documents
            ),
            c AS (
                SELECT *,
                       CAST(SUM(n_tokens) OVER (PARTITION BY source
                            ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) - n_tokens
                            AS BIGINT) AS start_offset
                FROM t
            )
            SELECT source, doc_id, n_tokens, start_offset,
                   CAST(floor(start_offset / 512.0) AS BIGINT) AS seq_id,
                   CAST(start_offset % 512 AS BIGINT) AS seq_offset
            FROM c
        """,
        # temperature-2 mixture rates: only IEEE-correctly-rounded ops
        # (integer sums, divides, sqrt, max) so both engines derive
        # bit-identical doubles (ext/packing.mixture_weights)
        "mixture_weights": f"""
            WITH per_source AS (
                SELECT source, COUNT(*) AS n_docs,
                       CAST(SUM(len({_TOKS_RAW})) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
            ),
            shared AS (
                SELECT *,
                       n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE)
                           AS share
                FROM per_source
            ),
            weighted AS (
                SELECT *, 1.0 / sqrt(share) AS w_raw FROM shared
            ),
            rated AS (
                SELECT *, w_raw / MAX(w_raw) OVER () AS rate FROM weighted
            )
            SELECT source, n_docs, n_tokens,
                   {_util_rnd_sql("share", 6)} AS token_share,
                   {_util_rnd_sql("rate", 6)} AS sample_rate,
                   CAST(floor(rate * 10000) AS BIGINT) AS keep_buckets
            FROM rated
        """,
        "mixture_sample": f"""
            WITH per_source AS (
                SELECT source,
                       CAST(SUM(len({_TOKS_RAW})) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
            ),
            shared AS (
                SELECT source,
                       1.0 / sqrt(n_tokens /
                            CAST(SUM(n_tokens) OVER () AS DOUBLE)) AS w_raw
                FROM per_source
            ),
            rated AS (
                SELECT source,
                       CAST(floor(w_raw / MAX(w_raw) OVER () * 10000)
                            AS BIGINT) AS keep_buckets
                FROM shared
            )
            SELECT d.doc_id, d.lang, d.source
            FROM documents d JOIN rated r ON d.source = r.source
            WHERE {sampling.hash_bucket_sql(
                "'mix|' || CAST(d.doc_id AS VARCHAR)", salt="mixture"
            )} < r.keep_buckets
        """,
        # top-5 terms per source by TF-IDF; score floor-rounded to 4dp
        # BEFORE ranking on both sides so ordering can't hinge on a
        # last-ulp ln() discrepancy (ext/packing.tfidf_top_terms)
        "tfidf_top_terms": f"""
            WITH toks AS (
                SELECT source, unnest({_TOKS_NORM}) AS term FROM documents
            ),
            tf_t AS (
                SELECT source, term, COUNT(*) AS tf
                FROM toks WHERE term <> '' GROUP BY source, term
            ),
            df_t AS (
                SELECT term, COUNT(*) AS df FROM tf_t GROUP BY term
            ),
            n_t AS (SELECT COUNT(DISTINCT source) AS ns FROM tf_t),
            scored AS (
                SELECT tf_t.source, tf_t.term, tf_t.tf, df_t.df,
                       {_util_rnd_sql(
                           "tf_t.tf * ln((n_t.ns + 1.0) / (df_t.df + 1.0))", 4
                       )} AS tfidf
                FROM tf_t JOIN df_t USING (term) CROSS JOIN n_t
            ),
            ranked AS (
                SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY tfidf DESC, term ASC) AS INT) AS rank
                FROM scored
            )
            SELECT source, term, tf, df, tfidf, rank
            FROM ranked WHERE rank <= 5
        """,
        # --------------------------------------------------- similarity
        "retrieval_hybrid_rrf":
            similarity.retrieval_hybrid_rrf_oracle(),
        "ann_cosine_topk": """
            WITH q AS (
                SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
                SELECT e.vec_id,
                       list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE)
                                * CAST(q.qe[i] AS DOUBLE)), 'sum') AS dp,
                       sqrt(list_aggregate(list_transform(e.embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS na,
                       sqrt(list_aggregate(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nq
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> 0
            )
            SELECT vec_id, ROUND(dp / (na * nq), 6) AS cosine_sim
            FROM scored
            ORDER BY cosine_sim DESC, vec_id
            LIMIT 10
        """,
        "ann_ivf_assignments": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            c AS (
                SELECT vec_id AS centroid_id, v AS centroid
                FROM e WHERE vec_id < (SELECT GREATEST(16, CAST(ceil(sqrt(count(*) / 2.0)) AS BIGINT)) FROM embeddings)
            ),
            scored AS (
                SELECT e.vec_id, c.centroid_id,
                       list_aggregate(list_transform(range(1, len(e.v) + 1),
                           i -> e.v[i] * c.centroid[i]), 'sum')
                       / (sqrt(list_aggregate(list_transform(e.v,
                              x -> x * x), 'sum'))
                          * sqrt(list_aggregate(list_transform(c.centroid,
                              x -> x * x), 'sum'))) AS sim
                FROM e CROSS JOIN c
            ),
            ranked AS (
                SELECT vec_id, centroid_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, centroid_id) AS rn
                FROM scored
            )
            SELECT vec_id, CAST(centroid_id AS INT) AS centroid_id,
                   floor(sim * 1000000 + 0.5) / 1000000 AS centroid_sim
            FROM ranked WHERE rn = 1
        """,
        "ann_lsh_buckets": f"""
            WITH {_LSH_PLANES_CTE}
            SELECT vec_id, {_lsh_bucket_sql("embedding")} AS bucket_id
            FROM embeddings, np
        """,
        "ann_lsh_topk": f"""
            WITH {_LSH_PLANES_CTE},
            b AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                       {_lsh_bucket_sql("embedding")} AS bucket_id
                FROM embeddings, np
            ),
            q AS (SELECT v AS qv, bucket_id AS qb FROM b WHERE vec_id = 0)
            SELECT b.vec_id, ROUND({_cos_sql("b.v", "q.qv")}, 6) AS cosine_sim
            FROM b, q
            WHERE b.bucket_id = q.qb AND b.vec_id <> 0
            ORDER BY cosine_sim DESC, b.vec_id
            LIMIT 10
        """,
        "ann_lsh_topk_multiprobe": f"""
            WITH {_LSH_PLANES_CTE},
            b AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                       {_lsh_bucket_sql("embedding")} AS bucket_id
                FROM embeddings, np
            ),
            q AS (SELECT v AS qv, bucket_id AS qb FROM b WHERE vec_id = 0)
            SELECT b.vec_id, ROUND({_cos_sql("b.v", "q.qv")}, 6) AS cosine_sim
            FROM b, q
            WHERE bit_count(CAST(xor(b.bucket_id, q.qb) AS BIGINT)) <= 1
              AND b.vec_id <> 0
            ORDER BY cosine_sim DESC, b.vec_id
            LIMIT 10
        """,
        "ann_lsh_near_dup_pairs": f"""
            WITH {_LSH_PLANES_CTE},
            b AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                       {_lsh_bucket_sql("embedding")} AS bucket_id
                FROM embeddings, np
            )
            SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
                   ROUND({_cos_sql("a.v", "b2.v")}, 6) AS cosine_sim
            FROM b a
            JOIN b b2 ON a.bucket_id = b2.bucket_id AND a.vec_id < b2.vec_id
            WHERE ROUND({_cos_sql("a.v", "b2.v")}, 6) >= 0.35
        """,
        # SemDeDup twin: IVF assignment (as ann_ivf_assignments) ->
        # intra-cluster cosine pairs -> recursive-CTE components (as
        # dedup_clusters) -> corpus minus non-canonical members
        "dedup_semantic": f"""
            WITH RECURSIVE e AS (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            c AS (
                SELECT vec_id AS centroid_id, v AS centroid
                FROM e WHERE vec_id < (SELECT GREATEST(16, CAST(ceil(sqrt(count(*) / 2.0)) AS BIGINT)) FROM embeddings)
            ),
            scored AS (
                SELECT e.vec_id, c.centroid_id,
                       {_cos_sql("e.v", "c.centroid")} AS sim
                FROM e CROSS JOIN c
            ),
            ranked AS (
                SELECT vec_id, centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, centroid_id) AS rn
                FROM scored
            ),
            assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
            vv AS (
                SELECT a.centroid_id, e.vec_id, e.v
                FROM e JOIN assign a USING (vec_id)
            ),
            prs AS (
                SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
                FROM vv x
                JOIN vv y ON x.centroid_id = y.centroid_id
                         AND x.vec_id < y.vec_id
                WHERE ROUND({_cos_sql("x.v", "y.v")}, 6) >= 0.35
            ),
            edges AS (
                SELECT vec_a AS a2, vec_b AS b2 FROM prs
                UNION
                SELECT vec_b, vec_a FROM prs
            ),
            reach(node, r) AS (
                SELECT a2, a2 FROM edges
                UNION
                SELECT ed.a2, reach.r
                FROM edges ed JOIN reach ON reach.node = ed.b2
            ),
            comp AS (SELECT node AS vec_id, MIN(r) AS comp
                     FROM reach GROUP BY node)
            SELECT emb.vec_id, emb.label
            FROM embeddings emb
            WHERE emb.vec_id NOT IN
                (SELECT vec_id FROM comp WHERE vec_id <> comp)
        """,
        "ann_ivf_topk": f"""
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            c AS (SELECT vec_id AS centroid_id, v AS centroid
                  FROM e WHERE vec_id < (SELECT GREATEST(16, CAST(ceil(sqrt(count(*) / 2.0)) AS BIGINT)) FROM embeddings)),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            probe AS (
                SELECT centroid_id
                FROM c, q
                ORDER BY {_cos_sql("c.centroid", "q.qv")} DESC, centroid_id
                LIMIT 4
            ),
            assigned AS (
                SELECT vec_id, centroid_id
                FROM (
                    SELECT e.vec_id, c.centroid_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY e.vec_id
                               ORDER BY {_cos_sql("e.v", "c.centroid")} DESC,
                                        c.centroid_id) AS rn
                    FROM e CROSS JOIN c
                )
                WHERE rn = 1
            )
            SELECT e.vec_id, ROUND({_cos_sql("e.v", "q.qv")}, 6) AS cosine_sim
            FROM e
            JOIN assigned a ON e.vec_id = a.vec_id
            JOIN probe p ON a.centroid_id = p.centroid_id
            CROSS JOIN q
            WHERE e.vec_id <> 0
            ORDER BY cosine_sim DESC, e.vec_id
            LIMIT 10
        """,
        "ann_pairs_per_label": """
            WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
            SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(
                     list_aggregate(list_transform(range(1, len(a.embedding) + 1),
                         i -> CAST(a.embedding[i] AS DOUBLE)
                              * CAST(b.embedding[i] AS DOUBLE)), 'sum')
                     / (sqrt(list_aggregate(list_transform(a.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(b.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                     6) AS cosine_sim
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_aggregate(list_transform(range(1, len(a.embedding) + 1),
                      i -> CAST(a.embedding[i] AS DOUBLE)
                           * CAST(b.embedding[i] AS DOUBLE)), 'sum')
                  / (sqrt(list_aggregate(list_transform(a.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                     * sqrt(list_aggregate(list_transform(b.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
                  >= 0.35
        """,
        # -------------------------------------------------- json / windows
        "events_variant_agg": json_ops.events_variant_agg_oracle(),
        "events_variant_shapes": json_ops.events_variant_shapes_oracle(),
        "events_json_extract": """
            SELECT event_id, event_type,
                   TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "events_json_agg": """
            SELECT event_type, COUNT(*) AS event_count,
                   CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   floor(CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                              AS BIGINT) / COUNT(*) * 100 + 0.5) / 100 AS avg_k
            FROM events
            GROUP BY event_type
        """,
        "events_hourly_windows": """
            SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP_NS)
                       AS window_start,
                   event_type,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       / 100 AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        # ---------------------------------------- as-of / range joins
        "asof_events_latest_order": """
            WITH lpd AS (
                SELECT o_custkey AS user_id, o_orderdate,
                       MAX(o_orderkey) AS o_orderkey
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, l.o_orderkey AS asof_orderkey
            FROM events e
            ASOF LEFT JOIN lpd l
              ON e.user_id = l.user_id
             AND CAST(e.ts AS TIMESTAMP) >= CAST(l.o_orderdate AS TIMESTAMP)
        """,
        "range_join_value_bands": """
            SELECT CASE WHEN value < 0 THEN 'negative'
                        WHEN value < 10 THEN 'tiny'
                        WHEN value < 50 THEN 'small'
                        WHEN value < 150 THEN 'medium'
                        WHEN value < 300 THEN 'large'
                        ELSE 'huge' END AS band,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       / 100 AS sum_value
            FROM events
            GROUP BY 1
        """,
        # ------------------------------------------------ multimodal
        # (documents.text is ASCII-only in the testdata, so DuckDB
        # string ops equal byte ops on the utf-8 payload)
        "mm_media_metadata": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS media_type,
                   length(text) AS n_bytes,
                   md5(text) AS checksum_md5
            FROM documents
        """,
        "mm_decode_features": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS media_type,
                   length(text) AS n_bytes,
                   floor(list_aggregate(list_transform(range(1, 9),
                             i -> ((length(text) * i) % 256) / 255.0), 'sum')
                         / 8 * 1000000 + 0.5) / 1000000 AS feature_mean
            FROM documents
        """,
        "mm_frame_sample": """
            SELECT d.doc_id,
                   t.i AS frame_idx,
                   (length(d.text) * t.i) // 4 AS byte_offset,
                   md5(d.text[CAST((length(d.text) * t.i) // 4 AS INT) + 1 :]
                       || CAST(t.i AS VARCHAR)) AS frame_checksum
            FROM documents d
            CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
            WHERE d.doc_id % 3 = 2
        """,
        # ------------------------------------------------- streaming
        # (same results as batch on a bounded historical source)
        "stream_enriched_counts": """
            SELECT e.event_type, c.c_mktsegment,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       / 100 AS sum_value
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY 1, 2
        """,
        "stream_dedup_events": """
            SELECT event_id, CAST(ts AS TIMESTAMP_NS) AS ts, user_id,
                   event_type, value
            FROM events
        """,
        # foreachBatch ingestion into a ManagedTable: the merge-maintained
        # table holds exactly one copy of every event
        "stream_ingest_managed_table": """
            SELECT event_id, CAST(ts AS TIMESTAMP_NS) AS ts, user_id,
                   event_type, value, props
            FROM events
        """,
        # streaming expanding z-score: the stateful operator's integer
        # sufficient statistics equal the batch expanding-frame window
        "stream_expanding_zscore": """
            WITH base AS (
                SELECT event_id, event_type, ts, value,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                FROM events
            ),
            stats AS (
                SELECT event_id, event_type, value, c,
                       SUM(c) OVER w AS s,
                       SUM(c * c) OVER w AS ss,
                       COUNT(c) OVER w AS n
                FROM base
                WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)
            )
            SELECT event_id, event_type, value,
                   floor(((c - s / n)
                          / NULLIF(sqrt(greatest(ss / n - (s / n) * (s / n),
                                                 0)), 0))
                         * 10000 + 0.5) / 10000 AS z_score,
                   abs((c - s / n)
                       / NULLIF(sqrt(greatest(ss / n - (s / n) * (s / n),
                                              0)), 0)) > 3 AS is_anomaly
            FROM stats
            WHERE n >= 20
        """,
        # rolling z-score anomaly detection: exact integer-cents sums
        # over an explicitly ordered 100-row frame -> bit-identical
        # mean/std/z in both engines
        "events_anomaly_zscore": """
            WITH base AS (
                SELECT event_id, event_type, ts, value,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                FROM events
            ),
            stats AS (
                SELECT event_id, event_type, value, c,
                       SUM(c) OVER w AS s,
                       SUM(c * c) OVER w AS ss,
                       COUNT(c) OVER w AS n
                FROM base
                WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_id, event_type, value,
                   floor(((c - s / n)
                          / NULLIF(sqrt(greatest(ss / n - (s / n) * (s / n),
                                                 0)), 0))
                         * 10000 + 0.5) / 10000 AS z_score,
                   abs((c - s / n)
                       / NULLIF(sqrt(greatest(ss / n - (s / n) * (s / n),
                                              0)), 0)) > 3 AS is_anomaly
            FROM stats
            WHERE n >= 20
        """,
        # stream-stream interval join: bounded drain of the watermarked
        # inner join equals the batch self-join (streaming/windows.py
        # stream_click_purchase_join)
        "stream_click_purchase_join": """
            SELECT c.user_id,
                   c.event_id AS click_id,
                   p.event_id AS purchase_id,
                   CAST(c.ts AS TIMESTAMP_NS) AS click_ts,
                   CAST(p.ts AS TIMESTAMP_NS) AS purchase_ts,
                   p.value AS purchase_value
            FROM events c
            JOIN events p
              ON c.user_id = p.user_id
             AND c.event_type = 'click'
             AND p.event_type = 'purchase'
             AND p.ts >= c.ts
             AND p.ts <= c.ts + INTERVAL '1 hour'
        """,
        "stream_hourly_tumbling": """
            SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP_NS)
                       AS window_start,
                   event_type,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       / 100 AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "stream_sliding_windows": """
            SELECT CAST(time_bucket(INTERVAL '30 minutes', ts)
                       - t.i * INTERVAL '30 minutes' AS TIMESTAMP_NS)
                       AS window_start,
                   event_type,
                   COUNT(*) AS event_count
            FROM events
            CROSS JOIN (SELECT unnest([0, 1]) AS i) t
            GROUP BY 1, 2
        """,
        "stream_session_windows": """
            WITH base AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
            ),
            flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_session
                FROM base
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sessions AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            )
            SELECT user_id,
                   CAST(MIN(ts) AS TIMESTAMP_NS) AS session_start,
                   CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP_NS)
                       AS session_end,
                   COUNT(*) AS event_count
            FROM sessions
            GROUP BY user_id, sid
        """,
        "stream_user_running_counts": """
            SELECT user_id, COUNT(*) AS events_seen,
                   CAST(MAX(ts) AS TIMESTAMP_NS) AS last_ts
            FROM events
            GROUP BY user_id
        """,
        # r09: no oracle-less entries remain — the two approx twins
        # report deterministic-bound verdicts (see their SQL above),
        # and every approximate index build (minhash bands, sign-LSH,
        # IVF) is twinned exactly in DuckDB so even the approximation
        # is hash-checked.
    }
    # recall@k composes the two entries' own replays — the measurement
    # itself is hash-checked, not just the underlying top-k sets
    d["ann_recall_report"] = """
        WITH exact AS ({d_exact}),
             approx AS ({d_approx})
        SELECT 10 AS k,
               CAST((SELECT COUNT(*) FROM exact e
                     JOIN approx a ON e.vec_id = a.vec_id) AS BIGINT)
                   AS n_overlap,
               CAST((100 * (SELECT COUNT(*) FROM exact e
                            JOIN approx a ON e.vec_id = a.vec_id)) // 10
                   AS BIGINT) AS recall_pct
    """.replace("{d_exact}", d["ann_cosine_topk"]).replace(
        "{d_approx}", d["ann_pq_topk"]
    )
    return d
