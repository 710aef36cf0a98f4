"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: ordered CDC apply of a synthesized
change-event stream onto the ``customer`` fixture (the reference's
core capability, re-expressed Spark-first).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2; the driver cross-checks each against DuckDB.

Ordering contract: the driver's correctness gate checks the FIRST 50
entries of ``queries()`` in iteration order. Standing policy since
round 10 (196 of the registered queries have been driver-green at
least once; the only never-green rows are the two no-oracle sketches
and the intentionally-red retired hugeint canary): queries that have
never earned a driver row are emitted first, then every green query
ordered STALEST-FIRST by the round of its most recent driver-green
row in ``LAST_GREEN`` (regenerated each round via
``scripts/regen_last_green.py`` from the CORRECTNESS artifacts), so
each round's 50-slot window re-validates the oldest evidence in the
repo. One override: ``RECHECK_FIRST`` — queries whose engine or
oracle CHANGED this round pre-empt the staleness order (a changed
query is a bigger correctness risk than a stale green). The round-11
window is: the 6 round-11 rebuilds/fixes (ER factorization, the two
repaired timeout oracles, the simhash bits=60 family), then the 10 r6
+ 37 r7 stale greens, filling to exactly 50 with the r8 head; after a
clean round-11 window no green in the registry is older than round 8
except the r8 tail. The two retired hugeint mechanism canaries
(purpose served — the round-8 driver split them exactly as predicted,
bare RED / cast GREEN, confirming the HUGEINT-hash diagnosis) and the
two engine-specific approx sketches (no cross-engine oracle by
construction) are parked dead last so they never consume a priority
slot again.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pg2any_spark.plans import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: Round of each query's most recent full-pass driver row
#: (rows+schema+hash in CORRECTNESS_r0N.json, cumulative r1–r8).
#: Regenerated each round from the correctness artifacts; a registered
#: query absent here has never been driver-green and sorts first.
LAST_GREEN = {
    # last driver-green in round 6 (10 queries)
    "ann_ivfpq_recall": 6, "clean_unicode_docs": 6,
    "cms_streaming_tokens": 6, "hist_quantile_order_value": 6,
    "kmv_distinct_ngrams": 6, "nb_lang_confusion": 6, "pq_code_balance": 6,
    "retrieval_bm25_topk": 6, "sample_fixed_n_per_lang": 6,
    "source_quota_cap": 6,
    # last driver-green in round 7 (37 queries)
    "canary_duck_pin": 7, "canary_engine_agree": 7, "canary_spark_pin": 7,
    "cdc_apply_customer": 7, "cdc_apply_multi_table": 7,
    "cdc_apply_multi_table_bucketed": 7,
    "cdc_apply_orders_full_identity": 7, "cdc_apply_pgoutput": 7,
    "cdc_apply_pgoutput_streamed": 7, "cdc_apply_quarantined_feed": 7,
    "cdc_apply_schema_evolution": 7, "cdc_apply_streaming_tx": 7,
    "cdc_apply_toast": 7, "cdc_apply_truncate": 7,
    "cdc_apply_two_phase": 7, "cdc_incremental_agg_view": 7,
    "cube_orders_status_priority": 7, "dsir_importance_scores": 7,
    "lang_id_documents": 7, "lang_probe_scores": 7,
    "line_dedup_probe_digest": 7, "line_dedup_probe_footer": 7,
    "line_dedup_probe_nlines": 7, "lm_probe_vocab": 7,
    "perplexity_probe_nll": 7, "q10_returned_items": 7,
    "q1_pricing_summary": 7, "q3_shipping_priority": 7,
    "q5_local_supplier_volume": 7, "quality_probe_ints": 7,
    "repetition_probe_ints": 7, "rollup_sales_by_region_nation": 7,
    "text_stats_documents": 7, "tok_probe_perdoc": 7,
    "window_lag_events": 7, "window_running_revenue": 7,
    "window_top_orders_per_customer": 7,
    # last driver-green in round 8 (49 queries)
    "ann_ivfpq_topk": 8, "ann_matryoshka_recall": 8,
    "anti_join_unsold_parts": 8, "basket_frequent_pairs": 8,
    "bitext_margin_mining": 8, "bloom_streaming_grams": 8,
    "canary_hugeint_cast": 8, "cdc_join_view": 8,
    "cdc_streaming_agg_view": 8, "classifier_auc_exact": 8,
    "collocations_pmi_topk": 8, "corpus_filter_funnel": 8,
    "decontaminate_bloom_counts": 8, "distinct_supplier_part_counts": 8,
    "dsir_resample_counts": 8, "embedding_dim_stats": 8,
    "er_blocked_fuzzy_parts": 8, "events_anomaly_mad": 8,
    "events_daily_by_type": 8, "events_json_props": 8,
    "funnel_probe_lang": 8, "funnel_probe_lm": 8,
    "funnel_probe_quality": 8, "funnel_probe_repetition": 8,
    "graph_pagerank_events": 8, "graph_triangle_census": 8,
    "heavy_hitters_streaming": 8, "heavy_hitters_tokens": 8,
    "integrity_audit_orders": 8, "interval_join_stream": 8,
    "line_dedup_c4": 8, "line_dedup_probe_counts": 8,
    "lm_bigram_perplexity": 8, "media_phash_near_dup": 8,
    "orders_value_deciles": 8, "perplexity_bucket_sampling": 8,
    "pq_ann_topk": 8, "q6_forecast_revenue": 8, "retrieval_hybrid_rrf": 8,
    "semi_join_urgent_customers": 8, "sessionize_events_stream": 8,
    "setop_active_both_years": 8, "setop_lapsed_customers": 8,
    "shard_striped_by_size": 8, "source_format_parity": 8,
    "token_budget_selection": 8, "topk_customers_by_revenue": 8,
    "value_distribution_scalable": 8, "zorder_skipping_audit": 8,
    # last driver-green in round 9 (50 queries)
    "argmax_order_per_customer": 9, "asof_click_before_purchase": 9,
    "cdc_envelope_roundtrip": 9, "date_funcs_orders": 9,
    "decontaminate_ngram_overlap": 9, "decontaminate_train_split": 9,
    "dedup_containment": 9, "dedup_dup_groups": 9,
    "dedup_exact_substring": 9, "dedup_exact_substring_excise": 9,
    "doc_quality_bands": 9, "doc_repetition_stats": 9,
    "full_outer_daily_click_purchase": 9, "funnel_view_click_purchase": 9,
    "grouping_sets_revenue": 9, "interval_join_purchase_errors": 9,
    "media_frame_samples": 9, "media_image_features": 9,
    "media_metadata": 9, "media_resize": 9, "mix_weighted_sources": 9,
    "percentile_order_value_by_segment": 9, "pii_redaction_docs": 9,
    "pivot_status_by_priority": 9, "q12_priority_by_linestatus": 9,
    "q13_order_count_distribution": 9, "q14_promo_revenue_share": 9,
    "q17_small_quantity_revenue": 9, "q18_large_volume_customers": 9,
    "q19_bracketed_revenue": 9, "q22_idle_rich_customers": 9,
    "q7_cross_nation_trade": 9, "range_band_order_revenue": 9,
    "range_join_error_purchase_global": 9, "retention_cohorts": 9,
    "rolling_7d_revenue": 9, "sessionize_events": 9,
    "setop_surplus_1997_orders": 9, "source_lang_profile": 9,
    "split_leakage_probe": 9, "split_leakage_safe": 9,
    "split_train_eval": 9, "stats_lineitem_price_qty": 9,
    "string_funcs_part": 9, "temperature_mix_by_lang": 9,
    "tfidf_top_terms_per_doc": 9, "top_ngrams_corpus": 9,
    "training_pipeline_docs": 9, "window_value_distribution": 9,
    "xs_probe_hot_grams": 9,
    # last driver-green in round 10 (50 queries)
    "ann_cosine_topk_bruteforce": 10, "ann_int8_recall": 10,
    "ann_ivf_topk": 10, "ann_lsh_topk": 10, "array_funcs_events": 10,
    "bpe_merges_corpus": 10, "bpe_tokenize_docs": 10,
    "cdc_debezium_envelope": 10, "chunk_context_windows": 10,
    "cms_token_frequency": 10, "containment_hot_shingles": 10,
    "cross_source_duplication": 10, "decontaminate_semantic": 10,
    "dedup_exact_recrawl": 10, "dedup_incremental_index": 10,
    "dedup_keep_best": 10, "dedup_lexical_semantic_agreement": 10,
    "dedup_lsh_hot_cap": 10, "dedup_lsh_recall_report": 10,
    "dedup_minhash_lsh": 10, "dedup_ngram_jaccard": 10,
    "dedup_repeated_spans": 10, "dedup_simhash": 10,
    "dedup_simhash_near_pairs": 10, "dedup_simhash_wide_near_pairs": 10,
    "doc_fingerprint_rolling": 10, "embedding_centroids_by_label": 10,
    "embedding_near_dup": 10, "embedding_outliers": 10,
    "gopher_quality_rules": 10, "ivf_kmeans_refined_centroids": 10,
    "knn_label_embeddings": 10, "media_audio_features": 10,
    "pack_sequences_budget": 10, "q11_important_parts": 10,
    "q15_top_supplier": 10, "q16_supplier_part_counts": 10,
    "q20_excess_suppliers": 10, "q21_waiting_suppliers": 10,
    "q2_min_cost_supplier": 10, "q4_order_priority": 10,
    "q8_market_share": 10, "q9_product_profit": 10,
    "scd2_customer_history": 10, "scd2_snapshot_time_travel": 10,
    "semdedup_cells": 10, "timeseries_gapfill_daily_orders": 10,
    "token_hist_by_lang": 10, "upsample_epochs_by_source": 10,
    "vocab_growth_curve": 10,
}

#: Parked dead last, never spending a window slot:
#: - the two engine-specific approx sketches (HLL/KLL — no cross-engine
#:   oracle by construction, rows-only forever);
#: - the retired round-8 hugeint mechanism canaries. Their one-bit job
#:   is done: CORRECTNESS_r08 shows ``canary_hugeint_bare`` red on hash
#:   only and ``canary_hugeint_cast`` green in the same window, the
#:   driver-confirmed proof of the HUGEINT-hash mechanism. They stay
#:   registered as executable documentation of that mechanism.
PARKED = {
    "approx_distinct_parts", "approx_percentile_order_value",
    "canary_hugeint_bare", "canary_hugeint_cast",
}

#: Queries whose ENGINE or ORACLE changed this round — the riskiest
#: rows in the registry, so they pre-empt the staleness order and take
#: the head of the window for an independent driver re-confirmation
#: (all are locally hash-green at sf0.001/0.01/0.1 and at the 10x
#: fixture after the change). Round 11: the value-factorized
#: brand-enriched ER rebuild, the two repaired timeout oracles, and
#: the simhash family behind the bits=60 blocking fix. Reset this set
#: each round.
RECHECK_FIRST = {
    "er_blocked_fuzzy_parts",
    "ivf_kmeans_refined_centroids",
    "graph_triangle_census",
    "dedup_simhash_wide_near_pairs",
    "dedup_simhash_near_pairs",
    "dedup_simhash",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.cdc_apply_customer(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def bucket(n: str) -> int:
        if n in PARKED:
            return 99
        if n in RECHECK_FIRST:
            return -1
        # never driver-checked sorts before everything (round 0);
        # otherwise stalest evidence first
        return LAST_GREEN.get(n, 0)

    # sorted() is stable, so registration order is preserved within
    # each staleness bucket
    names = sorted(Q.QUERIES, key=bucket)
    return {n: Q.QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
