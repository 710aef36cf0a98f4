"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: ordered CDC apply of a synthesized
change-event stream onto the ``customer`` fixture (the reference's
core capability, re-expressed Spark-first).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2; the driver cross-checks each against DuckDB.

Ordering contract: the driver's correctness gate checks the FIRST 50
entries of ``queries()`` in iteration order. ``RECHECK_FIRST`` (reds
under rework + their interpretation anchors) is emitted first, then
queries that have never earned a driver row, then the cumulative
``DRIVER_VERIFIED`` set (re-confirmations), with the two no-oracle
sketches dead last. Round 8's window: the 14 recast-oracle queries
(the 13 round-7 reds + the latent ``lm_bigram_perplexity`` — all
fixed by ``CAST(... AS BIGINT)`` on their HUGEINT-typed output
columns, the round-7 judge's proven mechanism) + the 2 new hugeint
mechanism canaries (``canary_hugeint_bare`` expected RED,
``canary_hugeint_cast`` expected GREEN — the controlled pair that
driver-confirms the diagnosis), then the 23 round-8 queries with no
driver row yet (``value_distribution_scalable``,
``heavy_hitters_tokens``, ``heavy_hitters_streaming``,
``retrieval_hybrid_rrf``, ``token_budget_selection``,
``ann_matryoshka_recall``, ``media_phash_near_dup``,
``source_format_parity``, ``graph_pagerank_events``,
``events_anomaly_mad``, ``orders_value_deciles``, and the late-r8
twelve: ``classifier_auc_exact``, ``sessionize_events_stream``,
``integrity_audit_orders``, ``shard_striped_by_size``,
``embedding_dim_stats``, ``collocations_pmi_topk``,
``bitext_margin_mining``, ``er_blocked_fuzzy_parts``,
``zorder_skipping_audit``, ``interval_join_stream``,
``basket_frequent_pairs``, ``graph_triangle_census`` — all twelve
locally hash-green at sf0.001/0.01/0.1), then 11 verified
re-confirms — the stalest (r2–r6) greens rotate in ahead of the
queries round 7 just re-confirmed (``R7_RECONFIRMED``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pg2any_spark.plans import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: Queries with a full-pass driver row in CORRECTNESS_r02.json or
#: CORRECTNESS_r03.json. Re-checking one spends a priority slot for no
#: new evidence, so these are emitted after never-checked queries.
DRIVER_VERIFIED = {
    # r01/r02 greens
    "cdc_apply_customer", "cdc_apply_multi_table", "cdc_incremental_agg_view",
    "q1_pricing_summary", "cdc_apply_truncate", "cdc_apply_orders_full_identity",
    "cdc_apply_streaming_tx", "q3_shipping_priority", "q5_local_supplier_volume",
    "q10_returned_items", "window_top_orders_per_customer",
    "window_running_revenue", "window_lag_events", "rollup_sales_by_region_nation",
    "cube_orders_status_priority", "setop_active_both_years",
    "setop_lapsed_customers", "semi_join_urgent_customers",
    "anti_join_unsold_parts", "events_daily_by_type", "events_json_props",
    "distinct_supplier_part_counts",
    "topk_customers_by_revenue", "q6_forecast_revenue", "text_stats_documents",
    "doc_fingerprint_rolling", "lang_id_documents", "dedup_exact_recrawl",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_simhash_near_pairs", "ann_cosine_topk_bruteforce", "ann_lsh_topk",
    "embedding_near_dup", "ann_ivf_topk", "embedding_centroids_by_label",
    "ivf_kmeans_refined_centroids", "token_hist_by_lang", "cdc_debezium_envelope",
    "media_metadata", "media_image_features", "media_frame_samples",
    "media_resize", "doc_quality_bands", "cdc_envelope_roundtrip",
    "training_pipeline_docs", "dedup_dup_groups", "split_train_eval",
    # r03 greens (48 hash-matched rows in CORRECTNESS_r03.json)
    "mix_weighted_sources", "decontaminate_train_split", "top_ngrams_corpus",
    "tfidf_top_terms_per_doc", "pii_redaction_docs", "doc_repetition_stats",
    "decontaminate_ngram_overlap", "temperature_mix_by_lang",
    "source_lang_profile", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q22_idle_rich_customers",
    "q14_promo_revenue_share", "q12_priority_by_linestatus",
    "q19_bracketed_revenue", "q13_order_count_distribution",
    "q7_cross_nation_trade", "full_outer_daily_click_purchase",
    "pivot_status_by_priority", "grouping_sets_revenue",
    "percentile_order_value_by_segment", "stats_lineitem_price_qty",
    "argmax_order_per_customer", "string_funcs_part", "date_funcs_orders",
    "sessionize_events", "retention_cohorts", "funnel_view_click_purchase",
    "rolling_7d_revenue", "window_value_distribution",
    "setop_surplus_1997_orders", "asof_click_before_purchase",
    "range_band_order_revenue", "interval_join_purchase_errors",
    "range_join_error_purchase_global", "scd2_customer_history",
    "scd2_snapshot_time_travel", "timeseries_gapfill_daily_orders",
    "q2_min_cost_supplier", "q4_order_priority", "q8_market_share",
    "q9_product_profit", "q11_important_parts", "q15_top_supplier",
    "q16_supplier_part_counts", "q20_excess_suppliers", "q21_waiting_suppliers",
    # r04 greens (49 hash-matched rows in CORRECTNESS_r04.json; the one
    # red, corpus_filter_funnel, stays OUT so round 5 re-checks it first)
    "ann_int8_recall", "array_funcs_events", "bpe_merges_corpus",
    "bpe_tokenize_docs", "cdc_apply_multi_table_bucketed",
    "cdc_streaming_agg_view", "cross_source_duplication",
    "dedup_incremental_index", "dedup_keep_best",
    "dedup_lexical_semantic_agreement", "dedup_lsh_recall_report",
    "embedding_outliers", "knn_label_embeddings",
    # lm_bigram_perplexity was green here (r4) but its oracle was
    # re-typed HUGEINT by the r6 rewrite → re-pinned via RECHECK_FIRST
    "pack_sequences_budget", "vocab_growth_curve",
    # r05 greens (47 hash-matched rows in CORRECTNESS_r05.json; the three
    # reds — corpus_filter_funnel, perplexity_bucket_sampling,
    # line_dedup_c4 — stay OUT and are pinned first via RECHECK_FIRST)
    "cdc_apply_pgoutput", "cdc_apply_pgoutput_streamed",
    "dedup_repeated_spans", "dedup_lsh_hot_cap", "media_audio_features",
    # r06 greens (38 hash-matched rows in CORRECTNESS_r06.json; the 12
    # reds stay OUT — reworked integer-exact in round 7 and re-pinned
    # via RECHECK_FIRST. perplexity_probe_nll / line_dedup_probe_digest
    # were green but stay pinned as interpretation anchors for their
    # red siblings, and lang_id_documents / text_stats_documents are
    # re-pinned from r2: their per-doc outputs decide whether the r6
    # env still agrees with the r2 env on tokenization.)
    "cdc_apply_toast", "cdc_apply_schema_evolution", "cdc_apply_two_phase",
    "cdc_apply_quarantined_feed", "cdc_join_view", "semdedup_cells",
    "gopher_quality_rules", "upsample_epochs_by_source",
    "decontaminate_semantic", "chunk_context_windows", "cms_token_frequency",
    "sample_fixed_n_per_lang", "cms_streaming_tokens", "clean_unicode_docs",
    "kmv_distinct_ngrams", "hist_quantile_order_value", "nb_lang_confusion",
    "pq_code_balance", "ann_ivfpq_recall", "retrieval_bm25_topk",
    "source_quota_cap",
    # r07 greens (37 hash-matched rows in CORRECTNESS_r07.json; the 13
    # reds — all the HUGEINT oracle-typing artifact, recast in r8 —
    # stay OUT and are pinned first via RECHECK_FIRST). Folds in the
    # 10 round-7 canaries/probes, the newly-green dsir_importance
    # rework, and the green line-dedup / perplexity anchors.
    "perplexity_probe_nll", "line_dedup_probe_digest",
    "dsir_importance_scores", "line_dedup_probe_nlines",
    "line_dedup_probe_footer", "canary_engine_agree", "canary_duck_pin",
    "canary_spark_pin", "tok_probe_perdoc", "lang_probe_scores",
    "quality_probe_ints", "repetition_probe_ints", "lm_probe_vocab",
}

#: Engine-specific sketch queries with no cross-engine oracle — they can
#: never hash-match, so they must never occupy a priority slot. Emitted
#: dead last regardless of verification status.
NO_ORACLE = {"approx_distinct_parts", "approx_percentile_order_value"}

#: Greens the round-7 driver run just re-confirmed (hash-matched rows
#: in CORRECTNESS_r07.json outside RECHECK_FIRST). Re-checking one in
#: round 8 spends a slot on the freshest evidence in the repo, so they
#: sort behind the DRIVER_VERIFIED queries whose last driver row is
#: older (r2–r6) — the 34 re-confirm slots rotate through the stalest
#: greens first.
R7_RECONFIRMED = {
    "cdc_apply_customer", "cdc_apply_pgoutput", "cdc_apply_toast",
    "cdc_apply_schema_evolution", "cdc_apply_two_phase",
    "cdc_apply_quarantined_feed", "cdc_apply_multi_table",
    "cdc_apply_multi_table_bucketed", "cdc_incremental_agg_view",
    "q1_pricing_summary", "cdc_apply_truncate",
    "cdc_apply_orders_full_identity", "cdc_apply_pgoutput_streamed",
    "cdc_apply_streaming_tx", "q3_shipping_priority",
    "q5_local_supplier_volume", "q10_returned_items",
    "window_top_orders_per_customer", "window_running_revenue",
    "window_lag_events", "rollup_sales_by_region_nation",
    "cube_orders_status_priority", "text_stats_documents",
    "lang_id_documents", "perplexity_probe_nll",
    "line_dedup_probe_digest", "dsir_importance_scores",
    "line_dedup_probe_nlines", "line_dedup_probe_footer",
    "canary_engine_agree", "canary_duck_pin", "canary_spark_pin",
    "tok_probe_perdoc", "lang_probe_scores", "quality_probe_ints",
    "repetition_probe_ints", "lm_probe_vocab",
}

#: Round 8: the 13 round-7 reds + the latent ``lm_bigram_perplexity``
#: (driver-green in r4, silently re-typed HUGEINT by the round-6
#: oracle rewrite) — all 14 recast ``CAST(... AS BIGINT)`` per the
#: round-7 judge's proven HUGEINT mechanism — plus the two new
#: mechanism canaries (bare expected RED / cast expected GREEN).
#: Emitted before everything else so the re-check happens even if the
#: never-checked bucket ever outgrows the 50-slot window.
RECHECK_FIRST = {
    # the 13 round-7 reds, oracles recast to BIGINT outputs
    "corpus_filter_funnel", "funnel_probe_quality", "funnel_probe_repetition",
    "funnel_probe_lang", "funnel_probe_lm",
    "perplexity_bucket_sampling", "line_dedup_c4", "line_dedup_probe_counts",
    "dsir_resample_counts", "pq_ann_topk", "ann_ivfpq_topk",
    "decontaminate_bloom_counts", "bloom_streaming_grams",
    # latent: r4 green, oracle re-typed HUGEINT by the r6 rewrite and
    # never re-checked since; recast in r8 and re-pinned
    "lm_bigram_perplexity",
    # the one-bit mechanism pair (driver-confirms the r7 diagnosis)
    "canary_hugeint_bare", "canary_hugeint_cast",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.cdc_apply_customer(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def bucket(n: str) -> int:
        if n in RECHECK_FIRST:
            return -1
        if n in NO_ORACLE:
            return 3
        if n not in DRIVER_VERIFIED:
            return 0
        # stalest greens (last driver row r2–r6) rotate in before the
        # ones round 7 just re-confirmed
        return 2 if n in R7_RECONFIRMED else 1

    # sorted() is stable, so registration order is preserved within
    # each bucket: never-checked first, verified next, no-oracle last
    names = sorted(Q.QUERIES, key=bucket)
    return {n: Q.QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
