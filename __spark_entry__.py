"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: ordered CDC apply of a synthesized
change-event stream onto the ``customer`` fixture (the reference's
core capability, re-expressed Spark-first).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2; the driver cross-checks each against DuckDB.

Ordering contract: the driver's correctness gate checks the FIRST 50
entries of ``queries()`` in iteration order. Queries that have never
earned a driver row are emitted first, then the ones already verified
in a previous round (CORRECTNESS_r01/r02), so the 50-slot window
always covers the largest never-checked surface. New queries added in
any round are automatically in the priority window (they are not in
``DRIVER_VERIFIED``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pg2any_spark.plans import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: Queries with a full-pass driver row in CORRECTNESS_r02.json (49 hash
#: matches + approx_distinct_parts, rows-only by design — it can never
#: hash-match, so re-checking it spends a slot for no new evidence).
DRIVER_VERIFIED = {
    "cdc_apply_customer", "cdc_apply_multi_table", "cdc_incremental_agg_view",
    "q1_pricing_summary", "cdc_apply_truncate", "cdc_apply_orders_full_identity",
    "cdc_apply_streaming_tx", "q3_shipping_priority", "q5_local_supplier_volume",
    "q10_returned_items", "window_top_orders_per_customer",
    "window_running_revenue", "window_lag_events", "rollup_sales_by_region_nation",
    "cube_orders_status_priority", "setop_active_both_years",
    "setop_lapsed_customers", "semi_join_urgent_customers",
    "anti_join_unsold_parts", "events_daily_by_type", "events_json_props",
    "distinct_supplier_part_counts", "approx_distinct_parts",
    "topk_customers_by_revenue", "q6_forecast_revenue", "text_stats_documents",
    "doc_fingerprint_rolling", "lang_id_documents", "dedup_exact_recrawl",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_simhash_near_pairs", "ann_cosine_topk_bruteforce", "ann_lsh_topk",
    "embedding_near_dup", "ann_ivf_topk", "embedding_centroids_by_label",
    "ivf_kmeans_refined_centroids", "token_hist_by_lang", "cdc_debezium_envelope",
    "media_metadata", "media_image_features", "media_frame_samples",
    "media_resize", "doc_quality_bands", "cdc_envelope_roundtrip",
    "training_pipeline_docs", "dedup_dup_groups", "split_train_eval",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.cdc_apply_customer(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    unchecked = {n: f for n, f in Q.QUERIES.items() if n not in DRIVER_VERIFIED}
    checked = {n: f for n, f in Q.QUERIES.items() if n in DRIVER_VERIFIED}
    return {**unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
