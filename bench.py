#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion (collect or count — full plan
execution, not lazy). The CDC apply throughput maps to the reference's
end-to-end rows/s envelope (BASELINE.md: ≥~1,333 rows/s sustained).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg2any_spark.plans.queries import QUERIES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402

#: Headline set: CDC apply path, scan-agg, multi-way joins, window,
#: set op, events aggs, dedup family, similarity, text, multimodal.
HEADLINE = [
    "cdc_apply_customer",
    "cdc_apply_orders_full_identity",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "topk_customers_by_revenue",
    "window_top_orders_per_customer",
    "events_daily_by_type",
    "dedup_exact_recrawl",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk_bruteforce",
    "ann_ivf_topk",
    "text_stats_documents",
    "media_metadata",
    "cdc_debezium_envelope",
    "token_hist_by_lang",
    "ivf_kmeans_refined_centroids",
    # round 3: SCD2 history build; keyless binned range join
    "scd2_customer_history",
    "range_join_error_purchase_global",
    # round 4: single-shuffle funnel, dieted TF-IDF, dedup-stack QA
    "funnel_view_click_purchase",
    "tfidf_top_terms_per_doc",
    "dedup_lexical_semantic_agreement",
    # round 4b: incremental dedup probe, LM quality scoring, filter funnel
    "dedup_incremental_index",
    "lm_bigram_perplexity",
    "corpus_filter_funnel",
    # round 5: capped LSH (boilerplate defense), line-level dedup,
    # audio feature extraction
    "dedup_lsh_hot_cap",
    "line_dedup_c4",
    "media_audio_features",
    # round 5b: full wire path (pgoutput encode -> segment decode -> apply)
    "cdc_apply_pgoutput",
    # round 6: unchanged-TOAST merge apply (per-column latest-set
    # aggregate + stored-row fallback join through the wire); PQ ANN
    # (integer-exact asymmetric-distance scan over 8x subquantizers)
    "cdc_apply_toast",
    "pq_ann_topk",
    # round 6b: BM25 inverted-index retrieval; cluster-blocked
    # semantic dedup (SemDeDup)
    "retrieval_bm25_topk",
    "semdedup_cells",
    # round 6c: mid-stream schema evolution through the wire;
    # context-window chunking; count-min sketch frequencies;
    # embedding-space decontamination
    "cdc_apply_schema_evolution",
    "chunk_context_windows",
    "cms_token_frequency",
    "decontaminate_semantic",
    # round 6c cont.: histogram quantiles, KMV cardinality, unicode
    # hygiene, exact-quota sampling
    "hist_quantile_order_value",
    "kmv_distinct_ngrams",
    "clean_unicode_docs",
    "sample_fixed_n_per_lang",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="pg2any_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen + datasource warm-up so the first measured query
    # doesn't pay session initialization: a trivial codegen plan, plus
    # one read of the 5-row region table to load the Hadoop/parquet
    # reader classes (measured tables stay cold).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Per-query delta vs the latest recorded round (BENCH_r{N}.json):
    # a real regression becomes visible THE ROUND IT HAPPENS instead
    # of two rounds later in a judge diff. Only queries drifting >=20%
    # AND >=0.2s are listed (below that is local[32] noise); the delta
    # block is advisory — the headline metric is unchanged.
    import glob as _glob

    here = os.path.dirname(os.path.abspath(__file__))
    prior_paths = sorted(_glob.glob(os.path.join(here, "BENCH_r[0-9]*.json")))
    if prior_paths:
        # the driver's BENCH_r{N}.json wraps this script's JSON line
        # inside a "tail" string field — unwrap it when present
        try:
            with open(prior_paths[-1]) as f:
                rec = json.load(f)
            if "queries" not in rec and "tail" in rec:
                line = [
                    ln for ln in rec["tail"].splitlines()
                    if ln.startswith("{") and '"queries"' in ln
                ]
                rec = json.loads(line[-1]) if line else {}
            prior = rec.get("queries", {})
        except (OSError, json.JSONDecodeError, IndexError):
            prior = {}
        deltas = {}
        for name, t in timings.items():
            p = prior.get(name)
            if p and t >= p * 1.2 and t - p >= 0.2:
                deltas[name] = {"prev": p, "now": t,
                                "pct": round((t - p) / p * 100, 1)}
        record["regressions_vs"] = os.path.basename(prior_paths[-1])
        record["regressions"] = deltas
    # Chaos headline (reference scenario 5 analogue): measured by
    # tests/test_scenarios.py::test_s5_megarow_single_tx_hard_kill_bucketed
    # — 1M-row (3M with PG2ANY_CHAOS_ROWS) single-transaction feed,
    # SIGKILL mid-stream, restart, exact-state verify. Carried from
    # its artifact (the run itself takes minutes and two JVMs;
    # re-running it per bench would dwarf the query suite).
    import glob as _glob

    here = os.path.dirname(os.path.abspath(__file__))
    for chaos_path in sorted(_glob.glob(os.path.join(here, "CHAOS_*M.json"))):
        key = "chaos_sigkill_" + os.path.basename(chaos_path)[6:-5].lower()
        with open(chaos_path) as f:
            record[key] = json.load(f)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
