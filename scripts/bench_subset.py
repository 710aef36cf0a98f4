#!/usr/bin/env python
"""A/B bisection helper: time a fixed query subset in THIS checkout.
Usage: python scripts/bench_subset.py [sf_dir]  (run from repo root or worktree)"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from pg2any_spark.plans.queries import QUERIES
from pg2any_spark.session import get_spark

SUBSET = ["q1_pricing_summary", "dedup_simhash", "retrieval_bm25_topk",
          "kmv_distinct_ngrams", "cdc_apply_toast", "ann_cosine_topk_bruteforce",
          "cms_token_frequency", "lm_bigram_perplexity"]

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    t = {}
    for name in SUBSET:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        t[name] = round(time.perf_counter() - t0, 3)
    t["__total__"] = round(sum(t.values()), 3)
    print(json.dumps(t))

if __name__ == "__main__":
    main()
