#!/usr/bin/env python
"""Skewed-scale leg (round-9 verdict item 5): measure the queries
whose skew defenses exist for exactly this shape — one hot key at ~1%
mass per stress surface (see ``make_sf_scale.py --skew``) — on the
UNIFORM 10x fixture vs the ZIPF-HOT 10x fixture, same row counts.

For each query: one discarded warm run + median-of-3, per fixture.
The output ``skew_amp`` column is skew_median / uniform_median — the
runtime amplification one hot key causes. Correctness at the skewed
fixture is checked separately (``check_oracle.py /tmp/sfskew10 ...``);
this script measures.

Usage: python scripts/skew_probe.py [uniform_dir] [skew_dir] [out_json]
       (defaults /tmp/sfscale10 /tmp/sfskew10 SCALE_SKEW_r10.json)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg2any_spark.plans.queries import QUERIES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402

#: query -> the skew surface it stresses
TARGETS = {
    # duplicated-first-key global rank / distribution / prefix sum
    "value_distribution_scalable": "hot l_extendedprice (~1% one value)",
    "window_value_distribution": "hot l_extendedprice",
    "orders_value_deciles": "hot order values via hot customer",
    "token_budget_selection": "hot docs (identical text, one LM mass)",
    # hot customer: per-group ranking / argmax / top-k
    "topk_customers_by_revenue": "hot o_custkey (~1% of orders)",
    "window_top_orders_per_customer": "hot o_custkey fat window group",
    "argmax_order_per_customer": "hot o_custkey fat agg group",
    # hot user: sessionize + transition-graph hub
    "sessionize_events": "hot user_id (~1% of events, one session key)",
    "graph_pagerank_events": "hot user transition chain",
    # hot part: co-purchase wedge fan-out
    "graph_triangle_census": "hub part in ~1% of lineitem",
    # hot band key / shingle df / 25-gram occurrence caps
    "dedup_minhash_lsh": "1% identical docs -> one hot band bucket",
    "dedup_lsh_hot_cap": "hot band bucket vs the cap",
    "dedup_simhash_near_pairs": "identical-doc clique in hamming blocks",
    "dedup_simhash_wide_near_pairs": "same clique, 60-bit scale path",
    "dedup_exact_substring": "hot 25-grams vs occurrence cap",
    "xs_probe_hot_grams": "cap report under hot grams",
    "dedup_containment": "hot shingles vs df cap",
    "containment_hot_shingles": "cap report under hot shingles",
    # hot vector: IVF cell / SRP bucket / tie density
    "ann_ivf_topk": "1% identical vectors -> one hot IVF cell",
    "ann_lsh_topk": "hot SRP bucket",
    "semdedup_cells": "hot semantic cell",
}


def _measure(spark, name: str, sf_dir: str) -> dict:
    fn = QUERIES[name]
    fn(spark, sf_dir).count()  # warm (footer cache, codegen), discarded
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"median": round(statistics.median(runs), 3),
            "runs": runs, "rows": n}


def main() -> None:
    uniform = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale10"
    skew = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfskew10"
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SKEW_r10.json",
    )
    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {
        "fixtures": {"uniform": uniform, "skew": skew},
        "loadavg_pre": round(os.getloadavg()[0], 2),
        "queries": {},
    }
    for name, surface in TARGETS.items():
        u = _measure(spark, name, uniform)
        s = _measure(spark, name, skew)
        amp = round(s["median"] / u["median"], 2) if u["median"] else None
        out["queries"][name] = {
            "surface": surface,
            "uniform": u,
            "skew": s,
            "skew_amp": amp,
        }
        print(
            f"# {name}: uniform {u['median']}s ({u['rows']} rows) -> "
            f"skew {s['median']}s ({s['rows']} rows), amp {amp}x",
            file=sys.stderr,
        )
    out["loadavg_at_exit"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "metric": "skew_amplification",
        "n_queries": len(out["queries"]),
        "worst": sorted(
            ((v["skew_amp"], k) for k, v in out["queries"].items()
             if v["skew_amp"] is not None),
            reverse=True,
        )[:5],
        "out": os.path.basename(out_path),
    }))


if __name__ == "__main__":
    main()
