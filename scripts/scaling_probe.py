#!/usr/bin/env python
"""Measured scaling: representative queries at sf0.001 / 0.01 / 0.1.

The scale story in SCALE.md argues each operator's cost is linear-ish
in input (modulo fixed Spark overhead); this probe measures it. For
each query and SF the wall time is the median of 3 runs on a warmed
session. The printed exponent is the log-log slope between sf0.01 and
sf0.1 (the two sizes where fixed overhead stops dominating): slope ≈ 1
means linear data cost, ≪ 1 means overhead-bound at these sizes, ≫ 1
flags super-linear blowup (the thing that kills a 100× scale-up).

Usage: python scripts/scaling_probe.py [query ...]
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pg2any_spark.plans.queries import QUERIES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

#: Optional extra scale point: a dir made by scripts/make_sf_scale.py
#: (e.g. /tmp/sfscale10). Set SPARK_GRAFT_EXTRA_SF_DIR to include it;
#: the slope column then also reports the 0.1→extra step.
import os as _os  # noqa: E402

EXTRA_DIR = _os.environ.get("SPARK_GRAFT_EXTRA_SF_DIR")
#: Scale multiple of EXTRA_DIR relative to sf0.1 (make_sf_scale.py's
#: default build is 10 copies). Must match the actual fixture or the
#: 0.1→extra slope denominator is wrong (round-9 advisor finding).
EXTRA_MULT = float(_os.environ.get("SPARK_GRAFT_EXTRA_SF_MULT", "10"))
DEFAULT = [
    "q1_pricing_summary",          # scan-agg
    "q3_shipping_priority",        # multi-join + top-k
    "cdc_apply_customer",          # CDC apply reduction
    "dedup_minhash_lsh",           # banded self-join
    "ann_cosine_topk_bruteforce",  # Arrow matmul
    "scd2_customer_history",       # window over event stream
    "range_join_error_purchase_global",  # binned range join
    "tfidf_top_terms_per_doc",     # two-level agg + window
    "lm_bigram_perplexity",        # bigram-count tables + scoring join
    "dedup_incremental_index",     # batch-vs-index band probe
    "corpus_filter_funnel",        # composed per-row filters + LM join
    "line_dedup_c4",               # line explode + owner min + fp join
    "dedup_repeated_spans",        # gram explode + islands window
    "media_audio_features",        # Arrow synth + parse (payload-bound)
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    points = [(sf, f"/root/testdata/sf{sf}") for sf in SFS]
    if EXTRA_DIR:
        points.append(("extra", EXTRA_DIR))
    for name in names:
        fn = QUERIES[name]
        times = {}
        for sf, sf_dir in points:
            fn(spark, sf_dir).count()  # warm (footer cache, codegen)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            times[sf] = round(statistics.median(runs), 3)
        slope = math.log(times["0.1"] / times["0.01"]) / math.log(10)
        out[name] = {**times, "slope_01_to_1": round(slope, 2)}
        if EXTRA_DIR:
            out[name]["slope_1_to_extra"] = round(
                math.log(times["extra"] / times["0.1"])
                / math.log(EXTRA_MULT), 2
            )
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
