#!/usr/bin/env python
"""A/B a set of session confs over a query subset: times each query
median-of-N in ONE session per variant (fresh process per variant via
re-exec is the caller's job — run this script once per variant).

Usage:
  python scripts/ab_conf.py '<json-conf-dict>' <reps> <query> [query ...]

Prints one JSON line {"conf": ..., "queries": {name: med_sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg2any_spark.plans.queries import QUERIES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402


def main() -> None:
    conf = json.loads(sys.argv[1])
    reps = int(sys.argv[2])
    subset = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-conf", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    out = {}
    for name in subset:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[name] = round(runs[len(runs) // 2], 3)
    out["__total__"] = round(sum(out.values()), 3)
    print(json.dumps({"conf": conf, "queries": out}))


if __name__ == "__main__":
    main()
