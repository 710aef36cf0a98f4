#!/usr/bin/env python
"""Interleaved same-session A/B of an env-flag-controlled plan shape.

Usage:
  python scripts/ab_flag.py FLAG_NAME query1 [query2 ...] [--reps N]

Per rep the flag is flipped 0 -> 1 for the whole query list, so the two
arms sample the same host phase; medians per (query, arm) are printed.
The flag must be read at QUERY BUILD time (our toggles read os.environ
inside the operator), so both arms run in one Spark session.
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
    args = sys.argv[1:]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    flag, names = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab-{flag}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    runs: dict[str, dict[str, list[float]]] = {
        n: {"0": [], "1": []} for n in names
    }
    for r in range(reps):
        for arm in ("0", "1"):
            os.environ[flag] = arm
            for name in names:
                spark.sparkContext.setJobDescription(f"{name} arm={arm} rep={r}")
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                runs[name][arm].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {}
    for name in names:
        med = {}
        for arm in ("0", "1"):
            xs = sorted(runs[name][arm])
            med[arm] = xs[len(xs) // 2]
        out[name] = {
            "arm0_median": med["0"], "arm1_median": med["1"],
            "speedup_1_over_0": round(med["0"] / med["1"], 3) if med["1"] else None,
            "arm0_runs": runs[name]["0"], "arm1_runs": runs[name]["1"],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
