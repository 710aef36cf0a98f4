#!/usr/bin/env python
"""Per-stage empirical probe (guide §1.1/§7.1 without a browser): run a
query once, then pull stage metrics from the local Spark UI REST API —
executor run/CPU time, shuffle read/write bytes, input bytes, task
count — sorted by run time. This is the "open the Stages tab" loop for
a headless host; structural counts stay reproducible when wall seconds
are not.

Usage: python scripts/probe_stages.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg2any_spark.plans.queries import QUERIES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402


def rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="probe-stages", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in sys.argv[1:]:
        seen = {s["stageId"] for s in rest(spark, "/stages")}
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        stages = [
            s
            for s in rest(spark, "/stages")
            if s["stageId"] not in seen and s["status"] != "SKIPPED"
        ]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"== {name}: wall={wall:.2f}s stages={len(stages)} "
              f"tasks={sum(s['numTasks'] for s in stages)}")
        for s in stages[:14]:
            print(
                f"  stage {s['stageId']:>4} run={s['executorRunTime']/1e3:7.2f}s "
                f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
                f"tasks={s['numTasks']:>4} "
                f"in={s.get('inputBytes',0)/2**20:8.1f}M "
                f"sr={s.get('shuffleReadBytes',0)/2**20:8.1f}M "
                f"sw={s.get('shuffleWriteBytes',0)/2**20:8.1f}M "
                f"gc={s.get('jvmGcTime',0)/1e3:6.2f}s  "
                f"{s.get('name','')[:70]}"
            )


if __name__ == "__main__":
    main()
