#!/usr/bin/env python
"""Deterministic plan-structure probe: run each query once and report
jobs / stages / tasks it scheduled (StatusTracker) plus wall seconds.
Task and stage counts are reproducible on a noisy host where seconds
are not — the structural before/after evidence for shuffle-removal
optimizations.

Usage: python scripts/probe_structure.py <query> [query ...]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-structure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in sys.argv[1:]:
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        jobs = [
            j for j in (tracker.getJobIdsForGroup(None) or [])
            if j not in before_jobs
        ]
        stages, tasks = set(), 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for sid in info.stageIds:
                if sid in stages:
                    continue
                stages.add(sid)
                si = tracker.getStageInfo(sid)
                if si is not None:
                    tasks += si.numTasks
        out[name] = {
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": tasks,
            "sec": round(wall, 2),
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
