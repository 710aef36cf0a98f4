#!/usr/bin/env python
"""A/B: CDC event-synthesis explode-form vs 3-branch union (VERDICT r2 #4).

Round 2 rewrote ``synth_customer_events`` / ``synth_orders_events``
from a 3-branch union (one base-table scan per op kind) to a single
scan that explodes each row into its 1-3 events. The driver's r2 bench
then showed the two cdc_apply queries regressing 67-140%, coincident
with a fixture regeneration — so the question is whether the explode
form is actually faster on the current environment, holding everything
else fixed.

This script times the FULL apply path (synthesis -> ordered apply ->
collect-free count) for both forms, interleaved A/B/A/B over N rounds
on the same warmed session, and prints a JSON verdict. Run on an
otherwise idle machine.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from pg2any_spark.operators.apply import apply_changes  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402
from pg2any_spark.sources import cdc_gen  # noqa: E402
from pg2any_spark.sources.cdc_gen import _DELETE_BASE, _UPDATE_BASE  # noqa: E402
from pg2any_spark.sources.fixtures import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 5


def _text(col):
    return F.col(col).cast("string")


def union_customer_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 3-branch union form (3 scans of customer)."""
    cust = load_table(spark, "customer", sf_dir)
    cols = cust.columns
    after_full = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]), F.array(*[_text(c) for c in cols])
    )
    upd_after = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(
            *[
                (F.col("c_acctbal") + F.lit(1000.0)).cast("string")
                if c == "c_acctbal"
                else _text(c)
                for c in cols
            ]
        ),
    )
    key_map = F.create_map(F.lit("c_custkey"), _text("c_custkey"))
    null_map = F.lit(None).cast("map<string,string>")
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00"))

    def envelope(src, op, txid, lsn_col, before, after):
        return src.select(
            F.lit(op).alias("op"),
            F.lit("public").alias("schema"),
            F.lit("customer").alias("table"),
            F.lit(txid).cast("long").alias("txid"),
            lsn_col.cast("long").alias("lsn"),
            ts.alias("commit_ts"),
            before.alias("before"),
            after.alias("after"),
            F.array(F.lit("c_custkey")).alias("key_columns"),
            F.lit("default").alias("replica_identity"),
        )

    k = F.col("c_custkey")
    inserts = envelope(cust, "c", 1000, k, null_map, after_full)
    updates = envelope(
        cust.filter(k % cdc_gen.UPDATE_MOD == 0), "u", 2000, k + _UPDATE_BASE,
        key_map, upd_after,
    )
    deletes = envelope(
        cust.filter(k % cdc_gen.DELETE_MOD == 0), "d", 3000, k + _DELETE_BASE,
        key_map, null_map,
    )
    return inserts.unionByName(updates).unionByName(deletes)


def union_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 2-branch union form (2 scans of orders)."""
    orders = load_table(spark, "orders", sf_dir)
    full_map = F.map_from_arrays(
        F.array(*[F.lit(c) for c in orders.columns]),
        F.array(*[_text(c) for c in orders.columns]),
    )
    null_map = F.lit(None).cast("map<string,string>")
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    k = F.col("o_orderkey")

    def envelope(src, op, txid, lsn_col, before, after):
        return src.select(
            F.lit(op).alias("op"),
            F.lit("public").alias("schema"),
            F.lit("orders").alias("table"),
            F.lit(txid).cast("long").alias("txid"),
            lsn_col.cast("long").alias("lsn"),
            ts.alias("commit_ts"),
            before.alias("before"),
            after.alias("after"),
            F.array(F.lit("o_orderkey")).alias("key_columns"),
            F.lit("full").alias("replica_identity"),
        )

    inserts = envelope(orders, "c", 10, k, null_map, full_map)
    deletes = envelope(
        orders.filter(k % 4 == 1), "d", 11, k + _DELETE_BASE, full_map, null_map
    )
    return inserts.unionByName(deletes)


def run_apply(spark, synth_fn, table, key_cols, sf_dir):
    schema = load_table(spark, table, sf_dir).schema
    t0 = time.time()
    events = synth_fn(spark, sf_dir)
    applied = apply_changes(
        events, schema, key_cols, table=table, scan_for_truncate=False
    )
    n = applied.count()
    return time.time() - t0, n


def main():
    spark = get_spark(app_name="ab-cdc-synth")
    cases = {
        "customer_explode": (cdc_gen.synth_customer_events, "customer", ["c_custkey"]),
        "customer_union": (union_customer_events, "customer", ["c_custkey"]),
        "orders_explode": (cdc_gen.synth_orders_events, "orders", ["o_orderkey"]),
        "orders_union": (union_orders_events, "orders", ["o_orderkey"]),
    }
    # warm-up (JIT, parquet footer cache) — not timed
    for fn, table, keys in cases.values():
        run_apply(spark, fn, table, keys, SF_DIR)
    times = {k: [] for k in cases}
    rowcounts = {}
    for _ in range(ROUNDS):
        for name, (fn, table, keys) in cases.items():
            sec, n = run_apply(spark, fn, table, keys, SF_DIR)
            times[name].append(sec)
            rowcounts[name] = n
    out = {
        name: {
            "median_s": round(statistics.median(ts), 3),
            "min_s": round(min(ts), 3),
            "rows": rowcounts[name],
        }
        for name, ts in times.items()
    }
    out["verdict"] = {
        "customer": "explode" if out["customer_explode"]["median_s"]
        <= out["customer_union"]["median_s"] else "union",
        "orders": "explode" if out["orders_explode"]["median_s"]
        <= out["orders_union"]["median_s"] else "union",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
