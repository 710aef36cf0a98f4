"""Bucketed replica tables: the join must be shuffle-free.

Pins the load-bearing 100 TB claim in sinks/bucketed.py: once both
sides are bucketed on the join key with equal bucket counts, the join
plans with ZERO Exchange — the shuffle was paid at write time.
"""

from __future__ import annotations

import pytest

from pg2any_spark.sinks.bucketed import colocated_join, write_bucketed
from pg2any_spark.sources.fixtures import load_table


def explain(df, mode: str = "simple") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    write_bucketed(
        load_table(spark, "orders", sf_dir), "orders_b",
        ["o_custkey"], num_buckets=8,
    )
    write_bucketed(
        load_table(spark, "customer", sf_dir), "customer_b",
        ["c_custkey"], num_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    # force the non-broadcast path: broadcast would hide the shuffle
    # question entirely (and can't apply when both sides are huge,
    # which is the 100 TB case this models)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            spark.table("orders_b")["o_custkey"]
            == spark.table("customer_b")["c_custkey"],
        )
        plan = explain(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # write-time sortBy is only consumed when the scan reports its
        # output ordering (one file per bucket + the opt-in conf;
        # Spark 3+ dropped it by default, SPARK-28169 lineage)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        try:
            # re-build: the plan is resolved at DataFrame construction
            joined2 = spark.table("orders_b").join(
                spark.table("customer_b"),
                spark.table("orders_b")["o_custkey"]
                == spark.table("customer_b")["c_custkey"],
            )
            plan_sorted = explain(joined2)
            assert "Exchange" not in plan_sorted, plan_sorted
            assert "Sort " not in plan_sorted.replace("SortMergeJoin", ""), (
                plan_sorted
            )
        finally:
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_correct(spark, sf_dir, bucketed_tables):
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    expected = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            spark.table("orders_b")["o_custkey"]
            == spark.table("customer_b")["c_custkey"],
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key reuses the bucketing too — a second
    query family amortizing the same write-time shuffle."""
    from pyspark.sql import functions as F

    agg = spark.table("orders_b").groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    plan = explain(agg)
    assert "Exchange" not in plan, plan
