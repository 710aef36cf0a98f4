"""Temporal-operator queries: as-of join, range banding, interval
join — the custom-operator surface Spark's API lacks directly,
re-expressed as compositions (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg2any_spark.operators.temporal import asof_join, bucketize, interval_join
from pg2any_spark.plans.queries import query
from pg2any_spark.sources.fixtures import load_table


@query(
    "asof_click_before_purchase",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.ts, c.click_id
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the same user's most recent
    click at or before it (attribution shape). One shuffle on user_id,
    sorted carry-forward — verified against DuckDB's native ASOF JOIN.
    Right side pre-reduced to one row per (user, ts) so ties are
    deterministic."""
    ev = load_table(spark, "events", sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return asof_join(
        purchases, clicks, on="ts", by=["user_id"], right_cols=["click_id"]
    )


@query(
    "range_band_order_revenue",
    oracle="""
    SELECT b.band_idx,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    JOIN (VALUES (0, 0.0, 100000.0), (1, 100000.0, 200000.0),
                 (2, 200000.0, 300000.0), (3, 300000.0, 400000.0),
                 (4, 400000.0, 1e18)) AS b(band_idx, lo, hi)
      ON o_totalprice >= b.lo AND o_totalprice < b.hi
    GROUP BY b.band_idx
    ORDER BY b.band_idx
    """,
)
def range_band_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-dimension join rewritten as shuffle-free bucket
    assignment: band = count of sorted boundaries ≤ value (a pure
    projection) — the oracle keeps the BETWEEN-join form to prove the
    rewrite is semantics-preserving."""
    orders = load_table(spark, "orders", sf_dir)
    band = bucketize(F.col("o_totalprice"), [100000.0, 200000.0, 300000.0, 400000.0])
    return (
        orders.withColumn("band_idx", band.cast("int"))
        .groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("band_idx")
    )


@query(
    "interval_join_purchase_errors",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id,
           p.user_id,
           date_diff('microsecond', p.ts, e.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts
     AND e.ts <= p.ts + INTERVAL 60 MINUTE
    ORDER BY purchase_id, error_id
    """,
)
def interval_join_purchase_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded interval join: errors within an hour of a
    purchase by the same user. Equi-join on user_id (hash join), range
    predicate as a post-filter — the per-key pair space stays bounded
    by the window."""
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    joined = interval_join(
        p, e, by=["user_id"], left_ts="p_ts", right_ts="e_ts",
        max_gap_seconds=3600, right_by=["e_user"],
    )
    return joined.select(
        "purchase_id",
        "error_id",
        "user_id",
        (F.unix_micros(F.col("e_ts")) - F.unix_micros(F.col("p_ts"))).alias("gap_us"),
    ).orderBy("purchase_id", "error_id")
