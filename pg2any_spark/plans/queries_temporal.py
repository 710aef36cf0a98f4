"""Temporal-operator queries: as-of join, range banding, interval
join — the custom-operator surface Spark's API lacks directly,
re-expressed as compositions (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg2any_spark.operators.temporal import (
    asof_join,
    bucketize,
    interval_join,
    range_join_binned,
)
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
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
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
            F.round(F.sum((F.col("o_totalprice")).cast("decimal(18,6)")), 2).cast("double").alias("revenue"),
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


@query(
    "range_join_error_purchase_global",
    oracle="""
    SELECT e.event_id AS error_id,
           COUNT(p.event_id) AS n_purchases,
           CAST(ROUND(COALESCE(SUM(CAST(p.value AS DECIMAL(18,6))), 0), 2)
                AS DOUBLE) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 5 MINUTE
    GROUP BY e.event_id
    ORDER BY error_id
    """,
)
def range_join_error_purchase_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS range correlation: purchases anywhere in the system
    within 5 minutes after each error (incident-impact shape — no
    shared key, so a naive join is cartesian). Uses the binned
    range-join rewrite (`range_join_binned`): gap-sized time bins turn
    the pure range predicate into a hash equi-join on the bin; the
    oracle keeps the raw range-join form to prove the rewrite. Inner
    pairs are re-joined to the full error set broadcast-style via a
    left join on the aggregated counts."""
    from pg2any_spark.caching import managed_persist

    ev = load_table(spark, "events", sf_dir)
    # both the binned pair join and the final zero-count left join
    # traverse the error projection — persist it so the events scan
    # runs once per side
    errors = managed_persist(
        ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("p_value"),
        F.col("ts").alias("p_ts"),
    )
    pairs = range_join_binned(
        errors, purchases, left_ts="e_ts", right_ts="p_ts", max_gap_seconds=300
    )
    per_error = pairs.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum((F.col("p_value")).cast("decimal(18,6)")), 2).cast("double").alias("purchase_value"),
    )
    return (
        errors.select("error_id")
        .join(per_error, "error_id", "left")
        .select(
            "error_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
        )
        .orderBy("error_id")
    )


@query(
    "scd2_customer_history",
    oracle="""
    WITH v1 AS (
        SELECT c_custkey, c_acctbal,
               CAST(c_custkey AS BIGINT) AS valid_from_lsn,
               CAST(CASE WHEN c_custkey % 3 = 0 THEN c_custkey + 10000000
                         WHEN c_custkey % 7 = 0 THEN c_custkey + 20000000
                    END AS BIGINT) AS valid_to_lsn
        FROM customer
    ),
    v2 AS (
        SELECT c_custkey, c_acctbal + 1000 AS c_acctbal,
               CAST(c_custkey + 10000000 AS BIGINT) AS valid_from_lsn,
               CAST(CASE WHEN c_custkey % 7 = 0 THEN c_custkey + 20000000
                    END AS BIGINT) AS valid_to_lsn
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT c_custkey, c_acctbal, valid_from_lsn, valid_to_lsn,
           (valid_to_lsn IS NULL) AS is_current
    FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    ORDER BY c_custkey, valid_from_lsn
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build from the synthesized customer CDC stream
    (insert-all -> +1000 update for custkey%3==0 -> delete custkey%7==0):
    every row VERSION with its LSN validity interval, one shuffle total
    (operators/scd2.py). The oracle reconstructs the expected intervals
    directly from the synthesis predicates."""
    from pg2any_spark.operators.scd2 import scd2_from_events
    from pg2any_spark.sources.cdc_gen import synth_customer_events

    events = synth_customer_events(spark, sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    hist = scd2_from_events(events, cust.schema, ["c_custkey"])
    return hist.select(
        "c_custkey", "c_acctbal", "valid_from_lsn", "valid_to_lsn", "is_current"
    ).orderBy("c_custkey", "valid_from_lsn")


@query(
    "scd2_snapshot_time_travel",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 AND c_custkey + 10000000 <= 15000000
                THEN c_acctbal + 1000
                ELSE c_acctbal END AS c_acctbal
    FROM customer
    WHERE c_custkey <= 15000000
      AND NOT (c_custkey % 7 = 0 AND c_custkey + 20000000 <= 15000000)
    ORDER BY c_custkey
    """,
)
def scd2_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel over the SCD2 history: state as of LSN 15,000,000.
    A pure validity-interval filter over the history (no
    recomputation); distinct from the destructive apply's final state,
    which has the deletes.

    The oracle mirrors the synthesis predicates AT THE SNAPSHOT LSN
    (insert visible iff its LSN ``c_custkey`` ≤ 15M, the update
    applied iff ``c_custkey + 10M`` ≤ 15M, the delete iff
    ``c_custkey + 20M`` ≤ 15M) rather than the fixture-closed form
    "everyone inserted+updated, nobody deleted" — the two coincide at
    every driver SF, but the round-10 full-registry 10× battery caught
    the closed form claiming rows the event stream genuinely does not
    support at that LSN (key-shifted copies whose insert LSNs exceed
    15M are NOT yet visible; the engine's 30,000-row answer was the
    correct time travel, the old oracle was wrong at that scale)."""
    from pg2any_spark.operators.scd2 import scd2_from_events, scd2_snapshot_at
    from pg2any_spark.sources.cdc_gen import synth_customer_events

    events = synth_customer_events(spark, sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    hist = scd2_from_events(events, cust.schema, ["c_custkey"])
    snap = scd2_snapshot_at(hist, 15_000_000)
    return snap.select("c_custkey", "c_acctbal").orderBy("c_custkey")


@query(
    "timeseries_gapfill_daily_orders",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n_orders, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1, 2
    ),
    r AS (
        SELECT o_orderpriority, MIN(day) AS lo, MAX(day) AS hi
        FROM b GROUP BY o_orderpriority
    ),
    spine AS (
        SELECT o_orderpriority,
               CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                           CAST(hi AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM r
    )
    SELECT s.o_orderpriority, s.day,
           COALESCE(b.n_orders, 0) AS n_orders,
           ROUND(COALESCE(b.revenue, 0), 2) AS revenue,
           ROUND(last_value(b.revenue IGNORE NULLS) OVER (
               PARTITION BY s.o_orderpriority ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS last_seen_revenue
    FROM spine s LEFT JOIN b
      ON s.o_orderpriority = b.o_orderpriority AND s.day = b.day
    ORDER BY s.o_orderpriority, s.day
    """,
)
def timeseries_gapfill_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill per order priority (`timeseries.gapfill_daily`):
    dense daily spine from a per-key min/max agg + explode(sequence),
    zero-fill for additive measures, carry-forward for level measures.
    One (key, day) shuffle — the floor cost of per-key time-series
    math; the spine never cross-joins a calendar table."""
    from pg2any_spark.operators.timeseries import gapfill_daily

    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum((F.col("o_totalprice")).cast("decimal(18,6)")), 2).cast("double").alias("revenue"),
    ).withColumn("last_seen_revenue", F.col("revenue"))
    dense = gapfill_daily(
        daily,
        ["o_orderpriority"],
        "day",
        fill_zero={"n_orders": F.lit(0), "revenue": F.lit(0.0)},
        carry_cols=["last_seen_revenue"],
    )
    return dense.select(
        "o_orderpriority",
        "day",
        "n_orders",
        F.round("revenue", 2).alias("revenue"),
        F.round("last_seen_revenue", 2).alias("last_seen_revenue"),
    ).orderBy("o_orderpriority", "day")
