"""Second relational batch: correlated subqueries, conditional
aggregation, outer joins, pivot, percentiles, scalar-function
surfaces, grouping sets, statistical aggregates.

These extend SURVEY §2.6 (classic relational operators absent in the
reference, mandatory in our engine). Shapes follow TPC-H Q7/Q13/Q14/
Q17/Q18/Q19/Q22 adapted to the driver's reduced fixture columns
(lineitem has no commitdate/shipmode; orders has no comment/clerk).

Oracle-parity rules inherited from queries.py/queries_ml.py: identical
aliases on both sides, ROUND every float aggregate, explicit casts at
timestamp comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pg2any_spark.plans.queries import query
from pg2any_spark.session import temp_conf
from pg2any_spark.sources.fixtures import load_table

#: Shuffle-partition count for the stateful streaming queries
#: (state-store layout, NOT batch parallelism): each micro-batch
#: pays a per-partition state open/commit, so an availableNow drain
#: of a few small batches wants few, fatter state partitions. A
#: production deployment sizes this to cores x executors like any
#: shuffle; the value only binds at the FIRST start of a checkpoint
#: (Spark pins state partitioning per checkpoint thereafter).
STREAM_STATE_PARTITIONS = "8"


# ---------------------------------------------------------------------------
# Correlated / scalar subqueries
# ---------------------------------------------------------------------------


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (avg quantity per
    part) decorrelated into an aggregate + join — exactly the plan
    Catalyst produces for the subquery form. The per-part avg table is
    small (one row per part) and broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING → aggregate + semi
    join. The HAVING aggregate is map-side combinable; the semi join
    shuffles only orderkeys that survive the threshold."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"), "o_totalprice",
        )
        .agg(F.round(F.sum((F.col("l_quantity")).cast("decimal(18,6)")), 2).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_custs,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global avg) +
    NOT EXISTS anti join (no urgent order — every fixture customer has
    *some* order, which would make the classic form empty). The scalar
    stays IN the plan as a broadcast cross-join against the 1-row
    aggregate — one lazy lineage, no separate driver job."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .drop("__avg_bal")
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum((F.col("c_acctbal")).cast("decimal(18,6)")), 2).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Conditional aggregation / CASE expressions
# ---------------------------------------------------------------------------


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: CASE-gated ratio aggregate over a broadcast
    dimension join; date filter pushed to the scan."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, "part", sf_dir))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_share"))
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts split by priority class."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, "orders", sf_dir)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q19_bracketed_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-AND predicate brackets across the join —
    the join keeps only rows any bracket accepts; Catalyst pushes the
    single-side conjuncts below the join."""
    li = load_table(spark, "lineitem", sf_dir)
    part = F.broadcast(load_table(spark, "part", sf_dir))
    j = li.join(part, li.l_partkey == part.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(bracket).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            ),
            2,
        ).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# Outer joins / multi-alias dimension joins
# ---------------------------------------------------------------------------


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less customers
    (COUNT of a nullable column skips NULLs), then a second aggregation
    over the counts."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q7_cross_nation_trade",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cust_nation, supp_nation
    ORDER BY volume DESC, cust_nation, supp_nation
    LIMIT 20
    """,
)
def q7_cross_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension joined twice under different
    aliases (customer nation vs supplier nation); both sides broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    nation = load_table(spark, "nation", sf_dir)
    cn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ))
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cn, cust.c_nationkey == F.col("cn_key"))
        .join(sn, supp.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,6)")
                ),
                2,
            ).cast("double").alias("volume")
        )
        .orderBy(F.col("volume").desc(), "cust_nation", "supp_nation")
        .limit(20)
    )


@query(
    "full_outer_daily_click_purchase",
    oracle="""
    SELECT COALESCE(c.day, p.day) AS day,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.n_purchases, 0) AS n_purchases,
           ROUND(COALESCE(p.purchase_value, 0), 2) AS purchase_value
    FROM (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY day
    ) c
    FULL OUTER JOIN (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n_purchases, SUM(value) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY day
    ) p ON c.day = p.day
    """,
)
def full_outer_daily_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-day aggregates (days with clicks but
    no purchases and vice versa both survive)."""
    ev = load_table(spark, "events", sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(day).agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("value").alias("purchase_value"),
        )
    )
    c, p = clicks.alias("c"), purchases.alias("p")
    return (
        c.join(p, F.col("c.day") == F.col("p.day"), "full_outer")
        .select(
            F.coalesce(F.col("c.day"), F.col("p.day")).alias("day"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
            F.round(F.coalesce(F.col("purchase_value"), F.lit(0)), 2).alias(
                "purchase_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Pivot / grouping sets / percentiles / statistical aggregates
# ---------------------------------------------------------------------------


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(ROUND(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,6))), 2) AS DOUBLE) AS F,
           CAST(ROUND(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END AS DECIMAL(18,6))), 2) AS DOUBLE) AS O,
           CAST(ROUND(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END AS DECIMAL(18,6))), 2) AS DOUBLE) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order status → columns. Values list supplied explicitly
    so Spark skips the extra distinct-scan job (and so this stays a
    single-pass conditional aggregation at scale)."""
    orders = load_table(spark, "orders", sf_dir)
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")))
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return piv.select(
        "o_orderpriority",
        *[
            F.round(F.coalesce(F.col(s), zero), 2).cast("double").alias(s)
            for s in ["F", "O", "P"]
        ],
    ).orderBy("o_orderpriority")


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    ORDER BY g_region, g_nation, r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers (distinct from
    rollup/cube already covered) — via the SQL surface, registering
    temp views, since the DataFrame API exposes only rollup/cube."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer")
    load_table(spark, "nation", sf_dir).createOrReplaceTempView("nation")
    load_table(spark, "region", sf_dir).createOrReplaceTempView("region")
    return spark.sql("""
        SELECT r_name, n_name,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               CAST(GROUPING(r_name) AS BIGINT) AS g_region,
               CAST(GROUPING(n_name) AS BIGINT) AS g_nation
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        ORDER BY g_region, g_nation, r_name NULLS FIRST, n_name NULLS FIRST
    """)


@query(
    "percentile_order_value_by_segment",
    oracle="""
    SELECT c_mktsegment,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def percentile_order_value_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per segment (Spark `percentile`
    ≡ DuckDB `quantile_cont`). At 100 TB swap to `approx_percentile`
    (t-digest sketch, map-side combinable, no sort) — exact percentile
    materializes per-group value multisets."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "stats_lineitem_price_qty",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           ROUND(stddev_samp(l_extendedprice), 2) AS price_stddev,
           ROUND(var_samp(l_quantity), 4) AS qty_var
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def stats_lineitem_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: corr / covar / stddev / variance — all
    single-pass map-side-combinable moments."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "qty_price_covar"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "argmax_order_per_customer",
    oracle="""
    SELECT c_custkey, c_name,
           max_by(o_orderkey, o_totalprice ORDER BY o_orderkey) AS biggest_order,
           ROUND(MAX(o_totalprice), 2) AS biggest_total
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
)
def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / arg-max aggregate (one shuffle, no window sort). The
    struct trick — max over (price, -orderkey) — pins the tiebreak so
    both engines pick the same order when totals tie."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.max(F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk")))
            .alias("m"),
        )
        .select(
            "c_custkey",
            "c_name",
            (-F.col("m.nk")).alias("biggest_order"),
            F.round(F.col("m.o_totalprice"), 2).alias("biggest_total"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Scalar-function surfaces (string / date / array-map)
# ---------------------------------------------------------------------------


@query(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           REPLACE(p_type, 'PROMO', 'PRM') AS type_abbrev,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green
    FROM part
    ORDER BY p_partkey
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: upper/substr/length/replace/concat_ws/
    lpad/LIKE — all JVM built-ins inside whole-stage codegen."""
    part = load_table(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("PRM")).alias("type_abbrev"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("is_green"),
    ).orderBy("p_partkey")


@query(
    "date_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o_orderdate) AS order_month,
           EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date
    FROM orders
    ORDER BY o_orderkey
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: extract components, truncation, date
    arithmetic, day difference."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint").alias("days_to_y2k"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
    ).orderBy("o_orderkey")


@query(
    "array_funcs_events",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
           len(list(DISTINCT event_type)) AS n_types,
           CASE WHEN list_contains(list(DISTINCT event_type), 'purchase')
                THEN 1 ELSE 0 END AS did_purchase
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def array_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: collect_set → sort → size/contains. The
    per-user distinct-type set is bounded (≤ #event types), so state
    stays small at any scale.

    The real ARRAY column is built and exercised (sort / size /
    contains), then serialized with ``array_join`` for the output
    contract — the driver's cross-engine hasher can't canonicalize
    Python lists, so both engines emit the same comma-joined string.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types_arr"))
        .select(
            "user_id",
            F.array_join("types_arr", ",").alias("types_seen"),
            F.size("types_arr").cast("bigint").alias("n_types"),
            F.array_contains("types_arr", "purchase").cast("int").alias("did_purchase"),
        )
        .orderBy("user_id")
    )


@query(
    "sessionize_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_s
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions via LAG + running SUM
    windows, then per-session aggregates. The batch twin of streaming
    session windows (`F.session_window` on the readStream side); one
    shuffle on user_id reused by both window steps and the final agg."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_sess = (
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 30 * 60)
    ).cast("bigint")
    return (
        ev.withColumn("is_new_session", new_sess)
        .withColumn("session_id", F.sum("is_new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
            .alias("duration_s"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "sessionize_events_stream",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               CAST(SUM(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_s
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def sessionize_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as a CONTINUOUS custom stateful operator
    (``streaming.pipeline.sessionize_stream`` —
    ``applyInPandasWithState`` keyed by user, one open session of
    constant bytes per active user in state), driver-checked against
    the batch gaps-and-islands oracle over the SAME events. The feed
    is split into time-contiguous shards (percentile cutoffs on ts
    keep the 0-second watermark monotone across batches, so no event
    is ever late), drained two shards per trigger — sessions therefore
    open in one micro-batch and close in a LATER one, exercising the
    cross-batch state path, plus event-time timeouts for users who go
    quiet. A final sentinel
    batch (one far-future event per user — ONE row per distinct user,
    the streaming-world flush analogue) closes every tail session;
    the sentinels' own singleton sessions stay open in state and are
    excluded by construction (their start is past the corpus max).
    At 100 TB/day state scales with concurrently-ACTIVE users only;
    the same query runs unmodified on a Kafka source."""
    from pg2any_spark.caching import managed_persist
    from pg2any_spark.plans.queries import _fresh_workdir
    from pg2any_spark.streaming.pipeline import sessionize_stream

    # Persisted (round-11, guide §1.2): five separate actions traverse
    # this projection before the stream starts — the percentile/max
    # pass, the three shard writes, and the sentinel's distinct-user
    # pass. One events scan instead of five; 3 narrow columns.
    ev = managed_persist(
        load_table(spark, "events", sf_dir).select("event_id", "ts", "user_id")
    )
    import glob
    import os
    import time

    tslong = F.col("ts").cast("long")
    cuts_row = ev.select(
        F.percentile_approx(tslong, F.lit([1.0 / 3, 2.0 / 3]), 10_000).alias(
            "cuts"
        ),
        F.max(tslong).alias("mx"),
    ).first()  # one job for both cut points and the max
    (cut1, cut2), max_ts = cuts_row["cuts"], cuts_row["mx"]
    work = _fresh_workdir("pg2any_sess_")
    src = f"{work}/events"
    sentinel_ts = max_ts + 10 * 24 * 3600  # ≫ gap past every real event
    batches = [
        ev.filter(tslong < cut1),
        ev.filter((tslong >= cut1) & (tslong < cut2)),
        ev.filter(tslong >= cut2),
        # sentinel batch: one far-future event per user flushes tails
        ev.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(sentinel_ts).cast("timestamp").alias("ts"),
            "user_id",
        ),
    ]
    # FileStreamSource orders unread files by modification time; the
    # 0-second watermark makes that order LOAD-BEARING (a reordered
    # shard would arrive entirely late and be dropped), so stamp each
    # batch's files with explicit strictly-increasing mtimes instead
    # of trusting write-completion timing/filesystem granularity.
    stamped: set[str] = set()
    t0 = time.time() - 3600
    for i, batch in enumerate(batches):
        batch.coalesce(1).write.mode("append").parquet(src)
        for p in glob.glob(f"{src}/*.parquet"):
            if p not in stamped:
                os.utime(p, (t0 + i, t0 + i))
                stamped.add(p)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        # two shards per trigger -> 2 micro-batches (shards 1+2, then
        # shard 3 + sentinel): the cut2 boundary still opens sessions
        # in batch 0 that close in batch 1 (the cross-batch state path
        # stays exercised, oracle-identical output), while the per-key
        # applyInPandasWithState invocations — the measured dominant
        # cost, ~0.3 ms of Arrow+state roundtrip per key per batch —
        # halve from 4x|users| to 2x|users|
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    sink = f"sessions_{work.rsplit('_', 1)[-1]}"
    # State-sized shuffle partitioning (see session.temp_conf): every
    # micro-batch pays a per-partition state open/commit, so the
    # 4-batch drain runs at STREAM_STATE_PARTITIONS instead of the
    # batch default — measured ~1.6x faster here with identical
    # results (fresh checkpoint; Spark pins state layout per
    # checkpoint, so the override is scoped to this query).
    with temp_conf(
        spark, **{"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
    ):
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drained = q.awaitTermination(300)
    if not drained:
        q.stop()  # don't leak a live stream + state store into the session
        raise TimeoutError("streaming sessionization did not drain in 300s")
    return (
        spark.table(sink)
        .filter(F.col("session_start").cast("long") <= max_ts)
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# Event analytics: retention cohorts + conversion funnel
# ---------------------------------------------------------------------------


@query(
    "retention_cohorts",
    oracle="""
    WITH first_act AS (
        SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ),
    cohort AS (
        SELECT user_id,
               CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week
        FROM first_act
    ),
    act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS act_week
        FROM events
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.act_week) // 7
                AS INTEGER) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY c.cohort_week, week_offset
    ORDER BY c.cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-activity week
    (cohort), counted in each subsequent activity week. Two shuffles —
    per-user min (map-side-combinable) and the cohort×offset distinct
    count; the (user, week) distinct runs before the join so the join
    input is already reduced."""
    ev = load_table(spark, "events", sf_dir)
    cohort = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id", F.to_date(F.date_trunc("week", "first_ts")).alias("cohort_week")
        )
    )
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("act_week")
    ).distinct()
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click,
           ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 4) AS view_to_click,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 4) AS view_to_purchase
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → first click strictly after it
    → first purchase strictly after that): the event-sequence shape
    behind product analytics.

    Single-shuffle plan: events are partitioned on ``user_id`` ONCE,
    then three stacked unbounded-frame window aggregates derive the
    stage times in sequence (each stage's predicate references the
    previous stage's column, so no joins and no re-shuffle — every
    Window and the per-user reduce reuse the same hash partitioning).
    The old form cascaded three groupBy+join stages all keyed on
    user_id (14 Exchanges); this is the same answer with 2."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id")
    t, typ = F.col("ts"), F.col("event_type")
    per_ev = (
        # only funnel-relevant types enter the shuffle (pushed to the
        # scan as an In filter); other types can never set a stage
        # time, and users with only such events contribute nothing to
        # the counts either way
        ev.filter(typ.isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
        .withColumn("t_view", F.min(F.when(typ == "view", t)).over(w))
        .withColumn(
            "t_click",
            F.min(F.when((typ == "click") & (t > F.col("t_view")), t)).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(F.when((typ == "purchase") & (t > F.col("t_click")), t)).over(w),
        )
    )
    per_user = per_ev.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    ).select(
        "n_view",
        "n_click_after_view",
        "n_purchase_after_click",
        F.round(
            F.col("n_click_after_view").cast("double") / F.col("n_view"), 4
        ).alias("view_to_click"),
        F.round(
            F.col("n_purchase_after_click").cast("double") / F.col("n_view"), 4
        ).alias("view_to_purchase"),
    )


@query(
    "rolling_7d_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS day_rev
        FROM orders GROUP BY day
    )
    SELECT day, day_rev,
           CAST(ROUND(SUM(CAST(day_rev AS DECIMAL(18,6))) OVER (
               ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS rolling_7d
    FROM daily ORDER BY day
    """,
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): 7-day trailing
    revenue per day. Spark's rangeBetween needs a numeric ordering
    key, so the day orders by epoch seconds with a −6·86400 lower
    bound — semantically identical to DuckDB's INTERVAL frame over
    dates. The daily pre-aggregation keeps the window input at one row
    per day regardless of order volume."""
    orders = load_table(spark, "orders", sf_dir)
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum((F.col("o_totalprice")).cast("decimal(18,6)")), 2).cast("double").alias("day_rev"))
    )
    w = (
        Window.orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return (
        daily.withColumn("rolling_7d", F.round(F.sum(F.col("day_rev").cast("decimal(18,6)")).over(w), 2).cast("double"))
        .orderBy("day")
    )


@query(
    "window_value_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(NTILE(10) OVER w AS INTEGER) AS decile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    over a GLOBAL order — deliberately the single-partition window
    shape. At 100 TB a global rank is computed differently (sample-based
    range partitioning or approx percentiles, see
    `percentile_order_value_by_segment`); this pins the exact semantics
    at the scale where a global window is the honest plan."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("o_orderkey")


@query(
    "value_distribution_scalable",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(NTILE(10) OVER w AS INTEGER) AS decile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def value_distribution_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME distribution report as ``window_value_distribution``
    (identical oracle), computed the way a 100 TB corpus has to: no
    single-partition window anywhere in the plan. ``similarity.
    global_distribution`` range-partitions on the total order, ranks
    per partition, broadcast-adds cumulative offsets, and derives each
    distribution function from its closed form over (rank, n) —
    PERCENT_RANK is literally the same (r−1)/(n−1) IEEE division the
    window function performs, CUME_DIST degenerates to r/n under a
    unique tiebreak, NTILE is the SQL-standard divmod bucket. The twin
    queries pin that the scale path and the semantic-reference path
    agree cell-for-cell."""
    from pg2any_spark.caching import managed_persist
    from pg2any_spark.operators import similarity as S

    orders = load_table(spark, "orders", sf_dir)
    # the quantile-boundary probe, the rank branch, the offsets branch
    # and the n-count each traverse the input — persist the 3-column
    # projection so the parquet scan runs once (same move as
    # zorder_skipping_audit's keyed table)
    return (
        S.global_distribution(
            managed_persist(
                orders.select("o_custkey", "o_orderkey", "o_totalprice")
            ),
            [F.col("o_totalprice"), F.col("o_orderkey")],
            buckets=10,
        )
        .select("o_custkey", "o_orderkey", "decile", "pct_rank", "cume")
        .orderBy("o_orderkey")
    )


@query(
    "setop_surplus_1997_orders",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
    ORDER BY o_custkey
    """,
)
def setop_surplus_1997_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag (multiset) semantics: each customer appears
    max(0, n_1997 - n_1998) times, i.e. their 1997 order SURPLUS.
    Distinct from the existing INTERSECT/EXCEPT queries, which are set
    semantics; Spark plans the multiset difference as one hash
    aggregate of signed counts + generate (no join)."""
    orders = load_table(spark, "orders", sf_dir)
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    y98 = orders.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    return y97.exceptAll(y98).orderBy("o_custkey")


@query("approx_percentile_order_value")  # no oracle: sketch is engine-specific
def approx_percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (the percentile scale path, like HLL for
    distinct counts): p50/p95 order value per priority. Rows-only at
    the driver gate — sketch outputs are engine-specific — with a
    rank-tolerance test vs the exact percentile in tests/test_queries.py
    (same contract as approx_distinct_parts)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_percentile("o_totalprice", 0.5, 10000).alias("p50"),
            F.approx_percentile("o_totalprice", 0.95, 10000).alias("p95"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "orders_value_deciles",
    oracle="""
    WITH banded AS (
        SELECT NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS decile,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM banded GROUP BY decile ORDER BY decile
    """,
)
def orders_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth value banding — the classic OLAP decile report
    (per band: row count, boundary values, total) — computed through
    the SCALE path: ``similarity.global_distribution`` supplies the
    NTILE bucket from the literal-boundary global rank (no
    single-partition window anywhere), and every reported statistic is
    BIGINT-exact (prices as cents; MIN/MAX/COUNT/SUM of integers are
    order-free). The equi-depth shape is what a fixed-edge histogram
    cannot give: each band holds the same ROW count, boundaries adapt
    to the distribution — the banding used for monetary percentile
    tiers and training-data difficulty tranches alike."""
    from pg2any_spark.operators import similarity as S

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice"
    )
    banded = S.global_distribution(
        orders, [F.col("o_totalprice"), F.col("o_orderkey")], buckets=10
    ).select(
        "decile",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    return (
        banded.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .withColumn("decile", F.col("decile").cast("int"))
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Data-integrity audit (constraint validation over the warehouse)
# ---------------------------------------------------------------------------


def _integrity_audit_orders_multiscan(o: DataFrame, li: DataFrame) -> DataFrame:
    """Pre-round-11 shape of ``integrity_audit_orders``: five
    independent scans, each audit partial-aggregating map-side before
    its own SMALL shuffle — vs the one-scan shape's full-cardinality
    (orderkey, linenumber) PK groupBy whose "partial" aggregation
    reduces nothing (the key is unique) and whose full-width shuffle
    output all five consumers re-read."""
    childless = o.join(
        li.select("l_orderkey").distinct(),
        o["o_orderkey"] == F.col("l_orderkey"),
        "left_anti",
    )
    orphans = li.join(
        o.select("o_orderkey").distinct(),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    )
    dups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    nulls = li.filter(
        F.col("l_orderkey").isNull() | F.col("l_linenumber").isNull()
    )
    oc = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    lc = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        ).alias("l_cents")
    )
    mismatch = oc.join(
        lc, oc["o_orderkey"] == lc["l_orderkey"]
    ).filter(F.abs(F.col("o_cents") - F.col("l_cents")) > 1)

    parts = [
        ("childless_orders", childless),
        ("dup_lineitem_pk", dups),
        ("null_lineitem_pk", nulls),
        ("orphan_lineitems", orphans),
        ("totalprice_mismatch_gt_1c", mismatch),
    ]
    out = None
    for rule, df in parts:
        row = df.agg(F.count(F.lit(1)).alias("__n")).select(
            F.lit(rule).alias("rule"),
            F.col("__n").cast("long").alias("n_violations"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("rule")


@query(
    "integrity_audit_orders",
    oracle="""
    WITH oc AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    lc AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax) * 100) AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT 'childless_orders' AS rule, CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey)
    UNION ALL
    SELECT 'dup_lineitem_pk', CAST(COUNT(*) AS BIGINT) FROM (
        SELECT 1 FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
    )
    UNION ALL
    SELECT 'null_lineitem_pk', CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey IS NULL OR l_linenumber IS NULL
    UNION ALL
    SELECT 'orphan_lineitems', CAST(COUNT(*) AS BIGINT) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'totalprice_mismatch_gt_1c', CAST(COUNT(*) AS BIGINT)
    FROM oc JOIN lc ON lc.l_orderkey = oc.o_orderkey
    WHERE ABS(oc.cents - lc.cents) > 1
    ORDER BY rule
    """,
)
def integrity_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-integrity audit — the constraint-validation
    pass a warehouse runs before trusting an ingest: referential
    integrity both directions (childless orders via LEFT ANTI against
    the distinct child keys, orphan lineitems likewise), primary-key
    uniqueness (dup (orderkey, linenumber) groups), NULL-key hygiene,
    and the ARITHMETIC invariant o_totalprice ≈ Σ extprice·(1−disc)·
    (1+tax) checked in exact BIGINT cents (per-row ROUND(x·100) — the
    identical single IEEE chain in both engines — so "off by more than
    one cent" is an integer predicate, never a float tolerance). Five
    independent map-side-combinable aggregates unioned into one
    (rule, n_violations) report; every join is on the warehouse's own
    keys, so the plan is all hash joins + partial counts — nothing
    funnels through a driver or a single task at any scale."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)

    # All five audits ride ONE pass over lineitem: a shared
    # (l_orderkey, l_linenumber) → (row count, exact-cents sum)
    # aggregate whose identical scan→Exchange subtree AQE executes
    # once (shuffle-stage reuse — deliberately NOT persisted; a cache
    # replaced the reused map stage with fixed-partition reads,
    # 56 → 543 tasks). The former shape scanned lineitem five times and
    # shuffled it four (childless-distinct, orphan anti-join, dup-PK
    # groupBy, per-order cents groupBy); every audit below is a
    # second-level aggregate of this table, exact by construction:
    # per-row ROUND(x·100) happens before any sum, and BIGINT sum is
    # associative, so the two-level cents rollup equals the former
    # one-level one. Null-key groups survive the groupBy, so the
    # anti-join / null-hygiene counts see the same rows.
    import os as _os

    if _os.environ.get("SPARK_GRAFT_INTEGRITY_MULTISCAN", "0") == "1":
        # Round-12 A/B arm: the pre-round-11 five-independent-scans
        # shape (each audit partial-aggregates map-side before its own
        # small shuffle; no full-cardinality PK groupBy).
        return _integrity_audit_orders_multiscan(o, li)
    g = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        ).alias("__cents"),
    )
    ok = o.select("o_orderkey", "o_totalprice")

    childless = ok.join(
        g.select("l_orderkey").distinct(),
        ok["o_orderkey"] == F.col("l_orderkey"),
        "left_anti",
    )
    # orphan/null-PK counts are ROW counts = Σ __n over the matching
    # groups (a 1-row sum, not a row expansion)
    orphans = g.join(
        ok.select("o_orderkey").distinct(),
        g["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    )
    dups = g.filter(F.col("__n") > 1)
    nulls = g.filter(
        F.col("l_orderkey").isNull() | F.col("l_linenumber").isNull()
    )
    oc = ok.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    lc = g.groupBy("l_orderkey").agg(F.sum("__cents").alias("l_cents"))
    mismatch = oc.join(
        lc, oc["o_orderkey"] == lc["l_orderkey"]
    ).filter(F.abs(F.col("o_cents") - F.col("l_cents")) > 1)

    count_groups = F.count(F.lit(1)).alias("__n")
    count_rows = F.coalesce(F.sum("__n"), F.lit(0)).alias("__n")
    parts = [
        ("childless_orders", childless, count_groups),
        ("dup_lineitem_pk", dups, count_groups),
        ("null_lineitem_pk", nulls, count_rows),
        ("orphan_lineitems", orphans, count_rows),
        ("totalprice_mismatch_gt_1c", mismatch, count_groups),
    ]
    out = None
    for rule, df, agg in parts:
        row = df.agg(agg).select(
            F.lit(rule).alias("rule"),
            F.col("__n").cast("long").alias("n_violations"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("rule")


# ---------------------------------------------------------------------------
# storage-layout optimization: Z-order (Morton) data-skipping audit
# ---------------------------------------------------------------------------

#: 16-bit Morton interleave of two 8-bit bucket ids (cx even bits,
#: dx odd bits) — pure integer bit arithmetic, identical in any engine.
_MORTON_TERMS = " + ".join(
    f"(((cx >> {i}) & 1) * {1 << (2 * i)}) + "
    f"(((dx >> {i}) & 1) * {1 << (2 * i + 1)})"
    for i in range(8)
)


@query(
    "zorder_skipping_audit",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               CAST(o_custkey % 256 AS BIGINT) AS cx,
               CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 256
                    AS BIGINT) AS dx,
               CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                    AS BIGINT) AS eday
        FROM orders
    ),
    keyed AS (
        SELECT *, CAST({_MORTON_TERMS} AS BIGINT) AS zkey FROM base
    ),
    zf AS (SELECT cx, dx,
                  NTILE(64) OVER (ORDER BY zkey, o_orderkey) AS f
           FROM keyed),
    df_ AS (SELECT cx, dx,
                   NTILE(64) OVER (ORDER BY eday, o_orderkey) AS f
            FROM keyed),
    zs AS (SELECT f, MIN(cx) mcx, MAX(cx) xcx, MIN(dx) mdx, MAX(dx) xdx
           FROM zf GROUP BY f),
    ds AS (SELECT f, MIN(cx) mcx, MAX(cx) xcx, MIN(dx) mdx, MAX(dx) xdx
           FROM df_ GROUP BY f)
    SELECT 'datesort' AS layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN mcx <= 17 AND 17 <= xcx THEN 1 ELSE 0 END)
                AS BIGINT) AS files_cust_scan,
           CAST(SUM(CASE WHEN xdx >= 100 AND mdx <= 110 THEN 1 ELSE 0 END)
                AS BIGINT) AS files_date_scan
    FROM ds
    UNION ALL
    SELECT 'zorder',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN mcx <= 17 AND 17 <= xcx THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN xdx >= 100 AND mdx <= 110 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM zs
    ORDER BY layout
    """,
)
def zorder_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER LAYOUT AUDIT — the lakehouse data-skipping question
    answered exactly: bucket orders into 64 equal-row "files" under
    two physical layouts (date-sorted ingest order vs a 16-bit Morton
    interleave of customer-bucket × day-bucket), collect per-file
    min/max zone maps on BOTH dimensions, and count how many files a
    point predicate on one dimension (cust bucket = 17) and a range
    predicate on the other (day bucket ∈ [100,110]) must scan. The
    date-sorted layout prunes only the date predicate; the Z-order
    layout trades a little of each — THE multi-dimensional-clustering
    trade-off, measured from real zone maps rather than asserted. The
    Morton key is pure integer bit arithmetic (identical in any
    engine); file assignment is the SQL-standard NTILE through
    ``similarity.global_distribution`` (literal-boundary global rank —
    no single-partition window), and every reported cell is a BIGINT.
    At scale this runs as a pre-write audit: the same zone-map
    statistics the writer would hand the table format, computed before
    committing to a layout."""
    from pg2any_spark.operators import similarity as S

    orders = load_table(spark, "orders", sf_dir)
    epoch = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    base = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("cx"),
        (epoch % 256).cast("long").alias("dx"),
        epoch.alias("eday"),
    )
    zkey = sum(
        F.shiftright(F.col("cx"), i).bitwiseAND(F.lit(1))
        * F.lit(1 << (2 * i)).cast("long")
        + F.shiftright(F.col("dx"), i).bitwiseAND(F.lit(1))
        * F.lit(1 << (2 * i + 1)).cast("long")
        for i in range(8)
    )
    # Persisted (round-11, guide §1.2/§5): the two layout audits each
    # traverse ``keyed`` several times (the literal-boundary quantile
    # pass, the rank and offset branches, and the broadcast row count
    # inside global_distribution) — eight-plus scans of orders plus the
    # Morton-key projection without the persist, one with it. 4 longs
    # per order row, far smaller than the source table.
    from pg2any_spark.caching import managed_persist

    keyed = managed_persist(base.withColumn("zkey", zkey.cast("long")))

    def layout_stats(order_col: str, name: str) -> DataFrame:
        files = S.global_distribution(
            keyed,
            [F.col(order_col), F.col("o_orderkey")],
            buckets=64,
        ).select("decile", "cx", "dx")
        zone = files.groupBy("decile").agg(
            F.min("cx").alias("mcx"),
            F.max("cx").alias("xcx"),
            F.min("dx").alias("mdx"),
            F.max("dx").alias("xdx"),
        )
        return zone.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(
                ((F.col("mcx") <= 17) & (F.lit(17) <= F.col("xcx"))).cast("long")
            )
            .cast("long")
            .alias("files_cust_scan"),
            F.sum(
                ((F.col("xdx") >= 100) & (F.col("mdx") <= 110)).cast("long")
            )
            .cast("long")
            .alias("files_date_scan"),
        ).select(F.lit(name).alias("layout"), "*")

    return (
        layout_stats("eday", "datesort")
        .unionByName(layout_stats("zkey", "zorder"))
        .orderBy("layout")
    )


@query(
    "interval_join_stream",
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
def interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM bounded interval join driver-checked end-to-end —
    the continuous twin of ``interval_join_purchase_errors`` run over
    two live feeds (purchases ⋈ errors within an hour, same user)
    through ``streaming.pipeline.stream_stream_interval_join``, then
    compared exactly against the batch oracle. Both feeds split into
    the SAME two time-contiguous micro-batches at the event-time
    median (cut point from the full event table, so the two sources' watermarks advance in step
    and the 0-second delay never lands a row behind the global
    watermark — pairs spanning a batch boundary survive because the
    time bound keeps the older side buffered exactly until the
    watermark passes its match horizon, Spark's stream-stream state
    eviction contract). Inner-join results emit as matches arrive, so
    no sentinel flush is needed. State per side is bounded by
    (watermark + gap) × arrival rate — the requirement for an
    unbounded run at any scale."""
    import glob
    import os
    import time

    from pg2any_spark.plans.queries import _fresh_workdir
    from pg2any_spark.streaming.pipeline import stream_stream_interval_join

    from pg2any_spark.caching import managed_persist

    # Persisted (round-11, guide §1.2): the median pass plus the four
    # shard writes (2 sides x 2 time shards) each re-scanned events.
    ev = managed_persist(
        load_table(spark, "events", sf_dir).select(
            "event_id", "event_type", "ts", "user_id"
        )
    )
    tslong = F.col("ts").cast("long")
    (cut1,) = ev.select(
        F.percentile_approx(tslong, F.lit([0.5]), 10_000)
    ).first()[0]
    work = _fresh_workdir("pg2any_ssij_")
    sides = {
        "purchase": ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        ),
        "error": ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("user_id_r"),
            F.col("ts").alias("e_ts"),
        ),
    }
    t0 = time.time() - 3600
    for name, side in sides.items():
        tcol = "p_ts" if name == "purchase" else "e_ts"
        stamped: set[str] = set()
        shards = [
            side.filter(F.col(tcol).cast("long") < cut1),
            side.filter(F.col(tcol).cast("long") >= cut1),
        ]
        for i, shard in enumerate(shards):
            shard.coalesce(1).write.mode("append").parquet(f"{work}/{name}")
            for p in glob.glob(f"{work}/{name}/*.parquet"):
                if p not in stamped:
                    os.utime(p, (t0 + i, t0 + i))
                    stamped.add(p)
    pstream = (
        spark.readStream.schema("purchase_id long, user_id long, p_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/purchase")
    )
    estream = (
        spark.readStream.schema("error_id long, user_id_r long, e_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/error")
    )
    joined = stream_stream_interval_join(
        pstream, estream, by="user_id", left_ts="p_ts", right_ts="e_ts",
        max_gap_seconds=3600, watermark="0 seconds", right_by="user_id_r",
    )
    sink = f"ssij_{work.rsplit('_', 1)[-1]}"
    # State-sized shuffle partitioning (see session.temp_conf): the
    # stream-stream join keeps BOTH sides' buffers in per-partition
    # state, so each micro-batch commits 2x partitions state stores —
    # at the batch default that fixed cost dominated the drain
    # (measured 3x slower than at STREAM_STATE_PARTITIONS, identical
    # results; fresh checkpoint, so the count is free to differ from
    # the session default).
    with temp_conf(
        spark, **{"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
    ):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drained = q.awaitTermination(300)
    if not drained:
        q.stop()
        raise TimeoutError("stream-stream interval join did not drain in 300s")
    return (
        spark.table(sink)
        .select(
            "purchase_id",
            "error_id",
            "user_id",
            (F.unix_micros(F.col("e_ts")) - F.unix_micros(F.col("p_ts")))
            .alias("gap_us"),
        )
        .orderBy("purchase_id", "error_id")
    )


# ---------------------------------------------------------------------------
# market-basket analysis: frequent co-purchased part pairs + lift
# ---------------------------------------------------------------------------


@query(
    "basket_frequent_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
    ),
    part_supp AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
        FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY pa, pb
        HAVING COUNT(*) >= 3
    )
    SELECT p.pa, p.pb, p.support,
           sa.c AS supp_a, sb.c AS supp_b,
           ROUND(CAST(p.support AS DOUBLE) * CAST(no.n AS DOUBLE)
                 / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)), 6)
               AS lift
    FROM pairs p
    JOIN part_supp sa ON sa.l_partkey = p.pa
    JOIN part_supp sb ON sb.l_partkey = p.pb
    CROSS JOIN n_orders no
    ORDER BY p.support DESC, p.pa, p.pb
    LIMIT 50
    """,
)
def basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis — the level-2 Apriori pass: part pairs
    co-purchased in ≥3 orders (the fixture's baskets are sparse — the
    support histogram tops out at 5), scored by LIFT (support·N /
    (supp_a·supp_b) — how much more often the pair co-occurs than
    independence predicts; all inputs exact BIGINTs, one fixed-order
    double chain rounded at the output). The pair space never
    materializes corpus-wide: the self-join is keyed on l_orderkey, so
    candidates are bounded by Σ per-order (items choose 2) — TPC-H
    baskets hold ~4–7 distinct parts, giving ~10–20 pairs per order at
    ANY corpus size (the same blocked-pair-enumeration argument as the
    LSH band joins); the support filter then prunes before the
    broadcast-joinable per-part supports attach. TakeOrdered(50), no
    global sort.

    Round-11 optimization (guide §2.4, same rewrite as
    ``graph_triangle_census``): pairs come from ONE per-order
    ``collect_set`` aggregate + an in-row u < v expansion instead of
    the items-distinct self-join, which shuffled the item table twice
    and re-scanned lineitem once per consumer (the a/b join sides plus
    sa, sb and n_orders each re-derived ``items`` — five lineitem
    scans). ``collect_set`` IS the per-order distinct, so the baskets
    table replaces ``items`` outright; per-part supports and the order
    count both derive from it (one explode, one 1-row count). The
    basket aggregate is NOT persisted: its scan→Exchange subtree is
    byte-identical under every consumer, so AQE shuffle-stage reuse
    runs the lineitem scan + map side once and each consumer replays
    the map output (the batch-7 rule); a persist here measured 1.7x
    slower (cache materialization at fixed partitioning defeats
    per-consumer coalescing)."""
    baskets = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("__parts"))
    )
    n_orders = F.broadcast(
        baskets.agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    part_supp = (
        baskets.select(F.explode("__parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("__parts"),
            lambda u, i: F.transform(
                F.slice(F.col("__parts"), i + 2, F.size(F.col("__parts"))),
                lambda v: F.struct(u.alias("pa"), v.alias("pb")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("__p"))
        .select(F.col("__p.pa").alias("pa"), F.col("__p.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 3)
    )
    sa = part_supp.select(
        F.col("l_partkey").alias("__pa"), F.col("c").alias("supp_a")
    )
    sb = part_supp.select(
        F.col("l_partkey").alias("__pb"), F.col("c").alias("supp_b")
    )
    return (
        pairs.join(sa, F.col("pa") == F.col("__pa"))
        .join(sb, F.col("pb") == F.col("__pb"))
        .join(n_orders)
        .select(
            "pa", "pb", "support", "supp_a", "supp_b",
            F.round(
                F.col("support").cast("double") * F.col("n").cast("double")
                / (F.col("supp_a").cast("double") * F.col("supp_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), "pa", "pb")
        .limit(50)
    )
