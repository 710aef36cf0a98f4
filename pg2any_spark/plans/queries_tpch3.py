"""Third relational batch: the remaining TPC-H query shapes (Q2, Q4,
Q8, Q9, Q11, Q15, Q16, Q20, Q21) adapted to the driver's reduced
fixture schema.

The fixtures carry no ``partsupp`` table, so wherever TPC-H consults
the part-supplier catalog (Q2 supply cost, Q11 stock value, Q16
supplier counts, Q20 availqty) we derive the relation from
``lineitem`` — ``GROUP BY (l_partkey, l_suppkey)`` is the catalog.
That keeps each query's *shape* (correlated scalar subqueries, EXISTS
/ NOT EXISTS, NOT IN blacklists, ratio-of-sums market share, view +
global-max) while staying honest about the available data.

Float discipline (inherited from queries.py): any aggregate that can
accumulate fp noise is ROUNDed identically on both sides; equality
comparisons between aggregates only happen on exact values (MIN of
raw doubles, SUMs of integer-valued quantities) or on pre-rounded
ones (q15).

Scale notes (100 TB): every dim side (part, supplier, nation, region,
and the per-part/per-supplier aggregates, which are bounded by key
cardinality not fact rows) is broadcast; the only big shuffles are
the fact-table groupBys, which are partial-aggregated map-side.
EXISTS/NOT IN become broadcast semi/anti joins — no correlated
per-row subquery execution survives in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pg2any_spark.plans.queries import query
from pg2any_spark.sources.fixtures import load_table


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived part-supplier catalog: one row per (part, supplier)
    pair observed in lineitem. Stands in for TPC-H ``partsupp``
    (reference has no such table either — pg2any replicates rows, it
    never models inventory). MIN(extendedprice) is exact on doubles,
    so downstream equality joins against it are fp-safe."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min("l_extendedprice").alias("ps_cost"),
        F.sum("l_quantity").alias("ps_qty"),
    )


_SUPPLY_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice) AS ps_cost, SUM(l_quantity) AS ps_qty
    FROM lineitem GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar MIN subquery)
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ps_cost AS supply_cost
    FROM part, supply, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size <= 25 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_cost = (
          SELECT MIN(s2.ps_cost)
          FROM supply s2, supplier sp2, nation n2, region r2
          WHERE s2.ps_partkey = p_partkey AND s2.ps_suppkey = sp2.s_suppkey
            AND sp2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum supply cost via a correlated
    scalar MIN subquery, decorrelated into a per-part window MIN over
    the region-filtered supply — the same plan Catalyst derives for
    the subquery form, but stated directly so the supply relation is
    scanned once instead of twice. Supplier⋈nation⋈region is a tiny
    broadcast; the window partitions by part key (no global sort)."""
    supply = _supply(spark, sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "STANDARD")
    )
    eu_supp = supp.join(
        F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
        supp.s_nationkey == F.col("n_nationkey"),
    )
    eu_supply = supply.join(F.broadcast(eu_supp), supply.ps_suppkey == eu_supp.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    best = eu_supply.withColumn("min_cost", F.min("ps_cost").over(w)).filter(
        F.col("ps_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(part), best.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_cost").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → semi join with non-equi predicate)
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commitdate/receiptdate are absent, so "late"
    means shipped >60 days after order date): EXISTS becomes a LEFT
    SEMI join with a non-equi residual. The date filter on orders is
    pushed to the parquet scan; the semi join shuffles on orderkey and
    AQE will flip it to broadcast when the quarter window is small."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-04-01'"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (ratio of conditional sums per year)
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_grp
                          THEN CAST(volume AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_nationkey % 3 = 0 AS supp_grp
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '2001-01-01'
    ) t
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: share of revenue supplied by one supplier-nation
    group (nationkey % 3 == 0 — the fixtures' synthetic NATION_* names
    carry no geography) within AMERICA-region customers, per year.
    All five dimension joins broadcast; the single shuffle is the
    per-year aggregate, partially aggregated map-side."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '2001-01-01'"))
    )
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    supp = load_table(spark, "supplier", sf_dir)

    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    am_cust = cust.join(
        F.broadcast(
            n1.join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        ),
        cust.c_nationkey == F.col("n1.n_nationkey"),
    ).select("c_custkey")
    grp_supp = supp.join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey")).select(
        "s_suppkey", (F.col("n2.n_nationkey") % 3 == 0).alias("supp_grp")
    )
    t = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(am_cust), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(grp_supp), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_grp",
        )
    )
    vol6 = F.col("volume").cast("decimal(18,6)")
    zero6 = F.lit(0).cast("decimal(18,6)")
    return (
        t.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_grp"), vol6).otherwise(zero6))
                .cast("double")
                / F.sum(vol6).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.4 * p_retailprice * l_quantity AS DECIMAL(18,4))),
                 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no ps_supplycost; cost proxied as 40% of retail
    price × quantity): profit on '%widget%' parts grouped by supplier
    nation and order year. part/supplier/nation broadcast; the
    lineitem⋈orders join is the one real shuffle and AQE handles the
    skew; the group-by is low-cardinality (nations × years)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            # Summation order differs between engines (and between runs
            # at scale); quantize the summand to DECIMAL(18,4) so the
            # sum is exact and order-independent, then round.
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
                    ).cast("decimal(18,4)")
                ),
                2,
            ).cast("double").alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (HAVING against a global scalar aggregate)
# ---------------------------------------------------------------------------


@query(
    "q11_important_parts",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    val AS (
        SELECT ps_partkey AS v_partkey,
               SUM(CAST(ps_cost * ps_qty AS DECIMAL(18,6))) AS v_value
        FROM supply
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_nationkey % 2 = 0
        GROUP BY 1
    )
    SELECT v_partkey AS p_partkey,
           CAST(ROUND(v_value, 2) AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v_value AS DOUBLE)
          > (SELECT CAST(SUM(v_value) AS DOUBLE) * 0.001 FROM val)
    ORDER BY part_value DESC, p_partkey
    LIMIT 100
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part supply value (cost × qty over the
    derived catalog, even-nation suppliers only) filtered against a
    fraction of the global total — a scalar-aggregate cross join. The
    global total is one row, broadcast; `val` is computed once and
    reused for both sides (Spark caches nothing here, but the plan is
    two aggregates over one shuffle of the already-small supply
    relation — bounded by |part×supplier|, not fact rows)."""
    supply = _supply(spark, sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_nationkey") % 2 == 0)
    val = (
        supply.join(F.broadcast(supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)),
                    supply.ps_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("ps_partkey").alias("v_partkey"))
        .agg(
            F.sum(
                (F.col("ps_cost") * F.col("ps_qty")).cast("decimal(18,6)")
            ).alias("v_value")
        )
    )
    total = val.agg(
        (F.sum("v_value").cast("double") * 0.001).alias("threshold")
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v_value").cast("double") > F.col("threshold"))
        .select(
            F.col("v_partkey").alias("p_partkey"),
            F.round("v_value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (view + equality against the global max)
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue view, pick supplier(s) whose
    revenue equals the global max. Revenue is rounded *before* the max
    comparison on both sides, so the double equality is exact. Done
    with a rank-over-empty-partition window instead of recomputing the
    view — one aggregate, one 10-row window, one broadcast join."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01'"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            ),
            2,
        ).cast("double").alias("total_revenue")
    )
    # |revenue| ≤ |supplier| — the unpartitioned window is tiny by
    # construction (dim-bounded), not a fact-table global sort.
    top = revenue.withColumn(
        "rnk", F.rank().over(Window.orderBy(F.col("total_revenue").desc()))
    ).filter(F.col("rnk") == 1)
    return (
        supp.join(top, supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts by part attributes (NOT IN blacklist, COUNT DISTINCT)
# ---------------------------------------------------------------------------


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size),
    excluding a supplier blacklist (acctbal < 1000 stands in for the
    complaints LIKE — fixtures carry no comments). NOT IN on a
    non-null key → broadcast anti join; COUNT(DISTINCT) expands to
    the standard two-phase distinct aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 9, 14, 19, 24, 29, 34, 39, 44])
    )
    blacklist = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(blacklist), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — excess suppliers (nested IN + correlated threshold)
# ---------------------------------------------------------------------------


@query(
    "q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
               SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT s1.sp_suppkey
        FROM shipped s1 JOIN part ON p_partkey = s1.sp_partkey
        WHERE p_name LIKE 'large%'
          AND s1.qty > (
              SELECT 0.5 * SUM(s2.qty) FROM shipped s2
              WHERE s2.sp_partkey = s1.sp_partkey
          )
    )
    ORDER BY s_suppkey
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty proxied by shipped quantity):
    suppliers who shipped more than half of a 'large%' part's total
    1997 volume. The correlated threshold decorrelates into a per-part
    aggregate + broadcast join; the outer IN becomes a semi join into
    the 10-row supplier dim. l_quantity is integer-valued, so the SUM
    comparison is exact in doubles — no rounding needed."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'"))
    )
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("large%"))
    supp = load_table(spark, "supplier", sf_dir)
    shipped = li.groupBy(
        F.col("l_partkey").alias("sp_partkey"), F.col("l_suppkey").alias("sp_suppkey")
    ).agg(F.sum("l_quantity").alias("qty"))
    per_part = shipped.groupBy(F.col("sp_partkey").alias("pp_partkey")).agg(
        (F.lit(0.5) * F.sum("qty")).alias("half_total")
    )
    excess = (
        shipped.join(F.broadcast(part), shipped.sp_partkey == part.p_partkey)
        .join(F.broadcast(per_part), shipped.sp_partkey == F.col("pp_partkey"))
        .filter(F.col("qty") > F.col("half_total"))
        .select("sp_suppkey")
    )
    return (
        supp.join(F.broadcast(excess), supp.s_suppkey == F.col("sp_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no receipt/commit dates — "kept the order
    waiting" = was the last shipper in a multi-supplier finished
    order). The EXISTS/NOT-EXISTS pair is equivalent to: the order has
    ≥2 distinct suppliers AND this line's shipdate equals the order's
    max shipdate (a line strictly below the max has a later *other*
    shipper unless the max belongs to the same supplier — but then
    that same-supplier max line itself qualifies; both engines agree,
    see the per-order aggregate proof in tests). Implemented as one
    per-order aggregate joined back — two shuffles on orderkey total,
    versus the naive triple self-join's three."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, "supplier", sf_dir)
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp")
    )
    joined = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(per_order, li.l_orderkey == F.col("po_orderkey"))
        .filter(F.col("n_supp") >= 2)
    )
    # NOT EXISTS(other supplier later) ⟺ max shipdate over *other*
    # suppliers ≤ this line's. Top-2 trick: keep the two latest
    # per-supplier maxes per order; the other-supplier max is the top
    # one unless it belongs to this line's supplier, else the second.
    supp_maxes = li.groupBy(
        F.col("l_orderkey").alias("sm_orderkey"), F.col("l_suppkey").alias("sm_suppkey")
    ).agg(F.max("l_shipdate").alias("sm_max"))
    w2 = Window.partitionBy("sm_orderkey").orderBy(
        F.col("sm_max").desc(), F.col("sm_suppkey").desc()
    )
    ranked = supp_maxes.withColumn("r", F.row_number().over(w2)).filter(F.col("r") <= 2)
    top2 = ranked.groupBy(F.col("sm_orderkey").alias("t_orderkey")).agg(
        F.max(F.struct(F.col("sm_max"), F.col("sm_suppkey"))).alias("first"),
        F.min(F.struct(F.col("sm_max"), F.col("sm_suppkey"))).alias("second"),
        F.count(F.lit(1)).alias("n_top"),
    )
    lines = joined.join(top2, F.col("l_orderkey") == F.col("t_orderkey")).withColumn(
        "other_max",
        F.when(F.col("first.sm_suppkey") != F.col("l_suppkey"), F.col("first.sm_max"))
        .when(F.col("n_top") >= 2, F.col("second.sm_max"))
        .otherwise(F.lit(None)),
    )
    waited = lines.filter(
        F.col("other_max").isNotNull() & (F.col("other_max") <= F.col("l_shipdate"))
    )
    return (
        waited.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
