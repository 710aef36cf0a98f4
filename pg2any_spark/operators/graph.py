"""Graph analytics over event-derived graphs, Spark-first.

The engine's other graph member lives in ``operators/dedup.py``
(duplicate-group resolution = iterative min-label-propagation
connected components). This module adds centrality: PageRank with
EXACT scaled-integer arithmetic, so a fixed iteration count produces
bit-identical ranks on any engine and any partitioning — the usual
float PageRank is a parallel float SUM per node per iteration, whose
result depends on add order (the cross-engine hazard class this repo
retired in round 7).

Scaled-integer scheme (scale S = 10^12):

- ``r0(v)      = S // n`` (integer split of one unit of mass);
- per-edge contribution = ``cnt(u,v) · (r_i(u) // outdeg(u))`` — the
  integer division happens BEFORE the multiply/sum, so every term is
  an exact BIGINT and the aggregate is order-free;
- ``r_{i+1}(v) = (15·S) // (100·n)  +  (85 · Σ contributions) // 100``
  (damping 0.85 as an integer cross-multiplication).

Dangling-node mass (nodes with no out-edges) is dropped, not
redistributed — totals shrink slightly per iteration, which is fine
for RANKING (the standard "weak" PageRank variant) and keeps every
step a single join+aggregate. Each iteration is one broadcast-or-hash
join of the rank vector against the edge list plus one map-side
combinable SUM per destination: at 100 TB the edge list shuffles once
per iteration on ``dst`` and the rank vector is ≤ |V| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pg2any_spark.caching import managed_persist

#: Fixed-point scale: ranks are BIGINT multiples of 1e-12.
PAGERANK_SCALE = 10**12


def transition_edges(
    events: DataFrame,
    user_col: str,
    node_col,
    order_cols: list,
) -> DataFrame:
    """(src, dst, cnt) transition counts: consecutive node visits per
    user under the given total order — the classic clickstream →
    transition-graph derivation (one window over the user partition,
    one count aggregate)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*order_cols)
    seq = events.select(
        F.col(user_col),
        node_col.alias("__dst"),
        F.lag(node_col).over(w).alias("__src"),
    ).filter(F.col("__src").isNotNull())
    return (
        seq.groupBy(F.col("__src").alias("src"), F.col("__dst").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def pagerank_scaled(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Exact scaled-integer PageRank over a weighted edge list
    (src, dst, cnt); returns (k, pagerank) with pagerank a BIGINT at
    the given scale after ``iterations`` rounds. See the module
    docstring for the arithmetic contract; the one driver-side scalar
    is the node count (bounded by |V|, needed as a literal in the
    teleport term so both engines floor the same integers)."""
    # the edge list is typically DERIVED (window + aggregate over the
    # event stream) and this function consumes it many times: the node
    # count action, outdeg, and every iteration's join — persist so
    # the derivation runs once, not once per consumer (same rationale
    # as lsh_topk's band-table persist)
    edges = managed_persist(edges)
    nodes = managed_persist(
        edges.select(F.col("src").alias("k"))
        .unionByName(edges.select(F.col("dst").alias("k")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0).cast("long"))
    base = (15 * scale) // (100 * n)
    outdeg = edges.groupBy("src").agg(F.sum("cnt").cast("long").alias("outdeg"))
    rank = nodes.withColumn("r", F.lit(scale // n).cast("long"))
    for _ in range(iterations):
        contrib = (
            edges.join(rank.withColumnRenamed("k", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("k"),
                (F.col("cnt") * F.expr("r div outdeg")).alias("c"),
            )
        )
        inc = contrib.groupBy("k").agg(F.sum("c").cast("long").alias("s"))
        rank = nodes.join(inc, "k", "left").select(
            "k",
            (
                F.lit(base)
                + F.expr("(85 * coalesce(s, 0)) div 100")
            ).cast("long").alias("r"),
        )
    return rank.select("k", F.col("r").alias("pagerank"))
