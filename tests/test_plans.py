"""Physical-plan quality gates.

Correctness tests prove the operators compute the right answer at
fixture scale; these prove the *plans* are the ones that survive a
100× scale-up (the brief's "explain and iterate" loop, made into a
regression test): filters reach the parquet scan, dimension joins
broadcast, aggregations stay hash-based (no surprise SortAggregate),
and nothing degenerates into a cartesian product.

Known, intentional exception: the CDC apply's last-writer-wins
``max_by`` carries a MAP payload in its aggregation buffer, which is
not hash-aggregatable in Spark — it plans as a map-side-combining
SortAggregate, the same shuffle+sort shape Delta MERGE dedup uses
(see SCALE.md).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg2any_spark.plans.queries import QUERIES


def explain(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    cache: dict[str, str] = {}

    def get(name: str) -> str:
        if name not in cache:
            cache[name] = explain(QUERIES[name](spark, sf_dir))
        return cache[name]

    return get


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """No headline query may plan a cartesian/unconditioned nested-loop
    join — the classic small-SF-works, 100TB-never-finishes trap."""
    from bench import HEADLINE

    for name in HEADLINE:
        plan = explain(QUERIES[name](spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name


def test_chunked_wire_decode_commit_join_broadcasts(spark, sf_dir):
    """The constant-memory wire decode's commit-stamp join must build
    from the (tiny, one-row-per-transaction) marker side as a
    broadcast hash join — a shuffle join here would re-shuffle the
    entire decoded event stream just to attach commit timestamps."""
    from pg2any_spark.sources.pgoutput import (
        decode_wal_frames_raw,
        stamp_commits,
        synth_customer_wal_frames,
    )

    raw = decode_wal_frames_raw(synth_customer_wal_frames(spark, sf_dir))
    plan = explain(stamp_commits(raw), "simple")
    assert "BroadcastHashJoin" in plan
    # and the no-broadcast fallback keeps a conditioned join (never
    # cartesian) for the pathological many-tiny-transaction batch
    fallback = explain(stamp_commits(raw, broadcast_commits=False), "simple")
    assert "CartesianProduct" not in fallback


def test_q6_filters_reach_the_scan(plans):
    plan = plans("q6_forecast_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # selection is 4 of 16 lineitem columns — pruning must hold
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate" in plan


def test_q3_dimension_joins_broadcast(plans):
    plan = plans("q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all join sides fit broadcast at test SF
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed, not post-scan


def test_q1_hash_aggregates_only(plans):
    plan = plans("q1_pricing_summary")
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_dedup_exact_is_one_hash_agg_shuffle(plans):
    plan = plans("dedup_exact_recrawl")
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    # min(id) per fingerprint: partial agg before the exchange halves
    # the shuffle (one row per fingerprint per partition)
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_cdc_apply_single_key_shuffle(spark, sf_dir):
    """The apply operator must shuffle exactly once (on the key); the
    three event branches (insert/update/delete) union without any
    exchange of their own."""
    plan = explain(QUERIES["cdc_apply_customer"](spark, sf_dir), "simple")
    # count Exchange nodes in the tree (simple mode prints each once)
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges == 1, plan
    # map-side partial aggregation before the exchange: the shuffle
    # carries one winner per key per partition, not one row per event
    partial = plan.index("SortAggregate")
    exchange = plan.index("Exchange ")
    final = plan.rindex("SortAggregate")
    assert partial < exchange < final


def test_window_query_partitions_before_sorting(plans):
    """Per-group window: the sort must be within key partitions, never
    a global single-partition window (the WindowExec warning trap)."""
    plan = plans("window_top_orders_per_customer")
    assert "hashpartitioning" in plan
    assert "SinglePartition" not in plan


def test_funnel_single_shuffle_shape(plans):
    """The funnel derives all three stage times from ONE user_id
    partitioning: stacked unbounded windows + a reduce that reuses the
    same hash partitioning — no per-stage joins, no re-shuffles (the
    old cascaded groupBy+join form cost 14 Exchanges; this shape
    survives a 100× scale-up with one pass over events)."""
    import re

    plan = plans("funnel_view_click_purchase")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
    # formatted mode prints each node in the outline AND the details
    # section — count unique node ids, not occurrences
    n_exchanges = len(set(re.findall(r"\((\d+)\) Exchange\b", plan)))
    assert n_exchanges <= 4, f"expected <=4 Exchanges, got {n_exchanges}"
    # one scan of events feeds the whole funnel
    n_scans = len(set(re.findall(r"\((\d+)\) Scan parquet\b", plan)))
    assert n_scans == 1, f"expected 1 scan, got {n_scans}"


def test_retention_aggregates_stay_hash(plans):
    plan = plans("retention_cohorts")
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_holdout_broadcasts(plans):
    """The 2% holdout fingerprint set must come back as a broadcast
    join — the train side (98% of the corpus) never shuffles for it."""
    plan = plans("decontaminate_train_split")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_ngrams_partial_agg_before_exchange(plans):
    """Explode fan-out must be reduced map-side: partial count per
    distinct n-gram precedes the exchange, and the top-k is a
    TakeOrderedAndProject (no global sort of all n-grams)."""
    plan = plans("top_ngrams_corpus")
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")
    assert "TakeOrderedAndProject" in plan


def test_kmeans_refine_single_aggregate_no_join(plans):
    """Assignment is in the Arrow map stage (no join/shuffle); the only
    exchange belongs to the (cell, pos) mean aggregate."""
    plan = plans("ivf_kmeans_refined_centroids")
    assert "Join" not in plan
    assert "HashAggregate" in plan


# ---------------------------------------------------------------------------
# Whole-registry gate: every registered query, not just the pinned ones
# ---------------------------------------------------------------------------

#: Queries whose plans legitimately contain Arrow/pandas stages — the
#: vectorized UDF surface (embedding matmuls, media kernels). Anything
#: NOT listed here must stay entirely JVM-side.
ARROW_STAGE_ALLOWED = {
    "ann_cosine_topk_bruteforce",
    "cdc_apply_pgoutput",
    "cdc_apply_pgoutput_streamed",
    "cdc_apply_toast",  # wire codec: Arrow encode + segment decode
    "cdc_apply_two_phase",  # wire codec: Arrow encode + segment decode
    "ann_ivf_topk",
    "ann_lsh_topk",
    "embedding_near_dup",
    "ivf_kmeans_refined_centroids",
    "knn_label_embeddings",
    "media_audio_features",
    "media_frame_samples",
    "media_image_features",
    "media_resize",
    "training_pipeline_docs",
    # PQ: numpy-vectorized encode + per-query ADC lookup tables
    # (expression-only forms lose: unrolled = ~10 s Janino compile,
    # HOFs = interpreted ~5 ms/row; see operators/similarity.py)
    "pq_ann_topk",
    "pq_code_balance",
    "ann_ivfpq_topk",
    "ann_ivfpq_recall",
    # hybrid fusion's dense tower is the Arrow cosine kernel
    "retrieval_hybrid_rrf",
    # perceptual hash: the (pseudo-)decoder is a mapInPandas kernel
    # like every media decode in operators/multimodal.py
    "media_phash_near_dup",
    # Misra-Gries candidate pass: a bounded dict per partition is
    # inherently imperative (mapInPandas, one dict op per DISTINCT
    # key per Arrow batch); the exact recount that follows is pure
    # codegen
    "heavy_hitters_tokens",
    "heavy_hitters_streaming",
    # SemDeDup: per-cell numpy gram kernel (applyInPandas) — the
    # all-pairs cosine inside a cluster cell is exactly the
    # interpreted-HOF hazard the PQ note documents
    "semdedup_cells",
    # SRP bucketing + normalization in one Arrow pass
    # (similarity._bucketed_normalized), same stage the ANN family uses
    "decontaminate_semantic",
    # wire codec: Arrow encode + segment decode, like cdc_apply_pgoutput
    "cdc_apply_schema_evolution",
    # KMV map-side partial k-min: per-partition sort+head(k) keeps the
    # shuffle at k×partitions rows instead of the distinct-hash table
    "kmv_distinct_ngrams",
}

_PY_NODES = (
    "MapInPandas",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
    "MapInArrow",
)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_plan_gate(plans, name):
    """No query may plan a cartesian product, a row-at-a-time Python
    UDF (BatchEvalPython), or an unexpected Python stage. Runs over the
    WHOLE registry so new queries can't silently regress the
    shapes PLANS.md documents."""
    plan = plans(name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in ARROW_STAGE_ALLOWED:
        for node in _PY_NODES:
            assert node not in plan, f"{name}: unexpected Python stage {node}"


def test_cbo_column_stats_flip_join_to_broadcast(spark, sf_dir):
    """Stats-fed cost-based optimization: a selective filter on orders
    cannot be broadcast without statistics (the planner only sees the
    ~281 KB file size), but after ANALYZE TABLE ... FOR COLUMNS the
    CBO estimates the filtered cardinality from min/max and flips the
    join to BroadcastHashJoin — the plan change that, at 100 TB, is
    the difference between shuffling the fact table and not."""
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.sql("DROP TABLE IF EXISTS stats_orders")
    spark.sql("DROP TABLE IF EXISTS stats_lineitem")
    try:
        spark.sql(
            "CREATE TABLE stats_orders USING parquet "
            f"LOCATION 'file:{sf_dir}/orders.parquet'"
        )
        spark.sql(
            "CREATE TABLE stats_lineitem USING parquet "
            f"LOCATION 'file:{sf_dir}/lineitem.parquet'"
        )
        spark.conf.set("spark.sql.cbo.enabled", "true")
        # threshold sized to the FIXTURE: without stats the filtered
        # side is estimated at the full file size (filters don't
        # shrink size-only estimation), so half of it stays above; a
        # ~21-row estimate from column stats lands far below.
        import os

        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(orders_bytes // 2)
        )
        # assert on the STATIC plan (AQE could flip it at runtime from
        # observed shuffle sizes, which is exactly what static stats
        # make unnecessary)
        spark.conf.set("spark.sql.adaptive.enabled", "false")

        def plan():
            df = (
                spark.table("stats_orders")
                .filter("o_orderkey <= 20")
                .join(
                    spark.table("stats_lineitem"),
                    F.col("o_orderkey") == F.col("l_orderkey"),
                )
            )
            return explain(df)

        before = plan()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before

        spark.sql(
            "ANALYZE TABLE stats_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey"
        )
        after = plan()
        assert "BroadcastHashJoin" in after, after
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS stats_orders")
        spark.sql("DROP TABLE IF EXISTS stats_lineitem")


def test_aqe_skew_join_split_fires(spark):
    """AQE skew-join splitting — the named in-plan defense SCALE.md
    leans on for hot keys — must actually fire: a join where one key
    holds ~100× the median partition's rows gets its skewed partition
    split at runtime (executed plan shows the skew-handled SMJ)."""
    import pyspark.sql.functions as F

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # thresholds scaled to fixture size so the hot key qualifies
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # force SMJ: broadcast would hide the skew machinery
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # 50k rows on key 0, ~100 rows on every other key + payload
        skewed = spark.range(70_000).select(
            F.when(F.col("id") < 50_000, 0)
            .otherwise((F.col("id") % 200) + 1)
            .alias("k"),
            F.concat(F.lit("p" * 32), F.col("id").cast("string")).alias("pay"),
        )
        dim = spark.range(201).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = skewed.join(dim, "k")
        # execute THIS Dataset (count() would spawn its own separate
        # QueryExecution and leave joined's adaptive plan unfinalized)
        assert len(joined.collect()) == 70_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final, final[:500]
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_runtime_bloom_filter_injects_on_big_fact_join(spark, sf_dir):
    """100 TB posture pin: with a selective dimension filter and a
    fact-side scan past spark.sql.optimizer.runtime.bloomFilter.
    applicationSideScanSizeThreshold (10GB default — i.e. exactly the
    big-cluster regime; simulated here by lowering the threshold), the
    optimizer injects a bloom_filter_agg semi-filter on the fact scan
    side of the shuffle join — rows that cannot match are dropped
    before the exchange. Session defaults leave the feature ON, so a
    real 100 TB fact table gets this with no code change."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    prev_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).agg(
            F.sum("l_extendedprice").alias("s")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_app,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout + partition pruning: events
    written partitioned by event_type must answer a one-type filter by
    LISTING only that type's directory — the plan's scan shows the
    pushed partition filter and reads a fraction of the files. At
    100 TB this is the difference between scanning a day and scanning
    a year; the test pins that the declarative filter actually reaches
    the partitioning layer (PartitionFilters), not just the row
    filter."""
    from pg2any_spark.sources.fixtures import load_table

    events = load_table(spark, "events", sf_dir)
    target = str(tmp_path / "events_by_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(target)

    one = spark.read.parquet(target).filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition filter must actually carry the predicate (it is
    # pruned OUT of the data filters — parquet never sees it)
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "event_type" in pf.group(1), plan[:2000]
    # correctness: pruned read equals the unpartitioned filter
    want = events.filter(F.col("event_type") == "click").count()
    assert one.count() == want and want > 0
