"""SparkSession factory with scale-oriented defaults.

Defaults target the driver environment (local[N] with many cores) but
every knob is what we would set on a real multi-executor cluster:
AQE on (runtime re-plan + skew-join splitting), adaptive shuffle
partition coalescing, Arrow for any pandas interchange.
"""

from __future__ import annotations

import os
from contextlib import contextmanager as _contextmanager

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "pg2any_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster, drop ``master`` and submit with spark-submit;
    the session-level confs below are cluster-appropriate as-is.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE partition coalescing policy (guide §2.2): the Spark
        # default (parallelismFirst=true) coalesces only down to the
        # parallelism floor; =false coalesces to
        # advisoryPartitionSizeInBytes. An earlier round-11 A/B on a
        # syscall-throttled host measured =false as a 1.6x win (tiny
        # tasks were dominated by amplified per-task overhead there);
        # re-measured on a healthy host the same subset runs 15%
        # FASTER with the default (33.1s -> 28.1s; dedup_minhash_lsh
        # 1.99 -> 1.53s, graph_triangle_census 6.07 -> 3.15s), so the
        # override was a degraded-host artifact and is removed. At
        # 100 TB both policies behave identically — shuffle bytes
        # >> advisory_size x cores, so the byte target, not the
        # parallelism floor, decides the partition count. Override per
        # deployment via SPARK_GRAFT_PARALLELISM_FIRST if a cluster
        # profile shows the tiny-task pathology again.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for pandas UDFs / toPandas — vectorized interchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in fixtures are naive (NTZ parquet encoding,
        # normalized to TIMESTAMP in sources.fixtures.load_table); keep
        # session TZ stable for parity with the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast threshold: dimension tables (region/nation/supplier/part)
        # stay broadcast even at large SF; 64m is safe with 4g+ executors.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@_contextmanager
def temp_conf(spark: SparkSession, **settings: str):
    """Scoped ``spark.conf`` override: set, yield, restore exactly —
    keys that were unset OR only carrying their built-in default are
    restored by ``unset`` (back to defaulted state), explicitly-set
    keys by re-``set``.

    Motivating use: stateful streaming queries size
    ``spark.sql.shuffle.partitions`` to their STATE layout, not the
    session's batch default — every micro-batch pays a per-partition
    state-store open/commit, so a 4-batch availableNow drain at 32
    partitions does 128 state commits for work that fits in 8 (measured
    3× faster for the stream-stream interval join at fixture scale).
    State partitioning is a per-deployment knob: fixture-scale runs use
    a small count; a 1000-executor cluster sizes it to cores × executors
    like any shuffle. Fresh checkpoints pick the count up at start;
    resumed checkpoints keep their original count (Spark pins state
    partitioning per checkpoint), which is why this must be scoped per
    query instead of mutated globally.
    """
    saved: dict[str, str | None] = {}
    for k, v in settings.items():
        # Two-arg conf.get bypasses ConfigEntry defaults (SQLConf
        # .getConfString(key, default) only consults explicitly-set
        # session values), so a key that is merely *defaulted* — e.g.
        # spark.sql.shuffle.partitions never set on this session —
        # reads None here and is restored by unset, not pinned to its
        # current effective value as an explicitly-set conf.
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
