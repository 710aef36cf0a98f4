"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Plain ``spark.read.parquet`` — Parquet scans get column pruning and
predicate pushdown from the data source automatically, so every
downstream query should show ``PushedFilters``/``ReadSchema`` pruning
in ``.explain("formatted")``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg2any_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is physically TIMESTAMP(NANOS); Spark's timestamp is
    microseconds, so we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    micros here — the same ns→us truncation DuckDB applies, keeping
    oracle parity. Integer ``div`` (not ``/``) avoids double-precision
    loss at 1e18-scale nanos.

    The conf is set here (runtime-settable), not only in
    ``session.get_spark``, so this loader works on ANY SparkSession —
    including harnesses that build their own.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load all fixture tables; optionally register temp views for spark.sql."""
    out: dict[str, DataFrame] = {}
    for name in FIXTURE_TABLES:
        df = load_table(spark, name, sf_dir)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
