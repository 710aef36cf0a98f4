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

    Timestamp normalization: the fixtures store
    ``Timestamp(isAdjustedToUTC=false, MICROS)``, which Spark 4 reads
    as TIMESTAMP_NTZ via parquet NTZ inference. The engine's contract
    is plain TIMESTAMP everywhere (session TZ is pinned UTC, so the
    instant is unchanged) — NTZ would reject ``withWatermark``,
    ``unix_micros`` and ``cast(long)`` downstream. (Earlier fixture
    generations used TIMESTAMP(NANOS), which this Spark rejects
    outright without the since-removed ``nanosAsLong`` conf; that
    encoding no longer exists anywhere, so no branch handles it.)
    """
    df = spark.read.parquet(f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet")
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
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
