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

#: Per-process cache of INFERRED parquet schemas, keyed by file path.
#: Passing an explicit schema to the reader skips parquet footer
#: inference — which Spark 4 runs as a (driver-blocking) footer-read
#: job on EVERY ``spark.read.parquet`` call. A 64-query bench run calls
#: ``load_table`` hundreds of times over the same ~10 files, so the
#: repeated inference was pure fixed overhead (guide §6: make the scan
#: cheap; §1.2: remove work you throw away). This caches METADATA only
#: (never rows, never results), is populated from the parquet inputs on
#: first touch each process, and is keyed by full path so different SF
#: dirs never collide. Schemas are session-independent plain
#: StructTypes, safe across session restarts in tests.
_SCHEMA_CACHE: dict[str, object] = {}


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
    path = f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet"
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = schema
    df = spark.read.schema(schema).parquet(path)
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
