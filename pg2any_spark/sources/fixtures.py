"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Plain ``spark.read.parquet`` — Parquet scans get column pruning and
predicate pushdown from the data source automatically, so every
downstream query should show ``PushedFilters``/``ReadSchema`` pruning
in ``.explain("formatted")``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pg2any_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table from ``{sf_dir}/{name}.parquet``."""
    return spark.read.parquet(f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet")


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
