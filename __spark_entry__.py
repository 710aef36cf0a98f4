"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: ordered CDC apply of a synthesized
change-event stream onto the ``customer`` fixture (the reference's
core capability, re-expressed Spark-first).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2; the driver cross-checks each against DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pg2any_spark.plans import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.cdc_apply_customer(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
