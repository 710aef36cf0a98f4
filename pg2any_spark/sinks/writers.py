"""Destination sinks.

The reference ships five destination handlers (MySQL, SQL Server,
SQLite, Kafka, Custom — SURVEY §2.1 S3–S9) whose hard parts —
multi-value INSERT coalescing, CASE-WHEN/VALUES-JOIN UPDATE rewrites,
OR-combined DELETE, bulk-load path selection (§2.3 R1–R8) — exist to
make row-at-a-time SQL fast. Spark's writers are already batch/bulk:
the JDBC writer batches ``batchsize`` rows per round trip, the Kafka
writer streams whole partitions, Parquet/Delta writes are vectorized.
So each sink here is thin configuration, not a rewrite engine.

JDBC/Kafka need live endpoints; functions below build fully-configured
writers and are integration-gated (constructed, not started, in unit
tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: env-var names mirror the reference's config surface (``env.rs``).
BATCH_SIZE = int(os.environ.get("CDC_BATCH_SIZE", "1000"))
MAX_ROWS_PER_INSERT = int(os.environ.get("CDC_MAX_ROWS_PER_INSERT", "1000"))


def write_parquet_replica(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet replica table. At scale, pass ``partition_by`` on a
    low-cardinality column so downstream reads prune partitions."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = BATCH_SIZE,
    isolation_level: str = "READ_COMMITTED",
):
    """Configured JDBC batch writer (MySQL ``rewriteBatchedStatements``
    and SQL Server bulk copy are connector options on the same
    surface). Replaces the reference's S3–S7 handlers; its statement
    coalescing (R2–R7) is the driver's ``batchsize`` batching."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .option("isolationLevel", isolation_level)
    )
    if user:
        writer = writer.option("user", user)
    if password:
        writer = writer.option("password", password)
    return writer


def kafka_stream_writer(
    envelope_df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    topic: str | None = None,
):
    """Streaming Kafka sink for Debezium-envelope records
    (``functions.envelope.to_debezium`` output: topic/key/value).
    acks=all + checkpoint gives the reference's S8 delivery semantics;
    consumers dedup on (txId, lsn) for exactly-once reads."""
    writer = (
        envelope_df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.acks", "all")
        .option("kafka.compression.type", "lz4")
        .option("checkpointLocation", checkpoint_dir)
    )
    if topic:
        writer = writer.option("topic", topic)
    return writer
