"""Debezium-style Kafka envelope as a pure DataFrame projection.

Field-for-field port of the reference's envelope builder
(``destinations/kafka.rs:215-292``): payload = {before, after,
source{version, connector, name, ts_ms, db, schema, table, txId, lsn},
op, ts_ms}, schema block with per-column string fields, key = JSON of
the key columns, topic = ``prefix.schema.table``.

The reference builds this JSON per event in Rust; here it is a single
``to_json(struct(...))`` projection — fully JVM-side, whole-stage
codegen, no Python in the loop. That is the entire Kafka sink: the
envelope is a projection, delivery is ``writeStream.format("kafka")``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

LIB_VERSION = "0.1.0"
CONNECTOR = "pg2any"


def _field_descriptors(cols: Column) -> Column:
    """Per-column schema descriptors: all string/optional, like the
    reference's dynamic field builder (``kafka.rs:147-164``)."""
    return F.transform(
        cols,
        lambda c: F.struct(
            F.lit("string").alias("type"),
            F.lit(True).alias("optional"),
            c.alias("field"),
        ),
    )


def to_debezium(
    events: DataFrame,
    topic_prefix: str = "cdc",
    source_db: str = "postgres",
) -> DataFrame:
    """Project change events into (topic, key, value) Kafka records."""
    ts_ms = (F.unix_micros(F.col("commit_ts")) / 1000).cast("long")
    source = F.struct(
        F.lit(LIB_VERSION).alias("version"),
        F.lit(CONNECTOR).alias("connector"),
        F.lit(topic_prefix).alias("name"),
        ts_ms.alias("ts_ms"),
        F.lit(source_db).alias("db"),
        F.col("schema").alias("schema"),
        F.col("table").alias("table"),
        F.col("txid").alias("txId"),
        F.col("lsn").alias("lsn"),
    )
    unified_cols = F.coalesce(
        F.map_keys(F.col("after")), F.map_keys(F.col("before")), F.array()
    )
    payload = F.struct(
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        source.alias("source"),
        F.col("op").alias("op"),
        ts_ms.alias("ts_ms"),
    )
    schema_block = F.struct(
        F.lit("struct").alias("type"),
        F.array(
            F.struct(
                F.lit("struct").alias("type"),
                _field_descriptors(unified_cols).alias("fields"),
                F.lit(True).alias("optional"),
                F.lit("before").alias("field"),
            ),
            F.struct(
                F.lit("struct").alias("type"),
                _field_descriptors(unified_cols).alias("fields"),
                F.lit(True).alias("optional"),
                F.lit("after").alias("field"),
            ),
        ).alias("fields"),
        F.lit(False).alias("optional"),
        F.concat(
            F.lit(f"{topic_prefix}."), F.col("schema"), F.lit("."), F.col("table"),
            F.lit(".Envelope"),
        ).alias("name"),
    )
    key_map = F.when(
        F.col("key_columns").isNotNull() & (F.size(F.col("key_columns")) > 0),
        F.map_filter(
            F.coalesce(F.col("after"), F.col("before")),
            lambda k, _: F.array_contains(F.col("key_columns"), k),
        ),
    )
    return events.select(
        F.concat(
            F.lit(f"{topic_prefix}."), F.col("schema"), F.lit("."), F.col("table")
        ).alias("topic"),
        F.to_json(key_map).alias("key"),
        # explicit nulls: the reference emits "before": null / "after": null
        F.to_json(
            F.struct(schema_block.alias("schema"), payload.alias("payload")),
            {"ignoreNullFields": "false"},
        ).alias("value"),
    )


def from_debezium(records: DataFrame) -> DataFrame:
    """Parse (topic, key, value) Kafka records back into the canonical
    change-event schema — the consumer half of the Kafka path (the
    reference only *writes* the envelope; a Spark pipeline reading a
    Debezium topic needs the inverse: ``kafka source → from_json →
    apply``).

    Lossy exactly where the envelope is: ``replica_identity`` is not
    embedded (restored as 'default'), and ``commit_ts`` carries
    millisecond precision (``ts_ms``). Neither affects apply semantics
    — ordering and dedup key on ``lsn``.
    """
    payload_schema = (
        "payload struct<"
        "before: map<string,string>, after: map<string,string>, "
        "source: struct<version: string, connector: string, name: string, "
        "ts_ms: bigint, db: string, schema: string, table: string, "
        "txId: bigint, lsn: bigint>, "
        "op: string, ts_ms: bigint>"
    )
    parsed = records.select(
        F.from_json(F.col("value"), payload_schema).getField("payload").alias("p"),
        F.from_json(F.col("key"), "map<string,string>").alias("k"),
    )
    return parsed.select(
        F.col("p.op").alias("op"),
        F.col("p.source.schema").alias("schema"),
        F.col("p.source.table").alias("table"),
        F.col("p.source.txId").alias("txid"),
        F.col("p.source.lsn").alias("lsn"),
        F.timestamp_millis(F.col("p.ts_ms")).alias("commit_ts"),
        F.col("p.before").alias("before"),
        F.col("p.after").alias("after"),
        F.map_keys(F.col("k")).alias("key_columns"),
        F.lit("default").alias("replica_identity"),
    )
