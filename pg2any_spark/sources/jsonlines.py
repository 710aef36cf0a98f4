"""Event-mode JSON-lines persistence — the reference's durable IR.

In event mode the reference serializes each ChangeEvent as one JSON
line (``transaction_manager.rs:599-613``) and re-parses lines on
consume, with a **hard error on a corrupt line**
(``transaction_manager.rs:1792-1801``). The Spark-native equivalents:

- write: ``df.write.json`` — one JSON object per line, the same
  newline-delimited shape (Spark shards it across part files; at
  100 TB that sharding IS the feature — the reference rotates 64 MB
  segments by hand, Spark's writer does it per partition).
- read: schema-pinned ``spark.read.json`` in FAILFAST mode — a
  malformed line aborts the job exactly where the reference's
  ``serde_json`` error does, instead of silently nulling
  (PERMISSIVE) or dropping (DROPMALFORMED).
- stream: the same reader via ``readStream`` for the live pipeline
  (checkpoint/offset tracking replaces the reference's per-file
  ``last_executed_command_index``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA


def write_events_jsonl(events: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist change events as newline-delimited JSON (event-mode IR).

    Null images are written explicitly (``"before": null``) like the
    reference's serde output, so a reader can distinguish "no before
    image" from schema drift.
    """
    events.write.mode(mode).option("ignoreNullFields", "false").json(path)


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read event-mode JSON lines with hard corrupt-line semantics."""
    return (
        spark.read.schema(CHANGE_EVENT_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )


def read_events_jsonl_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming reader over an event-mode JSON-lines directory."""
    return (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )
