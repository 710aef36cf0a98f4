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


def write_events_jsonl(
    events: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: bool = False,
) -> None:
    """Persist change events as newline-delimited JSON (event-mode IR).

    Null images are written explicitly (``"before": null``) like the
    reference's serde output, so a reader can distinguish "no before
    image" from schema drift.

    ``compression=True`` gzips each part file — the analogue of the
    reference's ``PG2ANY_ENABLE_COMPRESSION`` segment gzip
    (``storage/compressed.rs``; thread ``CdcConfig.enable_compression``
    here). All readers in this module are codec-transparent (Spark
    resolves ``.json.gz`` automatically), so the flag changes bytes on
    disk, never semantics — the same contract the reference's CI
    matrix pins by running every integration suite compression on/off.
    The reference's seekable sync-point INDEX has no analogue to need:
    per-file gzip keeps file-granular parallelism and checkpoint
    offsets are file-based, so resume never seeks inside a member."""
    w = events.write.mode(mode).option("ignoreNullFields", "false")
    if compression:
        w = w.option("compression", "gzip")
    w.json(path)


def write_events_ir(events: DataFrame, path: str, cfg, mode: str = "overwrite") -> None:
    """Config-owning event-IR writer: the production entry point that
    threads ``CdcConfig.enable_compression`` (parsed from
    ``PG2ANY_ENABLE_COMPRESSION``, ``config.py``) into the on-disk
    format, so setting the env var actually changes output bytes —
    the same contract as the reference's flag (its
    ``compression_feature_flag_tests`` assert the segment files are
    gzip members when enabled). Call this, not ``write_events_jsonl``
    directly, wherever a configured pipeline persists its feed."""
    write_events_jsonl(
        events, path, mode=mode, compression=cfg.enable_compression
    )


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


def read_events_jsonl_quarantine(
    spark: SparkSession, path: str, quarantine_path: str | None = None
) -> DataFrame:
    """Dead-letter-queue variant of the event reader: corrupt lines are
    DIVERTED, never silently dropped and never fatal.

    The reference (and ``read_events_jsonl``) hard-fails on the first
    corrupt line — correct for an IR the engine itself wrote, but an
    operator replaying a partner-supplied or disk-damaged feed needs
    the Debezium-style DLQ alternative: keep the good 99.999%, land
    every bad line VERBATIM somewhere auditable. The contract: the two
    outputs PARTITION the input, and a line is CLEAN only when its
    non-nullable envelope fields (op/schema/table/txid/lsn/commit_ts)
    parsed and the op is a known DML code — a junk object sharing one
    field name ({"op": "zzz"}) is quarantined as schema_mismatch,
    while a legitimate event whose nullable fields are all explicitly
    null passes.

    Returns the clean typed events; if ``quarantine_path`` is given,
    the corrupt raw lines — VERBATIM, with a ``reason`` — are written
    there first (mode=overwrite: the DLQ is per-feed-read state, so a
    retried read lands one copy of each poison line, not two). Cost is
    honest: corruption is only decidable after parsing, so with a
    quarantine sink the feed is read and JSON-parsed twice — price it
    like two scans, or materialize the text upstream if the feed is
    huge and damage is routine.

    Implementation reads lines as TEXT and parses with ``from_json``
    (not PERMISSIVE mode + ``columnNameOfCorruptRecord``): PERMISSIVE
    preserves raw content only for lines that fail to PARSE — a
    well-formed object matching no schema field re-serializes as
    ``{}`` and the audit trail loses the evidence."""
    from pyspark.sql import functions as F

    from pg2any_spark.schemas import DML_OPS

    raw = spark.read.text(path).withColumn(
        "_parsed", F.from_json(F.col("value"), CHANGE_EVENT_SCHEMA)
    )
    data_cols = [f.name for f in CHANGE_EVENT_SCHEMA.fields]
    # clean requires the NON-NULLABLE envelope fields to be present
    # and the op to be a known DML code — not just "any field parsed":
    # a junk object sharing one field name ({"op": "zzz"}) must land
    # in the DLQ, while a legitimate line whose NULLABLE fields are
    # all explicitly null must pass. (from_json yields an all-NULL
    # struct both for malformed JSON and for well-formed JSON matching
    # no field, so struct-level nullness alone cannot discriminate.)
    envelope_ok = (
        F.col("_parsed").getField("op").isin(*DML_OPS)
        & F.col("_parsed").getField("schema").isNotNull()
        & F.col("_parsed").getField("table").isNotNull()
        & F.col("_parsed").getField("txid").isNotNull()
        & F.col("_parsed").getField("lsn").isNotNull()
        & F.col("_parsed").getField("commit_ts").isNotNull()
    )
    is_corrupt = F.col("_parsed").isNull() | ~F.coalesce(
        envelope_ok, F.lit(False)
    )
    if quarantine_path is not None:
        bad = raw.filter(is_corrupt).select(
            F.col("value").alias("raw_line"),
            F.when(
                F.try_parse_json(F.col("value")).isNull(),
                F.lit("malformed_json"),
            ).otherwise(F.lit("schema_mismatch")).alias("reason"),
        )
        bad.write.mode("overwrite").json(quarantine_path)
    return raw.filter(~is_corrupt).select(
        *[F.col("_parsed").getField(c).alias(c) for c in data_cols]
    )
