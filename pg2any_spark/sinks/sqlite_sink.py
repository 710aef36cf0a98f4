"""SQLite destination sink with exactly-once apply.

Live, testable port of the reference's SQLite destination
(``destinations/sqlite.rs:45-154``) and its pre-commit-hook atomic
checkpointing (``destinations/destination_factory.rs:12-13,60-93``;
SURVEY §2.1 S7/S10): each micro-batch applies inside ONE SQLite
transaction that also advances a ``__cdc_progress`` row — data and
progress commit atomically, so a crash between Spark's checkpoint and
the destination commit can only re-deliver a batch that the progress
row then rejects (the reference's LSN-dedup, O2,
``transaction_manager.rs:1586-1604``).

SQLite is a single-writer database (the reference's handler is a
single connection too, ``destinations/sqlite.rs:45-101``), so the
batch is reduced to winners-per-key in Spark — fully parallel — and
only the final small upsert/delete set crosses the driver. WAL journal
mode and foreign_keys mirror the reference's connection setup.

For parallel-writer destinations (MySQL/SQL Server), the same
apply-batch body runs per partition via JDBC instead; the SQL shapes
(multi-value INSERT OR REPLACE, key-list DELETE) are what the
reference's coalescing rewrites R2/R5 produce.
"""

from __future__ import annotations

import sqlite3
from typing import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

from pg2any_spark.operators.apply import typed_from_map
from pg2any_spark.schemas import OP_DELETE, OP_TRUNCATE

PROGRESS_TABLE = "__cdc_progress"

#: Rows per multi-value statement — the reference caps multi-value
#: INSERTs per dialect (``config.rs:363``, SQL Server hard limit 1000).
MAX_ROWS_PER_STMT = 500


def _connect(db_path: str) -> sqlite3.Connection:
    conn = sqlite3.connect(db_path)
    # Reference connection options: WAL journal + foreign keys ON
    # (``destinations/sqlite.rs:60-89``).
    conn.execute("PRAGMA journal_mode=WAL")
    conn.execute("PRAGMA foreign_keys=ON")
    return conn


def _ensure_tables(conn: sqlite3.Connection, table: str, columns: list[str]) -> None:
    cols = ", ".join(f'"{c}"' for c in columns)
    first = columns[0]
    conn.execute(
        f'CREATE TABLE IF NOT EXISTS "{table}" ({cols}, PRIMARY KEY ("{first}"))'
    )
    conn.execute(
        f"CREATE TABLE IF NOT EXISTS {PROGRESS_TABLE} "
        "(sink_table TEXT PRIMARY KEY, last_batch_id INTEGER NOT NULL)"
    )


#: Driver-side row cap per micro-batch (upserts + deletes AFTER the
#: winner-per-key reduction). SQLite is single-writer, so the reduced
#: row set must cross the driver — but unbounded batches would OOM it.
#: Raise the cap (or pass ``max_driver_rows``) for bulk backfills, and
#: bound batch size at the source with ``maxFilesPerTrigger`` /
#: ``maxOffsetsPerTrigger``.
DEFAULT_MAX_DRIVER_ROWS = 5_000_000


def _chunks(rows: list, size: int):
    for i in range(0, len(rows), size):
        yield rows[i : i + size]


def _iter_chunks(df: DataFrame, size: int, counter: list, cap: int | None):
    """Stream a DataFrame to the driver in bounded chunks.

    ``toLocalIterator`` holds one partition at a time on the driver
    (not the whole result, unlike ``collect``); ``counter``/``cap``
    enforce the documented row guard across BOTH row streams of a
    batch."""
    buf: list[tuple] = []
    for r in df.toLocalIterator(prefetchPartitions=True):
        counter[0] += 1
        if cap is not None and counter[0] > cap:
            raise RuntimeError(
                f"SQLite sink batch exceeds max_driver_rows={cap} reduced "
                "rows; bound micro-batch size at the source "
                "(maxFilesPerTrigger / maxOffsetsPerTrigger) or raise "
                "max_driver_rows for a deliberate bulk backfill"
            )
        buf.append(tuple(r))
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def apply_batch_to_sqlite(
    batch_df: DataFrame,
    batch_id: int,
    db_path: str,
    table: str,
    schema: StructType,
    key_cols: list[str],
    max_driver_rows: int | None = DEFAULT_MAX_DRIVER_ROWS,
) -> None:
    """Apply one micro-batch of change events to a SQLite replica.

    Winner-per-key reduction happens in Spark (distributed); this
    function transacts only the reduced row set, streamed to the
    driver one partition at a time (``toLocalIterator``) rather than
    materialized with ``collect`` — and guarded by ``max_driver_rows``
    (None disables) so an oversized batch fails with an actionable
    error instead of an OOM. Idempotent on re-delivery: the progress
    row is checked and advanced inside the same transaction as the
    data, and the transaction rolls back wholesale on any error
    mid-stream.
    """
    from pg2any_spark.operators.apply import _key_from_images

    dtypes = {f.name: f.dataType for f in schema.fields}
    events = batch_df.filter(F.col("table") == table)

    truncated = (
        events.filter(F.col("op") == OP_TRUNCATE).limit(1).count() > 0
    )
    winners = (
        events.filter(F.col("op") != OP_TRUNCATE)
        .select(
            *[_key_from_images(k, dtypes[k]).alias(f"__key_{k}") for k in key_cols],
            "op",
            "lsn",
            "after",
        )
        .groupBy(*[f"__key_{k}" for k in key_cols])
        .agg(F.max_by(F.struct("op", "after"), "lsn").alias("w"))
    )
    ups = winners.filter(F.col("w.op") != OP_DELETE).select(
        typed_from_map(F.col("w.after"), schema)
    )
    dels = winners.filter(F.col("w.op") == OP_DELETE).select(
        *[F.col(f"__key_{k}").alias(k) for k in key_cols]
    )
    columns = [f.name for f in schema.fields]
    conn = _connect(db_path)
    try:
        _ensure_tables(conn, table, columns)
        conn.execute("BEGIN IMMEDIATE")
        cur = conn.execute(
            f"SELECT last_batch_id FROM {PROGRESS_TABLE} WHERE sink_table = ?",
            (table,),
        )
        row = cur.fetchone()
        if row is not None and batch_id <= row[0]:
            conn.rollback()  # already applied — exactly-once dedup (O2)
            return
        if truncated:
            # SQLite has no TRUNCATE; the reference's dialect renders
            # DELETE FROM (``dialects/sqlite.rs:26-33``).
            conn.execute(f'DELETE FROM "{table}"')
        n_rows = [0]  # shared across both streams: one cap per batch
        col_sql = ", ".join(f'"{c}"' for c in columns)
        key_idx = [columns.index(k) for k in key_cols]
        for chunk in _iter_chunks(ups, MAX_ROWS_PER_STMT, n_rows, max_driver_rows):
            # NULL key = unroutable row; the reference hard-errors
            # instead of writing a NULL-keyed row or matching nothing
            # (``sql_renderer.rs`` missing-key error; its SQLite test
            # matrix pins it) — and the whole tx rolls back below.
            for r in chunk:
                if any(r[i] is None for i in key_idx):
                    raise ValueError(
                        f"apply_batch_to_sqlite: NULL key value for "
                        f"{key_cols} in upsert row {r!r} (table {table})"
                    )
            # Multi-value upsert ≈ coalescing rewrite R2 + MERGE
            # semantics of R3/R4 (``coalescing.rs:953-996``).
            placeholders = ", ".join(
                "(" + ", ".join("?" * len(columns)) + ")" for _ in chunk
            )
            conn.execute(
                f'INSERT OR REPLACE INTO "{table}" ({col_sql}) '
                f"VALUES {placeholders}",
                [v for r in chunk for v in r],
            )
        key_sql = " AND ".join(f'"{k}" = ?' for k in key_cols)
        for chunk in _iter_chunks(dels, MAX_ROWS_PER_STMT, n_rows, max_driver_rows):
            for r in chunk:
                if any(v is None for v in r):
                    raise ValueError(
                        f"apply_batch_to_sqlite: NULL key value for "
                        f"{key_cols} in delete row {r!r} (table {table}) — "
                        "a NULL-keyed DELETE matches nothing and would "
                        "silently drop the event"
                    )
            # OR-combined DELETE ≈ rewrite R5 (``coalescing.rs:332-357``).
            cond = " OR ".join(f"({key_sql})" for _ in chunk)
            conn.execute(
                f'DELETE FROM "{table}" WHERE {cond}',
                [v for r in chunk for v in r],
            )
        # Pre-commit hook: progress advances INSIDE the data tx (S10).
        conn.execute(
            f"INSERT OR REPLACE INTO {PROGRESS_TABLE} (sink_table, last_batch_id) "
            "VALUES (?, ?)",
            (table, batch_id),
        )
        conn.commit()
    except BaseException:
        conn.rollback()
        raise
    finally:
        conn.close()


def sqlite_batch_applier(
    db_path: str,
    table: str,
    schema: StructType,
    key_cols: list[str],
    max_driver_rows: int | None = DEFAULT_MAX_DRIVER_ROWS,
) -> Callable[[DataFrame, int], None]:
    """`foreachBatch` function applying change events to SQLite."""

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_to_sqlite(
            batch_df, batch_id, db_path, table, schema, key_cols,
            max_driver_rows=max_driver_rows,
        )

    return apply_fn
