"""SQLite destination sink: transactional apply, exactly-once
re-delivery dedup, truncate, streaming end-to-end (reference S7/S10
semantics re-created against a real SQLite file)."""

from __future__ import annotations

import datetime
import sqlite3

from pyspark.sql import Row

from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA, T1_SCHEMA
from pg2any_spark.sinks.sqlite_sink import (
    PROGRESS_TABLE,
    apply_batch_to_sqlite,
    sqlite_batch_applier,
)

TS = datetime.datetime(2026, 1, 1)


def ev(op, lsn, after=None, before=None):
    return Row(
        op=op, schema="public", table="t1", txid=1, lsn=lsn,
        commit_ts=TS, before=before, after=after,
        key_columns=["id"], replica_identity="default",
    )


def t1a(id_, val):
    return {"id": str(id_), "val": str(val), "col1": "u", "col2": "u"}


def state(db):
    with sqlite3.connect(db) as c:
        return {r[0]: r[1] for r in c.execute('SELECT id, val FROM "t1"')}


class TestSqliteSink:
    def test_upsert_delete_apply(self, spark, tmp_path):
        db = str(tmp_path / "dest.db")
        batch = spark.createDataFrame(
            [
                ev("c", 1, t1a(1, 10)),
                ev("c", 2, t1a(2, 20)),
                ev("u", 3, t1a(1, 11), {"id": "1"}),
                ev("d", 4, before=t1a(2, 20)),
            ],
            CHANGE_EVENT_SCHEMA,
        )
        apply_batch_to_sqlite(batch, 0, db, "t1", T1_SCHEMA, ["id"])
        assert state(db) == {1: 11}

    def test_redelivery_is_idempotent(self, spark, tmp_path):
        """Same batch id delivered twice (crash between destination
        commit and Spark checkpoint) must be a no-op the second time."""
        db = str(tmp_path / "dest.db")
        b0 = spark.createDataFrame([ev("c", 1, t1a(1, 10))], CHANGE_EVENT_SCHEMA)
        apply_batch_to_sqlite(b0, 0, db, "t1", T1_SCHEMA, ["id"])
        b1 = spark.createDataFrame(
            [ev("u", 2, t1a(1, 99), {"id": "1"})], CHANGE_EVENT_SCHEMA
        )
        apply_batch_to_sqlite(b1, 1, db, "t1", T1_SCHEMA, ["id"])
        assert state(db) == {1: 99}
        # re-deliver batch 0: stale, must not clobber batch 1's state
        apply_batch_to_sqlite(b0, 0, db, "t1", T1_SCHEMA, ["id"])
        assert state(db) == {1: 99}
        with sqlite3.connect(db) as c:
            rows = list(
                c.execute(f"SELECT sink_table, last_batch_id FROM {PROGRESS_TABLE}")
            )
        assert rows == [("t1", 1)]

    def test_truncate_resets_table(self, spark, tmp_path):
        db = str(tmp_path / "dest.db")
        b0 = spark.createDataFrame(
            [ev("c", 1, t1a(1, 10)), ev("c", 2, t1a(2, 20))], CHANGE_EVENT_SCHEMA
        )
        apply_batch_to_sqlite(b0, 0, db, "t1", T1_SCHEMA, ["id"])
        b1 = spark.createDataFrame(
            [ev("t", 3), ev("c", 4, t1a(3, 30))], CHANGE_EVENT_SCHEMA
        )
        apply_batch_to_sqlite(b1, 1, db, "t1", T1_SCHEMA, ["id"])
        assert state(db) == {3: 30}

    def test_max_driver_rows_guard_trips_and_rolls_back(self, spark, tmp_path):
        """An oversized batch fails with an actionable error (not an
        OOM) and leaves the replica untouched — the whole transaction
        rolls back, including the progress row, so a retry with a
        raised cap re-applies cleanly."""
        import pytest

        db = str(tmp_path / "dest.db")
        seed = spark.createDataFrame([ev("c", 1, t1a(1, 10))], CHANGE_EVENT_SCHEMA)
        apply_batch_to_sqlite(seed, 0, db, "t1", T1_SCHEMA, ["id"])
        big = spark.createDataFrame(
            [ev("c", 10 + i, t1a(100 + i, i)) for i in range(8)],
            CHANGE_EVENT_SCHEMA,
        )
        with pytest.raises(RuntimeError, match="max_driver_rows"):
            apply_batch_to_sqlite(
                big, 1, db, "t1", T1_SCHEMA, ["id"], max_driver_rows=5
            )
        assert state(db) == {1: 10}  # nothing from the failed batch
        with sqlite3.connect(db) as c:
            rows = list(
                c.execute(f"SELECT last_batch_id FROM {PROGRESS_TABLE}")
            )
        assert rows == [(0,)]  # progress did not advance
        # retry with the cap raised: applies completely
        apply_batch_to_sqlite(
            big, 1, db, "t1", T1_SCHEMA, ["id"], max_driver_rows=None
        )
        assert len(state(db)) == 9

    def test_streaming_end_to_end(self, spark, tmp_path):
        db = str(tmp_path / "dest.db")
        src = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        rows = [ev("c", i, t1a(i, i * 10)) for i in range(1, 21)]
        rows.append(ev("d", 100, before=t1a(7, 70)))
        spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(
                sqlite_batch_applier(db, "t1", T1_SCHEMA, ["id"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        expect = {i: i * 10 for i in range(1, 21) if i != 7}
        assert state(db) == expect
