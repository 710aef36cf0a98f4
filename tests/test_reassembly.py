"""Streaming-transaction reassembly (reference protocol v2:
StreamStart/StreamStop chunks, StreamCommit finalizes, StreamAbort
discards — ``producer.rs:199-300``)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from pg2any_spark.operators.apply import apply_changes
from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA, T1_SCHEMA
from pg2any_spark.streaming.reassembly import (
    REASSEMBLED_SCHEMA,
    reassemble_committed,
    reassemble_stream,
)

TS = datetime.datetime(2026, 1, 1)


def ev(op, txid, lsn, after=None, before=None):
    return Row(
        op=op, schema="public", table="t1", txid=txid, lsn=lsn,
        commit_ts=TS, before=before, after=after,
        key_columns=["id"], replica_identity="default",
    )


def t1a(id_, val):
    return {"id": str(id_), "val": str(val), "col1": "u", "col2": "u"}


#: Two interleaved streaming txs: tx1 commits, tx2 aborts; plus an
#: open tx3 that never finalizes.
INTERLEAVED = [
    ev("ss", 1, 10),
    ev("c", 1, 11, t1a(1, 100)),
    ev("sp", 1, 12),
    ev("ss", 2, 13),
    ev("c", 2, 14, t1a(2, 200)),
    ev("sp", 2, 15),
    ev("ss", 1, 16),
    ev("c", 1, 17, t1a(3, 300)),
    ev("sp", 1, 18),
    ev("sa", 2, 19),            # tx2 aborted
    ev("sc", 1, 20),            # tx1 committed at lsn 20
    ev("ss", 3, 21),
    ev("c", 3, 22, t1a(4, 400)),  # tx3 never commits
]


class TestBatchReassembly:
    def test_committed_only(self, spark):
        events = spark.createDataFrame(INTERLEAVED, CHANGE_EVENT_SCHEMA)
        out = reassemble_committed(events)
        rows = {r["lsn"]: r for r in out.collect()}
        assert set(rows) == {11, 17}  # tx1's two inserts only
        assert all(r["commit_lsn"] == 20 for r in rows.values())
        assert out.columns == [f.name for f in REASSEMBLED_SCHEMA.fields]

    def test_apply_composite_order(self, spark):
        """Commit order beats write order: tx5 writes first (low LSNs)
        but commits after tx4, so tx5's value must win."""
        events = spark.createDataFrame(
            [
                ev("c", 5, 1, t1a(1, 555)),   # written first...
                ev("c", 4, 2, t1a(1, 444)),
                ev("sc", 4, 30),              # tx4 commits first
                ev("sc", 5, 40),              # ...but tx5 commits last
            ],
            CHANGE_EVENT_SCHEMA,
        )
        final = apply_changes(
            reassemble_committed(events), T1_SCHEMA, ["id"],
            order_cols=["commit_lsn", "lsn"],
        )
        assert {r["id"]: r["val"] for r in final.collect()} == {1: 555}


class TestStreamingReassembly:
    def test_stateful_across_batches(self, spark, tmp_path):
        """Chunks arrive in one micro-batch, commit/abort in a later
        one — state must carry the buffers across batches."""
        src = str(tmp_path / "events")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        first = [r for r in INTERLEAVED if r.lsn <= 18]
        second = [r for r in INTERLEAVED if r.lsn > 18]
        spark.createDataFrame(first, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(second, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        stream = (
            spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            reassemble_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = {r["lsn"]: r for r in spark.read.parquet(out_dir).collect()}
        assert set(rows) == {11, 17}
        assert all(r["commit_lsn"] == 20 for r in rows.values())
        assert rows[11]["after"]["val"] == "100"
