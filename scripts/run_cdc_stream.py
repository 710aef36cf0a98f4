#!/usr/bin/env python
"""Standalone CDC apply stream runner.

Runs the streaming apply pipeline (``read_event_stream`` →
``start_cdc_apply`` → drain) in its own process so the hard-kill chaos
test (tests/test_scenarios.py::test_s5_hard_kill_restart) can SIGKILL
the whole process group mid-batch — the reference's chaos harness
property (``tests/chaos/scripts/chaos_script.sh``: random
``docker stop`` during replication), re-created process-locally.

Usage: run_cdc_stream.py SOURCE_DIR TARGET CHECKPOINT_DIR [MAX_FILES_PER_TRIGGER]

TARGET is a parquet replica path, ``sqlite:<db_path>`` to apply
through the live SQLite sink (atomic data+progress transactions),
``bucketed:<path>`` for the bucket-partitioned incremental applier, or
``wire:<path>`` to treat SOURCE_DIR as pgoutput WAL FRAMES and run the
full wire ingest (constant-memory decode → commit join → apply).
MAX_FILES_PER_TRIGGER does not apply to ``wire:`` targets (a WAL
segment must arrive whole within one micro-batch — the decode contract
— so the wire stream always drains availableNow without a file cap).
``wireseg:<path>`` is the wire ingest for producers that land every
segment wholly inside one file: there MAX_FILES_PER_TRIGGER applies,
bounding each micro-batch so a multi-transaction backlog checkpoints
incrementally (the repeated-kill chaos scenario strikes between those
commits).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pg2any_spark.schemas import T1_SCHEMA  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402
from pg2any_spark.streaming.pipeline import (  # noqa: E402
    read_event_stream,
    start_bucketed_cdc_apply,
    start_cdc_apply,
)


def main() -> None:
    src, target, ckpt = sys.argv[1:4]
    max_files = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    spark = get_spark(app_name="cdc-stream-runner", shuffle_partitions=8)
    if target.startswith(("wire:", "wireseg:", "wirev2seg:")):
        from pg2any_spark.streaming.pipeline import start_pgoutput_apply

        # wirev2seg: protocol v2 — segments carry STREAMED transactions
        # (Stream Start/Stop blocks of many interleaved xids, resolved
        # by Stream Commit), the pgbench many-concurrent-clients shape.
        seg_aligned = not target.startswith("wire:")
        query = start_pgoutput_apply(
            spark, src, target.split(":", 1)[1], T1_SCHEMA, ["id"], ckpt,
            table="t1", available_now=True, low_memory=True,
            protocol_version=2 if target.startswith("wirev2seg:") else 1,
            max_files_per_trigger=max_files if seg_aligned else None,
        )
        query.awaitTermination()
        spark.stop()
        return
    events = read_event_stream(spark, src, max_files_per_trigger=max_files)
    if target.startswith("bucketed:"):
        query = start_bucketed_cdc_apply(
            events,
            target[len("bucketed:"):],
            T1_SCHEMA,
            ["id"],
            ckpt,
            n_buckets=16,
            table="t1",
            available_now=True,
        )
        query.awaitTermination()
        spark.stop()
        return
    if target.startswith("sqlite:"):
        from pg2any_spark.sinks.sqlite_sink import sqlite_batch_applier

        query = (
            events.writeStream.foreachBatch(
                sqlite_batch_applier(
                    target[len("sqlite:"):], "t1", T1_SCHEMA, ["id"]
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    else:
        query = start_cdc_apply(
            events, target, T1_SCHEMA, ["id"], ckpt, table="t1", available_now=True
        )
    query.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
