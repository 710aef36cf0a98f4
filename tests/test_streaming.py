"""Structured Streaming CDC pipeline: end-to-end apply, exactly-once
across restarts (the chaos-suite property from SURVEY §5 re-created as
checkpoint kill-and-restart), watermarked windows."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import Row

from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA, T1_SCHEMA
from pg2any_spark.sources.fixtures import load_table
from pg2any_spark.streaming.pipeline import (
    read_event_stream,
    start_cdc_apply,
    streaming_daily_counts,
)

TS = datetime.datetime(2026, 1, 1)


def ev(op, lsn, after=None, before=None):
    return Row(
        op=op,
        schema="public",
        table="t1",
        txid=1,
        lsn=lsn,
        commit_ts=TS,
        before=before,
        after=after,
        key_columns=["id"],
        replica_identity="default",
    )


def t1a(id_, val):
    return {"id": str(id_), "val": str(val), "col1": "u", "col2": "u"}


def write_events(spark, path, rows, filename):
    spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def read_state(spark, target):
    return {r["id"]: r["val"] for r in spark.read.parquet(target).collect()}


class TestStreamingApply:
    def test_end_to_end_apply(self, spark, tmp_path):
        src = str(tmp_path / "events")
        target = str(tmp_path / "replica")
        ckpt = str(tmp_path / "ckpt")
        write_events(
            spark,
            src,
            [ev("c", 1, t1a(1, 10)), ev("c", 2, t1a(2, 20)), ev("u", 3, t1a(1, 11), {"id": "1"})],
            "b1",
        )
        q = start_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt
        )
        q.awaitTermination(120)
        assert read_state(spark, target) == {1: 11, 2: 20}

    def test_restart_no_loss_no_dup(self, spark, tmp_path):
        """Kill-and-restart: second run with the same checkpoint must
        process only new files (no duplicates), and must pick up files
        added while stopped (no loss)."""
        src = str(tmp_path / "events")
        target = str(tmp_path / "replica")
        ckpt = str(tmp_path / "ckpt")
        write_events(spark, src, [ev("c", i, t1a(i, i)) for i in range(1, 51)], "b1")
        q = start_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt
        )
        q.awaitTermination(120)
        assert len(read_state(spark, target)) == 50

        # while "down": more inserts and some deletes arrive
        write_events(
            spark,
            src,
            [ev("c", 100 + i, t1a(50 + i, i)) for i in range(1, 11)]
            + [ev("d", 200 + i, before={"id": str(i)}) for i in range(1, 6)],
            "b2",
        )
        q2 = start_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt
        )
        q2.awaitTermination(120)
        state = read_state(spark, target)
        # 50 original + 10 new - 5 deleted; replays would resurrect deleted ids
        assert len(state) == 55
        assert all(i not in state for i in range(1, 6))
        assert state[51] == 1

    def test_truncate_in_stream(self, spark, tmp_path):
        src = str(tmp_path / "events")
        target = str(tmp_path / "replica")
        ckpt = str(tmp_path / "ckpt")
        write_events(
            spark,
            src,
            [ev("c", 1, t1a(1, 1)), ev("t", 5), ev("c", 6, t1a(9, 9))],
            "b1",
        )
        q = start_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt
        )
        q.awaitTermination(120)
        assert read_state(spark, target) == {9: 9}


    def test_dedup_boundary_skips_already_applied(self, spark, tmp_path):
        """Slot-reconcile hand-off (reference O2/O11): a FRESH checkpoint
        over an already-applied source must not double-apply when the
        reconciled dedup boundary is passed — deletes below the boundary
        stay deleted."""
        from pg2any_spark.config import SlotStatus, reconcile_resume

        src = str(tmp_path / "events")
        target = str(tmp_path / "replica")
        write_events(
            spark,
            src,
            [ev("c", 1, t1a(1, 1)), ev("c", 2, t1a(2, 2)),
             ev("d", 3, before={"id": "2"}), ev("c", 10, t1a(3, 3))],
            "b1",
        )
        # first incarnation applied through lsn=3 (id=2 deleted), then
        # its checkpoint was lost; the slot still remembers lsn=3.
        decision = reconcile_resume(
            disk_lsn=3, slot=SlotStatus(confirmed_flush_lsn=3)
        )
        q = start_cdc_apply(
            read_event_stream(spark, src),
            target,
            T1_SCHEMA,
            ["id"],
            str(tmp_path / "fresh_ckpt"),
            dedup_boundary=decision.dedup_boundary,
        )
        q.awaitTermination(120)
        # only lsn=10 passes the boundary: id=2's delete is not replayed
        # as a resurrecting insert, id=1's insert is not re-applied
        assert read_state(spark, target) == {3: 3}


class TestStreamingWindows:
    def test_daily_counts_match_batch(self, spark, sf_dir, tmp_path):
        """Streaming windowed agg over the events fixture == batch
        groupBy (replay-the-log equivalence)."""
        events = load_table(spark, "events", sf_dir)
        src = str(tmp_path / "evsrc")
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = streaming_daily_counts(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("daily_counts")
            .outputMode("append")  # watermark closes windows on availableNow
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("select * from daily_counts").collect()
        }
        from pyspark.sql import functions as F

        batch = (
            events.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
            .collect()
        )
        expected = {(r["day"], r["event_type"]): (r["n"], r["v"]) for r in batch}
        # append mode emits only closed windows; the last day stays open
        assert got
        for k, v in got.items():
            assert expected[k] == v

    def test_daily_counts_on_raw_ntz_fixture(self, spark, sf_dir):
        """Stream DIRECTLY from the driver fixture parquet: ``ts``
        arrives as TIMESTAMP_NTZ (parquet NTZ inference), the exact
        shape that used to crash ``withWatermark`` — the pipeline must
        normalize it, not rely on the batch loader having run."""
        from pyspark.sql import functions as F

        path = f"{sf_dir}/events.parquet"
        raw_schema = spark.read.format("parquet").load(path).schema
        assert raw_schema["ts"].dataType.typeName() == "timestamp_ntz"
        # file stream sources want a directory: stream the fixture DIR
        # filtered to the events file (read-only, no copy)
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        out = streaming_daily_counts(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("daily_counts_ntz")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("select * from daily_counts_ntz").collect()
        }
        events = load_table(spark, "events", sf_dir)
        batch = (
            events.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
            .collect()
        )
        expected = {(r["day"], r["event_type"]): (r["n"], r["v"]) for r in batch}
        assert got
        for k, v in got.items():
            assert expected[k] == v


class TestStreamingDedup:
    def test_exact_dedup_drops_recrawl_within_watermark(self, spark, tmp_path):
        """Re-crawled (identical after normalization) documents arriving
        later in the stream are dropped; distinct content survives."""
        from pyspark.sql import functions as F

        from pg2any_spark.streaming.pipeline import streaming_exact_dedup

        rows = [
            (1, "2026-01-01 00:00:00", "alpha beta gamma"),
            (2, "2026-01-01 00:05:00", "  ALPHA   beta GAMMA "),  # dup of 1
            (3, "2026-01-01 00:10:00", "delta epsilon"),
            (4, "2026-01-01 00:20:00", "alpha beta gamma"),       # dup of 1
            (5, "2026-01-01 00:25:00", "zeta eta"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, ts string, text string"
        ).withColumn("ts", F.to_timestamp("ts"))
        src = str(tmp_path / "docsrc")
        docs.repartition(1).write.parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).parquet(src)
        out = streaming_exact_dedup(stream, watermark="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = {
            r["doc_id"]
            for r in spark.sql("select doc_id from dedup_stream").collect()
        }
        # one survivor per distinct fingerprint; 2 and 4 are dropped
        assert 3 in kept and 5 in kept
        assert len(kept & {1, 2, 4}) == 1
        assert 2 not in kept or 1 not in kept  # never both of a dup pair


class TestStreamingSessionize:
    def test_sessions_close_on_gap_across_batches(self, spark, tmp_path):
        """Custom stateful operator (applyInPandasWithState): sessions
        separated by > gap close and emit; the open tail session stays
        in state. Two source files = two micro-batches, so the second
        batch closes sessions opened in the first — state survives the
        batch boundary."""
        from pyspark.sql import functions as F

        from pg2any_spark.streaming.pipeline import sessionize_stream

        def ev(eid, user, ts):
            return (eid, ts, user)

        batch1 = [
            ev(1, 1, "2026-01-01 10:00:00"),
            ev(2, 1, "2026-01-01 10:05:00"),
            ev(3, 1, "2026-01-01 10:10:00"),
            ev(4, 2, "2026-01-01 10:00:00"),
        ]
        batch2 = [
            ev(5, 1, "2026-01-01 11:00:00"),  # >30min after 10:10 → closes s1
            ev(6, 2, "2026-01-01 10:10:00"),  # within gap → still open
            ev(7, 1, "2026-01-01 23:00:00"),  # closes the 11:00 session
        ]
        src = str(tmp_path / "events")
        for i, rows in enumerate([batch1, batch2]):
            spark.createDataFrame(
                rows, "event_id long, ts string, user_id long"
            ).withColumn("ts", F.to_timestamp("ts")).repartition(1).write.mode(
                "append"
            ).parquet(src)

        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long"
        ).option("maxFilesPerTrigger", "1").parquet(src)
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
            .writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "select * from sessions order by user_id, session_start"
        ).collect()
        closed = [
            (r["user_id"], str(r["session_start"]), r["n_events"], r["duration_s"])
            for r in rows
        ]
        # user 1: 10:00-10:10 (3 events) and the 11:00 singleton close
        # via in-group gap logic; user 2's session closes via the
        # EVENT-TIME TIMEOUT (hasTimedOut path) once the 23:00 event
        # advances the watermark past its last+gap. User 1's 23:00
        # tail stays open in state: its timeout (23:30) is beyond the
        # final watermark.
        assert closed == [
            (1, "2026-01-01 10:00:00", 3, 600),
            (1, "2026-01-01 11:00:00", 1, 0),
            (2, "2026-01-01 10:00:00", 2, 600),
        ]


class TestMultiTableApply:
    def test_one_stream_two_replicas(self, spark, tmp_path, sf_dir):
        """One interleaved event stream advances BOTH table replicas
        under a single checkpoint; each replica equals its direct
        batch apply."""
        from pg2any_spark.operators.apply import apply_changes
        from pg2any_spark.sources.cdc_gen import (
            synth_customer_events,
            synth_orders_events,
        )
        from pg2any_spark.streaming.pipeline import start_multi_table_apply

        cust = load_table(spark, "customer", sf_dir)
        orders = load_table(spark, "orders", sf_dir)
        events = synth_customer_events(spark, sf_dir).unionByName(
            synth_orders_events(spark, sf_dir)
        )
        src = str(tmp_path / "events")
        events.repartition(2).write.parquet(src)

        stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(src)
        t_cust = str(tmp_path / "cust")
        t_ord = str(tmp_path / "ord")
        q = start_multi_table_apply(
            stream,
            {
                "customer": (t_cust, cust.schema, ["c_custkey"]),
                "orders": (t_ord, orders.schema, ["o_orderkey"]),
            },
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)

        for target, schema, keys, table in [
            (t_cust, cust.schema, ["c_custkey"], "customer"),
            (t_ord, orders.schema, ["o_orderkey"], "orders"),
        ]:
            got = spark.read.parquet(target)
            want = apply_changes(
                events, schema, keys, table=table, scan_for_truncate=False
            )
            assert got.exceptAll(want).isEmpty(), table
            assert want.exceptAll(got).isEmpty(), table


class TestStreamingScd2:
    def test_incremental_history_matches_batch_build(self, spark, sf_dir, tmp_path):
        """Replay the synthesized customer CDC stream in THREE
        micro-batches (split on the LSN bands: inserts / updates /
        deletes) through start_scd2_history; the final history must
        equal the one-shot batch scd2_from_events build — incremental
        maintenance may not change semantics."""
        from pg2any_spark.operators.scd2 import scd2_from_events
        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.fixtures import load_table
        from pg2any_spark.streaming.pipeline import start_scd2_history
        from pyspark.sql import functions as F

        events = synth_customer_events(spark, sf_dir)
        cust = load_table(spark, "customer", sf_dir)
        src = str(tmp_path / "events")
        # one file per LSN band -> maxFilesPerTrigger=1 gives 3 batches
        for lo, hi in ((0, 10_000_000), (10_000_000, 20_000_000),
                       (20_000_000, 1 << 60)):
            events.filter(
                (F.col("lsn") >= lo) & (F.col("lsn") < hi)
            ).coalesce(1).write.mode("append").parquet(src)

        history = str(tmp_path / "history")
        q = start_scd2_history(
            read_event_stream(spark, src, max_files_per_trigger=1),
            history, cust.schema, ["c_custkey"],
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)

        def key(r):
            return (r["c_custkey"], r["valid_from_lsn"])

        def payload(r):
            return (
                r["valid_to_lsn"], r["is_current"], r["c_acctbal"], r["c_name"]
            )

        got = {key(r): payload(r) for r in spark.read.parquet(history).collect()}
        want = {
            key(r): payload(r)
            for r in scd2_from_events(events, cust.schema, ["c_custkey"]).collect()
        }
        assert len(got) == len(want)
        assert got == want


class TestMultiTableBucketedApply:
    """Whole-publication replication onto bucketed replicas: one
    stream, one checkpoint, N touched-bucket incremental replicas."""

    def _ev2(self, op, lsn, table, after=None, before=None):
        return Row(
            op=op, schema="public", table=table, txid=1, lsn=lsn,
            commit_ts=TS, before=before, after=after,
            key_columns=["id"], replica_identity="default",
        )

    def test_one_stream_two_bucketed_replicas(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import (
            read_bucketed_replica,
            start_multi_table_bucketed_apply,
        )

        src = str(tmp_path / "events")
        rows = (
            [self._ev2("c", i, "t1", t1a(i, i)) for i in range(1, 21)]
            + [self._ev2("c", 100 + i, "t2", t1a(i, 1000 + i)) for i in range(1, 11)]
            + [self._ev2("d", 200, "t1", before={"id": "3"})]
        )
        write_events(spark, src, rows, "b1")
        q = start_multi_table_bucketed_apply(
            read_event_stream(spark, src),
            {
                "t1": (str(tmp_path / "r1"), T1_SCHEMA, ["id"]),
                "t2": (str(tmp_path / "r2"), T1_SCHEMA, ["id"]),
            },
            checkpoint_dir=str(tmp_path / "ckpt"),
            n_buckets=4,
        )
        q.awaitTermination(120)
        s1 = {r["id"]: r["val"]
              for r in read_bucketed_replica(spark, str(tmp_path / "r1")).collect()}
        s2 = {r["id"]: r["val"]
              for r in read_bucketed_replica(spark, str(tmp_path / "r2")).collect()}
        assert len(s1) == 19 and 3 not in s1 and s1[5] == 5
        assert len(s2) == 10 and s2[5] == 1005

    def test_single_table_batch_leaves_other_table_untouched(self, spark, tmp_path):
        """mtime audit: a batch touching only t1 must not rewrite any
        of t2's bucket files — per-batch cost is O(touched buckets of
        touched TABLES), the publication-wide pruning contract."""
        import os

        from pg2any_spark.streaming.pipeline import (
            read_bucketed_replica,
            start_multi_table_bucketed_apply,
        )

        src = str(tmp_path / "events")
        tables = {
            "t1": (str(tmp_path / "r1"), T1_SCHEMA, ["id"]),
            "t2": (str(tmp_path / "r2"), T1_SCHEMA, ["id"]),
        }
        write_events(
            spark, src,
            [self._ev2("c", i, "t1", t1a(i, i)) for i in range(1, 11)]
            + [self._ev2("c", 100 + i, "t2", t1a(i, i)) for i in range(1, 11)],
            "b1",
        )
        q = start_multi_table_bucketed_apply(
            read_event_stream(spark, src), tables,
            checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=4,
        )
        q.awaitTermination(120)

        def snapshot(root):
            out = {}
            for r, _d, files in os.walk(root):
                for f in files:
                    p = os.path.join(r, f)
                    out[p] = os.stat(p).st_mtime_ns
            return out

        t2_before = snapshot(str(tmp_path / "r2"))
        # second batch: t1-only update
        write_events(
            spark, src,
            [self._ev2("u", 500, "t1", t1a(1, 999), {"id": "1"})],
            "b2",
        )
        q2 = start_multi_table_bucketed_apply(
            read_event_stream(spark, src), tables,
            checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=4,
        )
        q2.awaitTermination(120)
        assert snapshot(str(tmp_path / "r2")) == t2_before
        s1 = {r["id"]: r["val"]
              for r in read_bucketed_replica(spark, str(tmp_path / "r1")).collect()}
        assert s1[1] == 999 and len(s1) == 10


class TestIncrementalAggView:
    """Continuous aggregate-view maintenance: additive delta folds are
    NOT idempotent under at-least-once replay, so the view carries a
    batch-id cursor committed atomically with the data."""

    @staticmethod
    def _delta_fn(batch_df):
        from pyspark.sql import functions as F

        sign = F.when(F.col("op") == "c", F.lit(1)).otherwise(F.lit(-1))
        img = F.when(F.col("op") == "c", F.col("after")).otherwise(
            F.col("before")
        )
        return batch_df.filter(F.col("op").isin("c", "d")).select(
            img["col1"].alias("grp"),
            sign.cast("bigint").alias("n"),
            (sign * img["val"].cast("double")).alias("val_sum"),
        )

    def _view(self, spark, path):
        return {
            r["grp"]: (r["n"], r["val_sum"])
            for r in spark.read.parquet(path).collect()
        }

    def test_replayed_batch_id_is_noop(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import agg_view_apply_batch

        view = str(tmp_path / "view")
        b1 = spark.createDataFrame(
            [ev("c", 1, t1a(1, 10)), ev("c", 2, t1a(2, 20))], CHANGE_EVENT_SCHEMA
        )
        b2 = spark.createDataFrame(
            [ev("d", 3, before={"id": "1", "val": "10", "col1": "u", "col2": "u"}),
             ev("c", 4, t1a(3, 5))],
            CHANGE_EVENT_SCHEMA,
        )
        args = (view, self._delta_fn, ["grp"])
        agg_view_apply_batch(spark, b1, 0, *args)
        agg_view_apply_batch(spark, b2, 1, *args)
        want = self._view(spark, view)
        assert want == {"u": (2, 25.0)}  # 10+20-10+5
        # crash-replay: same batch id folds nothing (a naive re-fold
        # would drop n to 1 and val_sum to 15)
        agg_view_apply_batch(spark, b2, 1, *args)
        assert self._view(spark, view) == want
        # genuinely-new batch still applies
        b3 = spark.createDataFrame(
            [ev("c", 9, t1a(4, 100))], CHANGE_EVENT_SCHEMA
        )
        agg_view_apply_batch(spark, b3, 2, *args)
        assert self._view(spark, view) == {"u": (3, 125.0)}

    def test_diverged_cursor_raises(self, spark, tmp_path):
        """A batch id BELOW the view's cursor means the checkpoint was
        restarted against a surviving view — silently skipping would
        drop the new events folded into the restarted id, so it must
        raise."""
        from pg2any_spark.streaming.pipeline import agg_view_apply_batch

        view = str(tmp_path / "view")
        b = spark.createDataFrame([ev("c", 1, t1a(1, 10))], CHANGE_EVENT_SCHEMA)
        args = (view, self._delta_fn, ["grp"])
        agg_view_apply_batch(spark, b, 0, *args)
        agg_view_apply_batch(spark, b, 1, *args)
        with pytest.raises(ValueError, match="diverged"):
            agg_view_apply_batch(spark, b, 0, *args)

    def test_stream_restart_no_double_fold(self, spark, tmp_path):
        """Kill-and-restart with the same checkpoint: the view equals
        the one-shot aggregation of all events, with no double-folded
        deltas."""
        from pg2any_spark.streaming.pipeline import start_incremental_agg_view

        src = str(tmp_path / "events")
        view = str(tmp_path / "view")
        ckpt = str(tmp_path / "ck")
        write_events(spark, src, [ev("c", i, t1a(i, i)) for i in range(1, 21)], "b1")
        q = start_incremental_agg_view(
            read_event_stream(spark, src), view, self._delta_fn, ["grp"], ckpt
        )
        q.awaitTermination(120)
        assert self._view(spark, view) == {"u": (20, float(sum(range(1, 21))))}

        write_events(
            spark, src,
            [ev("d", 100 + i, before=t1a(i, i)) for i in range(1, 6)],
            "b2",
        )
        q2 = start_incremental_agg_view(
            read_event_stream(spark, src), view, self._delta_fn, ["grp"], ckpt
        )
        q2.awaitTermination(120)
        # a replay of b1 would give n=35; correct is 20 - 5
        assert self._view(spark, view) == {
            "u": (15, float(sum(range(6, 21))))
        }


class TestStreamingScd2Replay:
    """Replay idempotence and feed hygiene for the incremental SCD2
    applier — foreachBatch is at-least-once, so a crash-replayed batch
    (history written, checkpoint not committed) must be a no-op."""

    def _hist(self, spark, history):
        return {
            (r["id"], r["valid_from_lsn"]): (r["valid_to_lsn"], r["is_current"], r["val"])
            for r in spark.read.parquet(history).collect()
        }

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        """Apply the same micro-batch twice (simulated crash-replay):
        the history must be byte-identical — no duplicate
        (key, valid_from_lsn) rows, no degenerate [L, L) interval from
        the LSN tie between the open-version pseudo-insert and the
        replayed max-LSN event."""
        from pg2any_spark.streaming.pipeline import scd2_apply_batch

        history = str(tmp_path / "hist")
        b1 = spark.createDataFrame(
            [ev("c", 1, t1a(1, 10)), ev("c", 2, t1a(2, 20))], CHANGE_EVENT_SCHEMA
        )
        b2 = spark.createDataFrame(
            [ev("u", 5, t1a(1, 11), {"id": "1"}), ev("d", 6, before={"id": "2"}),
             ev("c", 7, t1a(3, 30))],
            CHANGE_EVENT_SCHEMA,
        )
        scd2_apply_batch(spark, b1, history, T1_SCHEMA, ["id"])
        scd2_apply_batch(spark, b2, history, T1_SCHEMA, ["id"])
        want = self._hist(spark, history)
        # crash-replay of b2 — includes a delete-closed key (no open
        # version, the high-water mark must come from valid_to_lsn)
        scd2_apply_batch(spark, b2, history, T1_SCHEMA, ["id"])
        assert self._hist(spark, history) == want
        # and a genuinely-new event after the replay still applies
        b3 = spark.createDataFrame(
            [ev("u", 9, t1a(1, 12), {"id": "1"})], CHANGE_EVENT_SCHEMA
        )
        scd2_apply_batch(spark, b3, history, T1_SCHEMA, ["id"])
        got = self._hist(spark, history)
        assert got[(1, 9)] == (None, True, 12)
        assert got[(1, 5)] == (9, False, 11)

    def test_restart_no_loss_no_dup(self, spark, tmp_path):
        """Kill-and-restart with the same checkpoint on the SCD2
        applier, mirroring TestBucketedApplyRestart: the second
        incarnation processes only new files and picks up files added
        while down."""
        from pg2any_spark.operators.scd2 import scd2_from_events
        from pg2any_spark.streaming.pipeline import start_scd2_history

        src = str(tmp_path / "events")
        history = str(tmp_path / "hist")
        ckpt = str(tmp_path / "ck")
        batch1 = [ev("c", i, t1a(i, i)) for i in range(1, 21)]
        write_events(spark, src, batch1, "b1")
        q = start_scd2_history(
            read_event_stream(spark, src), history, T1_SCHEMA, ["id"], ckpt
        )
        q.awaitTermination(120)
        assert len(self._hist(spark, history)) == 20

        batch2 = (
            [ev("u", 100 + i, t1a(i, 1000 + i), {"id": str(i)}) for i in range(1, 6)]
            + [ev("d", 200 + i, before={"id": str(i)}) for i in range(6, 9)]
        )
        write_events(spark, src, batch2, "b2")
        q2 = start_scd2_history(
            read_event_stream(spark, src), history, T1_SCHEMA, ["id"], ckpt
        )
        q2.awaitTermination(120)
        got = self._hist(spark, history)
        want = {
            (r["id"], r["valid_from_lsn"]): (r["valid_to_lsn"], r["is_current"], r["val"])
            for r in scd2_from_events(
                spark.createDataFrame(batch1 + batch2, CHANGE_EVENT_SCHEMA),
                T1_SCHEMA,
                ["id"],
            ).collect()
        }
        assert got == want

    def test_boolean_key_touched_set(self, spark, tmp_path):
        """PG wire booleans render 't'/'f'; the touched-key extraction
        must type them the same way scd2_from_events does, or the open
        version is never retired and duplicate current versions
        accumulate."""
        from pyspark.sql.types import (
            BooleanType,
            LongType,
            StructField,
            StructType,
        )

        from pg2any_spark.streaming.pipeline import scd2_apply_batch

        flag_schema = StructType(
            [StructField("flag", BooleanType()), StructField("n", LongType())]
        )
        history = str(tmp_path / "hist")

        def fev(op, lsn, after=None, before=None):
            return Row(
                op=op, schema="public", table="flags", txid=1, lsn=lsn,
                commit_ts=TS, before=before, after=after,
                key_columns=["flag"], replica_identity="default",
            )

        b1 = spark.createDataFrame(
            [fev("c", 1, {"flag": "t", "n": "1"})], CHANGE_EVENT_SCHEMA
        )
        b2 = spark.createDataFrame(
            [fev("u", 2, {"flag": "t", "n": "2"}, {"flag": "t"})],
            CHANGE_EVENT_SCHEMA,
        )
        scd2_apply_batch(spark, b1, history, flag_schema, ["flag"])
        scd2_apply_batch(spark, b2, history, flag_schema, ["flag"])
        rows = spark.read.parquet(history).collect()
        current = [r for r in rows if r["is_current"]]
        assert len(current) == 1 and current[0]["n"] == 2
        assert len(rows) == 2  # v1 closed at lsn=2, v2 open

    def test_table_filter_ignores_other_tables(self, spark, tmp_path):
        """A multi-table feed through the SCD2 applier with table= must
        not interleave other tables' rows into the history."""
        from pg2any_spark.streaming.pipeline import scd2_apply_batch

        history = str(tmp_path / "hist")
        other = Row(
            op="c", schema="public", table="t2", txid=1, lsn=50, commit_ts=TS,
            before=None, after={"id": "999", "val": "9", "col1": "x", "col2": "x"},
            key_columns=["id"], replica_identity="default",
        )
        batch = spark.createDataFrame(
            [ev("c", 1, t1a(1, 10)), other], CHANGE_EVENT_SCHEMA
        )
        scd2_apply_batch(spark, batch, history, T1_SCHEMA, ["id"], table="t1")
        ids = [r["id"] for r in spark.read.parquet(history).collect()]
        assert ids == [1]

    def test_truncate_raises(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import scd2_apply_batch

        history = str(tmp_path / "hist")
        batch = spark.createDataFrame(
            [ev("c", 1, t1a(1, 10)), ev("t", 5)], CHANGE_EVENT_SCHEMA
        )
        with pytest.raises(ValueError, match="TRUNCATE"):
            scd2_apply_batch(spark, batch, history, T1_SCHEMA, ["id"])


class TestStreamStreamJoin:
    def test_interval_join_matches_batch(self, spark, sf_dir, tmp_path):
        """Stream-stream bounded interval join (click→purchase within
        30 min per user) over the real events fixture == the batch
        interval_join on the same slices."""
        from pyspark.sql import functions as F

        from pg2any_spark.operators.temporal import interval_join
        from pg2any_spark.streaming.pipeline import stream_stream_interval_join

        ev = load_table(spark, "events", sf_dir)
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id_r"),
            F.col("ts").alias("p_ts"),
        )
        csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
        clicks.write.parquet(csrc)
        purchases.write.parquet(psrc)
        cstream = spark.readStream.schema(clicks.schema).parquet(csrc)
        pstream = spark.readStream.schema(purchases.schema).parquet(psrc)
        joined = stream_stream_interval_join(
            cstream, pstream, by="user_id", left_ts="c_ts", right_ts="p_ts",
            max_gap_seconds=1800, watermark="1 hour",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("ss_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["click_id"], r["purchase_id"])
            for r in spark.sql("select * from ss_join").collect()
        }
        want = {
            (r["click_id"], r["purchase_id"])
            for r in interval_join(
                clicks, purchases, by=["user_id"], left_ts="c_ts",
                right_ts="p_ts", max_gap_seconds=1800,
                right_by=["user_id_r"],
            ).collect()
        }
        assert want  # non-trivial
        assert got == want


class TestBucketedApply:
    """Bucket-partitioned incremental apply: per-batch cost must be
    O(touched buckets), with end-state identical to the full-rewrite
    applier."""

    def _start(self, spark, src, target, ckpt, n_buckets=8):
        from pg2any_spark.streaming.pipeline import start_bucketed_cdc_apply

        return start_bucketed_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt,
            n_buckets=n_buckets,
        )

    def test_end_state_matches_full_rewrite(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import read_bucketed_replica

        src = str(tmp_path / "events")
        write_events(
            spark,
            src,
            [ev("c", i, t1a(i, i)) for i in range(1, 51)]
            + [ev("u", 100 + i, t1a(i, 1000 + i), {"id": str(i)}) for i in range(1, 11)]
            + [ev("d", 200 + i, before={"id": str(i)}) for i in range(40, 46)],
            "b1",
        )
        q = self._start(spark, src, str(tmp_path / "rep"), str(tmp_path / "ck"))
        q.awaitTermination(120)
        got = {
            r["id"]: r["val"]
            for r in read_bucketed_replica(spark, str(tmp_path / "rep")).collect()
        }
        expected = {i: (1000 + i if i <= 10 else i) for i in range(1, 51)
                    if not (40 <= i <= 45)}
        assert got == expected

    def test_untouched_partitions_not_rewritten(self, spark, tmp_path):
        import glob as g

        src = str(tmp_path / "events")
        target = str(tmp_path / "rep")
        ckpt = str(tmp_path / "ck")
        write_events(spark, src, [ev("c", i, t1a(i, i)) for i in range(1, 51)], "b1")
        q = self._start(spark, src, target, ckpt)
        q.awaitTermination(120)
        # snapshot data-file mtimes per partition dir
        before = {
            p: sorted(os.path.getmtime(f) for f in g.glob(f"{p}/*.parquet"))
            for p in g.glob(f"{target}/__bucket=*")
        }
        assert len(before) > 2  # several buckets exist
        # second batch touches exactly ONE key
        write_events(spark, src, [ev("u", 999, t1a(7, 7777), {"id": "7"})], "b2")
        q2 = self._start(spark, src, target, ckpt)
        q2.awaitTermination(120)
        after = {
            p: sorted(os.path.getmtime(f) for f in g.glob(f"{p}/*.parquet"))
            for p in g.glob(f"{target}/__bucket=*")
        }
        changed = [p for p in before if after.get(p) != before[p]]
        assert len(changed) == 1, changed  # only key 7's bucket rewrote
        from pg2any_spark.streaming.pipeline import read_bucketed_replica

        state = {
            r["id"]: r["val"]
            for r in read_bucketed_replica(spark, target).collect()
        }
        assert state[7] == 7777 and len(state) == 50

    def test_bucket_cleared_when_all_rows_deleted(self, spark, tmp_path):
        import glob as g

        from pg2any_spark.streaming.pipeline import read_bucketed_replica

        src = str(tmp_path / "events")
        target = str(tmp_path / "rep")
        ckpt = str(tmp_path / "ck")
        # n_buckets=1000 with 3 keys -> each key very likely alone in
        # its bucket; delete one key entirely
        write_events(
            spark, src,
            [ev("c", 1, t1a(1, 1)), ev("c", 2, t1a(2, 2)), ev("c", 3, t1a(3, 3))],
            "b1",
        )
        q = self._start(spark, src, target, ckpt, n_buckets=1000)
        q.awaitTermination(120)
        n_dirs_before = len(g.glob(f"{target}/__bucket=*"))
        write_events(spark, src, [ev("d", 10, before={"id": "2"})], "b2")
        q2 = self._start(spark, src, target, ckpt, n_buckets=1000)
        q2.awaitTermination(120)
        state = {
            r["id"]: r["val"] for r in read_bucketed_replica(spark, target).collect()
        }
        assert state == {1: 1, 3: 3}
        assert len(g.glob(f"{target}/__bucket=*")) == n_dirs_before - 1


class TestCompaction:
    def test_compact_flat_replica(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import compact_replica

        target = str(tmp_path / "rep")
        # 20 tiny appends -> >= 20 files
        for i in range(20):
            spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(target)
        import glob as g

        n_before = len(g.glob(f"{target}/*.parquet"))
        assert n_before >= 20
        n_after = compact_replica(spark, target)
        assert n_after < n_before and n_after >= 1
        got = sorted(r["id"] for r in spark.read.parquet(target).collect())
        assert got == list(range(200))

    def test_compact_bucketed_replica_keeps_layout(self, spark, tmp_path):
        import glob as g

        from pg2any_spark.streaming.pipeline import (
            compact_replica,
            read_bucketed_replica,
        )

        src = str(tmp_path / "events")
        target = str(tmp_path / "rep")
        # several micro-batches -> several file sets per bucket
        for b in range(4):
            write_events(
                spark, src,
                [ev("c", 1000 * b + i, t1a(100 * b + i, i)) for i in range(1, 11)],
                f"b{b}",
            )
        from pg2any_spark.streaming.pipeline import start_bucketed_cdc_apply

        q = start_bucketed_cdc_apply(
            read_event_stream(spark, src, max_files_per_trigger=1),
            target, T1_SCHEMA, ["id"], str(tmp_path / "ck"), n_buckets=4,
        )
        q.awaitTermination(180)
        before_state = {
            r["id"]: r["val"] for r in read_bucketed_replica(spark, target).collect()
        }
        compact_replica(spark, target)
        dirs = g.glob(f"{target}/__bucket=*")
        assert dirs  # layout preserved
        for d in dirs:
            assert len(g.glob(f"{d}/*.parquet")) == 1  # one file per bucket
        after_state = {
            r["id"]: r["val"] for r in read_bucketed_replica(spark, target).collect()
        }
        assert after_state == before_state and len(after_state) == 40


class TestBucketedApplyTruncate:
    def test_truncate_fails_loudly(self, spark, tmp_path):
        """A TRUNCATE in the feed is unsupported on the touched-bucket
        path — it must raise, not silently drop and leave the replica
        diverged (and its NULL-key image must not inject a spurious
        bucket)."""
        from pg2any_spark.streaming.pipeline import apply_batch_to_bucketed_parquet

        target = str(tmp_path / "rep")
        good = spark.createDataFrame(
            [ev("c", 1, t1a(1, 10))], CHANGE_EVENT_SCHEMA
        )
        apply_batch_to_bucketed_parquet(
            spark, good, target, T1_SCHEMA, ["id"], n_buckets=4
        )
        bad = spark.createDataFrame(
            [ev("u", 2, t1a(1, 11), {"id": "1"}), ev("t", 3)],
            CHANGE_EVENT_SCHEMA,
        )
        with pytest.raises(ValueError, match="TRUNCATE"):
            apply_batch_to_bucketed_parquet(
                spark, bad, target, T1_SCHEMA, ["id"], n_buckets=4
            )
        # replica untouched by the failed batch
        from pg2any_spark.streaming.pipeline import read_bucketed_replica

        state = {
            r["id"]: r["val"]
            for r in read_bucketed_replica(spark, target).collect()
        }
        assert state == {1: 10}


class TestBucketedToastMerge:
    def test_sentinel_resolves_from_touched_bucket_slice(self, spark, tmp_path):
        """toast_merge through the bucketed applier: the stored rows
        the sentinel fallback needs are exactly the touched-bucket
        slice the pruned base read loads."""
        from pg2any_spark.schemas import UNCHANGED_TOAST
        from pg2any_spark.streaming.pipeline import (
            apply_batch_to_bucketed_parquet,
            read_bucketed_replica,
        )

        target = str(tmp_path / "rep")
        seed = spark.createDataFrame(
            [ev("c", i, t1a(i, i * 10)) for i in range(1, 9)],
            CHANGE_EVENT_SCHEMA,
        )
        apply_batch_to_bucketed_parquet(
            spark, seed, target, T1_SCHEMA, ["id"], n_buckets=4
        )
        upd = spark.createDataFrame(
            [ev("u", 100,
                {"id": "3", "val": "999", "col1": UNCHANGED_TOAST,
                 "col2": "y2"},
                {"id": "3"})],
            CHANGE_EVENT_SCHEMA,
        )
        apply_batch_to_bucketed_parquet(
            spark, upd, target, T1_SCHEMA, ["id"], n_buckets=4,
            toast_merge=True,
        )
        state = {
            r["id"]: (r["val"], r["col1"], r["col2"])
            for r in read_bucketed_replica(spark, target).collect()
        }
        assert state[3] == (999, "u", "y2")  # col1 kept from stored row
        assert state[1] == (10, "u", "u")  # untouched bucket intact
        assert len(state) == 8


class TestBucketedApplyRestart:
    def test_restart_no_loss_no_dup(self, spark, tmp_path):
        """Kill-and-restart with the same checkpoint on the BUCKETED
        applier: the second incarnation processes only new files (no
        double-apply) and picks up files added while down (no loss) —
        the same exactly-once contract the full-rewrite applier proves
        in TestStreamingApply."""
        from pg2any_spark.streaming.pipeline import (
            read_bucketed_replica,
            start_bucketed_cdc_apply,
        )

        src = str(tmp_path / "events")
        target = str(tmp_path / "rep")
        ckpt = str(tmp_path / "ck")
        write_events(spark, src, [ev("c", i, t1a(i, i)) for i in range(1, 51)], "b1")
        q = start_bucketed_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt,
            n_buckets=8,
        )
        q.awaitTermination(120)
        assert read_bucketed_replica(spark, target).count() == 50

        # while "down": new inserts and some deletes arrive
        write_events(
            spark,
            src,
            [ev("c", 100 + i, t1a(50 + i, i)) for i in range(1, 11)]
            + [ev("d", 200 + i, before={"id": str(i)}) for i in range(1, 6)],
            "b2",
        )
        q2 = start_bucketed_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt,
            n_buckets=8,
        )
        q2.awaitTermination(120)
        state = {
            r["id"]: r["val"]
            for r in read_bucketed_replica(spark, target).collect()
        }
        # 50 original + 10 new - 5 deleted; a replay of b1 would
        # resurrect the deleted ids
        assert len(state) == 55
        assert all(i not in state for i in range(1, 6))
        assert state[51] == 1


class TestBucketedApplyCanonicalKeys:
    def test_non_canonical_wire_key_image(self, spark, tmp_path):
        """A wire image '042' must prune/write the SAME bucket as the
        typed key 42 — otherwise dynamic overwrite replaces an unpruned
        bucket and silently deletes its pre-existing rows."""
        from pg2any_spark.streaming.pipeline import (
            read_bucketed_replica,
            start_bucketed_cdc_apply,
        )

        src = str(tmp_path / "events")
        target = str(tmp_path / "rep")
        ckpt = str(tmp_path / "ck")
        write_events(spark, src, [ev("c", i, t1a(i, i)) for i in range(1, 51)], "b1")
        q = start_bucketed_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt,
            n_buckets=4,
        )
        q.awaitTermination(120)
        # update key 42 with a ZERO-PADDED wire rendering
        write_events(
            spark, src,
            [ev("u", 999, {"id": "042", "val": "4242", "col1": "u", "col2": "u"},
                {"id": "042"})],
            "b2",
        )
        q2 = start_bucketed_cdc_apply(
            read_event_stream(spark, src), target, T1_SCHEMA, ["id"], ckpt,
            n_buckets=4,
        )
        q2.awaitTermination(120)
        state = {
            r["id"]: r["val"]
            for r in read_bucketed_replica(spark, target).collect()
        }
        assert state[42] == 4242
        assert len(state) == 50  # nothing lost from any bucket


class TestStreamingDedupIndex:
    """Continuous near-dup detection: each micro-batch probes the
    accumulated LSH band index, emits matches, then appends its own
    bands — all under per-batch partitions so replays are idempotent."""

    D1 = [(1, "the quick brown fox jumps over the lazy dog"),
          (2, "completely different text about spark engines here")]
    D2 = [(10, "the quick brown fox jumps over the lazy dog"),
          (11, "yet another unrelated document about nothing at all")]
    D3 = [(20, "completely different text about spark engines here"),
          (21, "completely different text about spark engines here")]

    def _docs(self, spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(id=i, text=t) for i, t in rows], "id long, text string"
        )

    def _matches(self, spark, path):
        import os

        if not os.path.exists(path):
            return set()
        return {
            (r["incoming_id"], r["corpus_id"])
            for r in spark.read.parquet(path).collect()
        }

    def test_batches_accumulate_and_flag(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import dedup_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        dedup_index_apply_batch(spark, self._docs(spark, self.D1), 0, idx, m)
        assert self._matches(spark, m) == set()
        dedup_index_apply_batch(spark, self._docs(spark, self.D2), 1, idx, m)
        assert self._matches(spark, m) == {(10, 1)}
        # batch 3: one doc duplicates the INDEX (doc 2), and its two
        # docs duplicate EACH OTHER (within-batch pair)
        dedup_index_apply_batch(spark, self._docs(spark, self.D3), 2, idx, m)
        assert self._matches(spark, m) == {(10, 1), (20, 2), (21, 2), (21, 20)}

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        """Crash-replay (write done, checkpoint not committed) re-runs
        the same batch id: the probe excludes the batch's own bands and
        the partition overwrite rewrites identical rows — no duplicate
        matches, no index growth."""
        from pg2any_spark.streaming.pipeline import dedup_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        dedup_index_apply_batch(spark, self._docs(spark, self.D1), 0, idx, m)
        dedup_index_apply_batch(spark, self._docs(spark, self.D2), 1, idx, m)
        before_rows = spark.read.parquet(idx).count()
        want = self._matches(spark, m)
        dedup_index_apply_batch(spark, self._docs(spark, self.D2), 1, idx, m)
        assert self._matches(spark, m) == want
        assert spark.read.parquet(idx).count() == before_rows

    def test_streaming_end_to_end_with_restart(self, spark, tmp_path):
        import time

        from pg2any_spark.streaming.pipeline import start_streaming_dedup_index

        src = tmp_path / "incoming"
        src.mkdir()
        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        ckpt = str(tmp_path / "ckpt")

        def land(rows, name):
            self._docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / ("stage_" + name))
            )
            import shutil

            staged = next(
                (tmp_path / ("stage_" + name)).glob("*.parquet")
            )
            shutil.copy(staged, src / (name + ".parquet"))

        stream = (
            spark.readStream.schema("id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        land(self.D1, "b1")
        time.sleep(0.05)
        land(self.D2, "b2")
        q = start_streaming_dedup_index(stream, idx, m, ckpt)
        q.awaitTermination(120)
        assert self._matches(spark, m) == {(10, 1)}
        # restart the query on the same checkpoint with a new file:
        # only the new batch processes, accumulated state persists
        land(self.D3, "b3")
        q2 = start_streaming_dedup_index(stream, idx, m, ckpt)
        q2.awaitTermination(120)
        assert self._matches(spark, m) == {(10, 1), (20, 2), (21, 2), (21, 20)}

    def test_first_batch_without_within_batch_matching(self, spark, tmp_path):
        """within_batch=False on a fresh index must still index the
        batch (regression: first batch crashed on the empty probe)."""
        from pg2any_spark.streaming.pipeline import dedup_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        dedup_index_apply_batch(
            spark, self._docs(spark, self.D3), 0, idx, m, within_batch=False
        )
        # D3's two identical docs are NOT reported (within-batch off)...
        assert self._matches(spark, m) == set()
        # ...but the batch was indexed: a later duplicate still matches
        dedup_index_apply_batch(
            spark,
            self._docs(
                spark,
                [(30, "completely different text about spark engines here")],
            ),
            1, idx, m, within_batch=False,
        )
        assert self._matches(spark, m) == {(30, 20), (30, 21)}

    def test_redelivered_id_is_not_its_own_duplicate(self, spark, tmp_path):
        """An at-least-once source redelivering an already-indexed id
        must not report (id, id) as a near-dup pair."""
        from pg2any_spark.streaming.pipeline import dedup_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        dedup_index_apply_batch(spark, self._docs(spark, self.D1), 0, idx, m)
        dedup_index_apply_batch(spark, self._docs(spark, self.D1), 1, idx, m)
        assert self._matches(spark, m) == set()


class TestStreamingEmbeddingDedup:
    """Semantic twin of TestStreamingDedupIndex: SRP-bucket candidate
    join + exact cosine threshold against the accumulated vector
    index, per-batch partitions for replay idempotence."""

    V1 = [1.0, 0.0, 0.0, 0.0]
    V2 = [0.0, 1.0, 0.0, 0.0]
    KW = dict(dim=4, num_planes=4, threshold=0.95)

    def _vecs(self, spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(vec_id=i, embedding=v) for i, v in rows],
            "vec_id long, embedding array<double>",
        )

    def _matches(self, spark, path):
        import os

        if not os.path.exists(path):
            return set()
        return {
            (r["incoming_id"], r["corpus_id"])
            for r in spark.read.parquet(path).collect()
        }

    def test_batches_accumulate_and_flag(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import embedding_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        near_v1 = [0.99, 0.01, 0.0, 0.0]
        near_v2 = [0.01, 0.99, 0.0, 0.0]
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(1, self.V1), (2, self.V2)]), 0, idx, m,
            **self.KW,
        )
        assert self._matches(spark, m) == set()
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(10, near_v1)]), 1, idx, m, **self.KW
        )
        assert self._matches(spark, m) == {(10, 1)}
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(20, near_v2), (21, self.V2)]), 2, idx,
            m, **self.KW,
        )
        assert self._matches(spark, m) == {(10, 1), (20, 2), (21, 2), (21, 20)}

    def test_replay_and_redelivery_idempotent(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import embedding_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        b0 = self._vecs(spark, [(1, self.V1), (2, self.V2)])
        embedding_index_apply_batch(spark, b0, 0, idx, m, **self.KW)
        # crash-replay of batch 0: identical partition, no self-matches
        embedding_index_apply_batch(spark, b0, 0, idx, m, **self.KW)
        assert self._matches(spark, m) == set()
        # at-least-once REDELIVERY as a new batch: ids equal -> no
        # (1,1)/(2,2) pairs reported
        embedding_index_apply_batch(spark, b0, 1, idx, m, **self.KW)
        assert self._matches(spark, m) == set()
        assert spark.read.parquet(idx).count() == 4  # 2 ids x 2 batches

    def test_streaming_end_to_end(self, spark, tmp_path):
        import shutil
        import time

        from pg2any_spark.streaming.pipeline import (
            start_streaming_embedding_dedup,
        )

        src = tmp_path / "incoming"
        src.mkdir()
        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")

        def land(rows, name):
            self._vecs(spark, rows).coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / ("stage_" + name))
            )
            staged = next((tmp_path / ("stage_" + name)).glob("*.parquet"))
            shutil.copy(staged, src / (name + ".parquet"))

        land([(1, self.V1), (2, self.V2)], "b1")
        time.sleep(0.05)
        land([(10, [0.99, 0.01, 0.0, 0.0])], "b2")
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_embedding_dedup(
            stream, idx, m, str(tmp_path / "ckpt"), **self.KW
        )
        q.awaitTermination(120)
        assert self._matches(spark, m) == {(10, 1)}

    def test_compaction_preserves_probe_semantics(self, spark, tmp_path):
        """Folding per-batch partitions into the ingest_batch=-1 base
        keeps rows and keeps the probe finding pre-compaction docs."""
        import os

        from pg2any_spark.streaming.pipeline import (
            compact_ingest_index,
            embedding_index_apply_batch,
        )

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(1, self.V1)]), 0, idx, m, **self.KW
        )
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(2, self.V2)]), 1, idx, m, **self.KW
        )
        before = spark.read.parquet(idx).count()
        # high-water from the (stopped) stream's checkpoint: both committed
        n = compact_ingest_index(spark, idx, committed_high_water=1)
        assert n == before
        parts = {d for d in os.listdir(idx) if d.startswith("ingest_batch=")}
        assert parts == {"ingest_batch=-1"}
        # a post-compaction batch still matches a pre-compaction doc
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(10, [0.99, 0.01, 0.0, 0.0])]), 2, idx,
            m, **self.KW,
        )
        assert self._matches(spark, m) == {(10, 1)}

    def test_applier_recovers_interrupted_compaction(self, spark, tmp_path):
        """A SIGKILL between compaction's two renames leaves the index
        parked in .old-*; the next batch must roll it back, not
        silently recreate an empty index (which would skip the probe
        and let the following compaction delete the parked state)."""
        import os

        from pg2any_spark.streaming.pipeline import embedding_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(1, self.V1)]), 0, idx, m, **self.KW
        )
        os.rename(idx, idx + ".old-deadbeef")  # crash mid-swap
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(10, [0.99, 0.01, 0.0, 0.0])]), 1, idx,
            m, **self.KW,
        )
        assert self._matches(spark, m) == {(10, 1)}

    def test_compaction_default_spares_newest_batch(self, spark, tmp_path):
        """Without a committed high-water mark, the newest batch may
        not have committed its checkpoint yet — the default fold must
        leave its partition in place so a replay stays idempotent."""
        import os

        from pg2any_spark.streaming.pipeline import (
            compact_ingest_index,
            embedding_index_apply_batch,
        )

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(1, self.V1)]), 0, idx, m, **self.KW
        )
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(2, self.V2)]), 1, idx, m, **self.KW
        )
        compact_ingest_index(spark, idx)
        parts = {d for d in os.listdir(idx) if d.startswith("ingest_batch=")}
        assert parts == {"ingest_batch=-1", "ingest_batch=1"}

    def test_replay_after_compaction_rewrites_identical_matches(
        self, spark, tmp_path
    ):
        """The round-4 hazard: crash after batch N's partitions landed
        but before its checkpoint committed, maintenance compaction
        runs, batch N replays. If N's band rows had been folded into
        the base, the replay's cross-probe would see them and emit
        both orientations of N's within-batch pairs. The conservative
        default spares N, so the replay must rewrite IDENTICAL rows."""
        from pg2any_spark.streaming.pipeline import (
            compact_ingest_index,
            embedding_index_apply_batch,
        )

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        embedding_index_apply_batch(
            spark, self._vecs(spark, [(1, self.V1)]), 0, idx, m, **self.KW
        )
        # batch 1 carries a within-batch near-dup pair (20, 21)
        b1 = self._vecs(
            spark, [(20, [0.0, 0.99, 0.01, 0.0]), (21, [0.0, 0.99, 0.0, 0.01])]
        )
        embedding_index_apply_batch(spark, b1, 1, idx, m, **self.KW)
        before = self._matches(spark, m)
        assert (21, 20) in before
        compact_ingest_index(spark, idx)  # maintenance before the replay
        embedding_index_apply_batch(spark, b1, 1, idx, m, **self.KW)  # replay
        assert self._matches(spark, m) == before


class TestProbePruning:
    """The streaming dedup indexes' probe scan must read only the
    directories matching the batch's own keys (band prefixes / SRP
    buckets) — O(batch) probe I/O, audited on the files actually read
    through the SAME pruned_index_read the appliers call."""

    def _read_files(self, df):
        from pyspark.sql import functions as F

        return {
            r["f"]
            for r in df.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
        }

    def test_lexical_probe_reads_only_matching_band_prefixes(
        self, spark, tmp_path
    ):
        from pyspark.sql import Row

        from pg2any_spark.streaming.pipeline import (
            dedup_index_apply_batch,
            pruned_index_read,
        )

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        docs = spark.createDataFrame(
            [Row(id=i, text=f"document number {i} about subject {i} entirely")
             for i in range(12)],
            "id long, text string",
        )
        dedup_index_apply_batch(spark, docs, 0, idx, m)
        all_pfx = {
            r[0]
            for r in spark.read.parquet(idx).select("band_pfx")
            .distinct().collect()
        }
        assert len(all_pfx) > 1  # the audit needs something to prune
        keep = sorted(all_pfx)[:1]
        probe = pruned_index_read(spark, idx, 99, "band_pfx", keep)
        files = self._read_files(probe)
        assert files  # the kept prefix has data
        assert all(f"band_pfx={keep[0]}" in f for f in files)
        total = self._read_files(
            pruned_index_read(spark, idx, 99, "band_pfx", sorted(all_pfx))
        )
        assert len(files) < len(total)

    def test_embedding_probe_reads_only_matching_buckets(
        self, spark, tmp_path
    ):
        from pyspark.sql import Row

        from pg2any_spark.streaming.pipeline import (
            embedding_index_apply_batch,
            pruned_index_read,
        )

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        vecs = spark.createDataFrame(
            [Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
             Row(vec_id=2, embedding=[-1.0, 0.0, 0.0, 0.0]),
             Row(vec_id=3, embedding=[0.0, 1.0, 0.0, 0.0]),
             Row(vec_id=4, embedding=[0.0, 0.0, -1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        embedding_index_apply_batch(
            spark, vecs, 0, idx, m, dim=4, num_planes=4
        )
        buckets = {
            r[0]
            for r in spark.read.parquet(idx).select("bucket")
            .distinct().collect()
        }
        assert len(buckets) > 1
        keep = sorted(buckets)[:1]
        probe = pruned_index_read(spark, idx, 99, "bucket", keep)
        files = self._read_files(probe)
        assert files
        assert all(f"bucket={keep[0]}" in f for f in files)
        total = self._read_files(
            pruned_index_read(spark, idx, 99, "bucket", sorted(buckets))
        )
        assert len(files) < len(total)


class TestLegacyIndexCompat:
    """Indexes written before the probe-prune layout (flat
    ingest_batch=N partitions, no band_pfx level) must keep working
    after upgrade: probes derive/skip the prune column, writers match
    the existing layout (mixed depths break partition discovery), and
    compaction migrates the tree wholesale."""

    def _legacy_lexical_index(self, spark, idx, rows, batch_id):
        from pyspark.sql import Row, functions as F

        from pg2any_spark.operators.dedup import lsh_index

        df = spark.createDataFrame(
            [Row(id=i, text=t) for i, t in rows], "id long, text string"
        )
        bands = lsh_index(df, "id", "text").withColumn(
            "ingest_batch", F.lit(batch_id)
        )
        (bands.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch").parquet(idx))

    def test_probe_and_write_against_legacy_tree(self, spark, tmp_path):
        import os

        from pg2any_spark.streaming.pipeline import dedup_index_apply_batch

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        dup = "the quick brown fox jumps over the lazy dog"
        self._legacy_lexical_index(spark, idx, [(1, dup), (2, "other text entirely here")], 0)
        incoming = spark.createDataFrame([(10, dup)], "id long, text string")
        dedup_index_apply_batch(spark, incoming, 1, idx, m)
        got = {(r["incoming_id"], r["corpus_id"])
               for r in spark.read.parquet(m).collect()}
        assert (10, 1) in got
        # the new batch's partition stayed FLAT (no mixed depths)
        b1 = os.path.join(idx, "ingest_batch=1")
        assert os.path.isdir(b1)
        assert not any("=" in e for e in os.listdir(b1))
        # and the whole tree still reads
        assert spark.read.parquet(idx).count() > 0

    def test_compaction_migrates_legacy_tree(self, spark, tmp_path):
        import os

        from pg2any_spark.streaming.pipeline import (
            compact_ingest_index,
            dedup_index_apply_batch,
        )

        idx = str(tmp_path / "index")
        m = str(tmp_path / "matches")
        dup = "the quick brown fox jumps over the lazy dog"
        self._legacy_lexical_index(
            spark, idx, [(1, dup), (2, "another unrelated document")], 0
        )
        compact_ingest_index(spark, idx, committed_high_water=0)
        base = os.path.join(idx, "ingest_batch=-1")
        assert any(e.startswith("band_pfx=p") for e in os.listdir(base))
        # post-migration probe matches pre-migration content, pruned
        incoming = spark.createDataFrame([(10, dup)], "id long, text string")
        dedup_index_apply_batch(spark, incoming, 1, idx, m)
        got = {(r["incoming_id"], r["corpus_id"])
               for r in spark.read.parquet(m).collect()}
        assert (10, 1) in got


class TestStreamingCms:
    def _rows(self, spark, keys):
        return spark.createDataFrame([(k,) for k in keys], "key string")

    def test_streamed_sketch_equals_batch_sketch(self, spark, tmp_path):
        import time

        from pg2any_spark.operators.sketch import (
            cms_estimate,
            count_min_cells,
        )
        from pg2any_spark.streaming.pipeline import (
            read_cms_cells,
            start_streaming_cms,
        )

        src = tmp_path / "incoming"
        src.mkdir()
        cells_path = str(tmp_path / "cells")
        ckpt = str(tmp_path / "ckpt")
        chunks = [
            [f"k{i % 7}" for i in range(40)],
            [f"k{i % 5}" for i in range(30)],
            [f"k{i % 3}" for i in range(20)],
        ]
        for j, ch in enumerate(chunks):
            self._rows(spark, ch).coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / f"stage{j}")
            )
            import shutil

            staged = next((tmp_path / f"stage{j}").glob("*.parquet"))
            shutil.copy(staged, src / f"b{j}.parquet")
            time.sleep(0.05)

        stream = (
            spark.readStream.schema("key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_cms(stream, cells_path, ckpt, depth=3, width=64)
        q.awaitTermination(120)

        everything = self._rows(spark, sum(chunks, []))
        want = count_min_cells(everything, "key", depth=3, width=64)
        got = read_cms_cells(spark, cells_path, width=64)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # and the merged sketch answers estimates exactly like the
        # one-shot build
        probes = self._rows(spark, [f"k{i}" for i in range(7)]).distinct()
        est_stream = cms_estimate(got, probes, "key", depth=3, width=64)
        est_batch = cms_estimate(want, probes, "key", depth=3, width=64)
        assert sorted(map(tuple, est_stream.collect())) == sorted(
            map(tuple, est_batch.collect())
        )

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        from pg2any_spark.streaming.pipeline import (
            cms_apply_batch,
            read_cms_cells,
        )

        cells_path = str(tmp_path / "cells")
        batch = self._rows(spark, ["a", "a", "b"])
        cms_apply_batch(spark, batch, 0, cells_path, depth=2, width=16)
        once = sorted(
            map(tuple, read_cms_cells(spark, cells_path, 16).collect())
        )
        # a foreachBatch replay after a crash re-delivers the same
        # batch id — the partition must be rewritten, not doubled
        cms_apply_batch(spark, batch, 0, cells_path, depth=2, width=16)
        twice = sorted(
            map(tuple, read_cms_cells(spark, cells_path, 16).collect())
        )
        assert once == twice


class TestStreamingBloom:
    def test_streamed_bloom_equals_batch_and_replays_idempotent(
        self, spark, tmp_path
    ):
        from pg2any_spark.operators.sketch import bloom_cells, bloom_probe
        from pg2any_spark.streaming.pipeline import (
            bloom_apply_batch,
            read_bloom_cells,
        )

        cells_path = str(tmp_path / "bloom")
        chunks = [
            [(f"k{i}",) for i in range(300)],
            [(f"k{i}",) for i in range(200, 500)],
        ]
        for i, ch in enumerate(chunks):
            df = spark.createDataFrame(ch, "key string")
            bloom_apply_batch(spark, df, i, cells_path, "key")
        got = read_bloom_cells(spark, cells_path)
        whole = spark.createDataFrame(chunks[0] + chunks[1], "key string")
        want = bloom_cells(whole, "key")
        assert sorted(r["pos"] for r in got.collect()) == sorted(
            r["pos"] for r in want.collect()
        )
        # every ingested key probes present off the streamed filter
        hits = {
            r["key"]: r["bloom_hit"]
            for r in bloom_probe(got, whole, "key").collect()
        }
        assert all(v == 1 for v in hits.values())
        # replay idempotence (snapshot-before contract, as hist/kmv)
        before = sorted(r["pos"] for r in got.collect())
        df0 = spark.createDataFrame(chunks[0], "key string")
        bloom_apply_batch(spark, df0, 0, cells_path, "key")
        after = sorted(
            r["pos"] for r in read_bloom_cells(spark, cells_path).collect()
        )
        assert before == after

    def test_streaming_bloom_end_to_end(self, spark, tmp_path):
        import glob

        from pg2any_spark.operators.sketch import bloom_probe
        from pg2any_spark.streaming.pipeline import (
            read_bloom_cells,
            start_streaming_bloom,
        )

        src = str(tmp_path / "src")
        keys = [(f"k{i}",) for i in range(200)]
        spark.createDataFrame(keys, "key string").write.parquet(src)
        stream = spark.readStream.schema("key string").parquet(src)
        q = start_streaming_bloom(
            stream, str(tmp_path / "cells"), str(tmp_path / "ckpt"),
            key_col="key",
        )
        q.awaitTermination()
        assert glob.glob(str(tmp_path / "cells") + "/*")
        got = read_bloom_cells(spark, str(tmp_path / "cells"))
        probe = spark.createDataFrame(keys, "key string")
        assert all(
            r["bloom_hit"] == 1
            for r in bloom_probe(got, probe, "key").collect()
        )


class TestStreamingHistAndKmv:
    def test_streamed_hist_equals_batch(self, spark, tmp_path):
        from pg2any_spark.operators.sketch import (
            histogram_cells,
            histogram_quantiles,
        )
        from pg2any_spark.streaming.pipeline import (
            hist_apply_batch,
            read_hist_cells,
        )

        cells_path = str(tmp_path / "hist")
        chunks = [
            [float(v) for v in range(0, 60)],
            [float(v) for v in range(40, 100)],
        ]
        for i, ch in enumerate(chunks):
            df = spark.createDataFrame([(v,) for v in ch], "v double")
            hist_apply_batch(spark, df, i, cells_path, "v", 0.0, 100.0, 10)
        got = read_hist_cells(spark, cells_path)
        whole = spark.createDataFrame(
            [(v,) for v in chunks[0] + chunks[1]], "v double"
        )
        want = histogram_cells(whole, "v", 0.0, 100.0, 10)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # quantiles straight off the streamed cells
        q = histogram_quantiles(got, [0.5], 0.0, 100.0, 10).collect()
        assert abs(q[0]["est"] - 50.0) <= 10.0
        # replay idempotence: snapshot BEFORE the replay, compare the
        # post-replay state against it (re-collecting `got` after the
        # replay would compare the doubled state to itself)
        before = sorted(map(tuple, got.collect()))
        df0 = spark.createDataFrame([(v,) for v in chunks[0]], "v double")
        hist_apply_batch(spark, df0, 0, cells_path, "v", 0.0, 100.0, 10)
        after = sorted(
            map(tuple, read_hist_cells(spark, cells_path).collect())
        )
        assert before == after

    def test_streamed_kmv_equals_batch(self, spark, tmp_path):
        from pg2any_spark.operators.sketch import kmv_cells, kmv_distinct
        from pg2any_spark.streaming.pipeline import (
            kmv_apply_batch,
            read_kmv_cells,
        )

        cells_path = str(tmp_path / "kmv")
        chunks = [
            [("g", f"k{i}") for i in range(400)],
            [("g", f"k{i}") for i in range(300, 700)],
        ]
        for i, ch in enumerate(chunks):
            df = spark.createDataFrame(ch, "grp string, key string")
            kmv_apply_batch(spark, df, i, cells_path, "key", ["grp"], k=64)
        got = read_kmv_cells(spark, cells_path, ["grp"], k=64)
        whole = spark.createDataFrame(
            chunks[0] + chunks[1], "grp string, key string"
        )
        want = kmv_cells(whole, "key", ["grp"], k=64)
        assert sorted(map(tuple, got.select("grp", "h", "rk").collect())) == \
            sorted(map(tuple, want.select("grp", "h", "rk").collect()))
        est = kmv_distinct(got, ["grp"], k=64).collect()[0]["kmv_est"]
        assert abs(est - 700) / 700 < 0.5


class TestJoinView:
    """Incremental inner-join view maintenance: touched-key recompute
    under CDC to both base tables."""

    import datetime as _dt

    TS = _dt.datetime(2026, 1, 1)

    def _ev(self, op, table, lsn, before=None, after=None):
        return (op, "public", table, lsn, lsn, self.TS, before, after,
                ["id"], "default")

    def _apply(self, spark, tmp_path, batches):
        from pyspark.sql.types import (
            IntegerType, StringType, StructField, StructType,
        )

        from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA
        from pg2any_spark.streaming.pipeline import join_view_apply_batch

        left = StructType([
            StructField("oid", IntegerType()),
            StructField("cust", IntegerType()),
            StructField("amt", IntegerType()),
        ])
        right = StructType([
            StructField("cid", IntegerType()),
            StructField("seg", StringType()),
        ])
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
            join_view_apply_batch(
                spark, df,
                left_path=str(tmp_path / "orders"), left_schema=left,
                left_keys=["oid"], left_table="orders",
                right_path=str(tmp_path / "cust"), right_schema=right,
                right_keys=["cid"], right_table="cust",
                left_join_col="cust", right_join_col="cid",
                view_path=str(tmp_path / "view"),
            )
        return spark.read.parquet(str(tmp_path / "view"))

    def _b1(self):
        return [
            self._ev("c", "cust", 1, after={"cid": "1", "seg": "A"}),
            self._ev("c", "cust", 2, after={"cid": "2", "seg": "B"}),
            self._ev("c", "orders", 3,
                     after={"oid": "10", "cust": "1", "amt": "5"}),
            self._ev("c", "orders", 4,
                     after={"oid": "11", "cust": "2", "amt": "7"}),
        ]

    def test_delete_propagates_and_key_move_retargets(self, spark, tmp_path):
        b2 = [
            # delete customer 2 → order 11 must leave the view
            self._ev("d", "cust", 10, before={"cid": "2"}),
            # move order 10 to customer... nonexistent 3 → drops too
            self._ev("u", "orders", 11,
                     before={"oid": "10", "cust": "1"},
                     after={"oid": "10", "cust": "3", "amt": "5"}),
            # new customer 3 arrives in the SAME batch → pair completes
            self._ev("c", "cust", 12, after={"cid": "3", "seg": "C"}),
        ]
        view = self._apply(spark, tmp_path, [self._b1(), b2])
        got = {(r["oid"], r["cid"], r["seg"]) for r in view.collect()}
        assert got == {(10, 3, "C")}

    def test_replayed_batch_rewrites_identical_view(self, spark, tmp_path):
        from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA
        from pg2any_spark.streaming.pipeline import join_view_apply_batch
        from pyspark.sql.types import (
            IntegerType, StringType, StructField, StructType,
        )

        view = self._apply(spark, tmp_path, [self._b1()])
        before = sorted(map(tuple, view.collect()))
        # crash-replay: the same batch re-applies end to end
        view2 = self._apply(spark, tmp_path, [self._b1()])
        assert sorted(map(tuple, view2.collect())) == before

    def test_streamed_equals_batch_join(self, spark, tmp_path):
        b2 = [
            self._ev("u", "cust", 20,
                     before={"cid": "1"}, after={"cid": "1", "seg": "A2"}),
            self._ev("c", "orders", 21,
                     after={"oid": "12", "cust": "1", "amt": "9"}),
            self._ev("d", "orders", 22, before={"oid": "11"}),
        ]
        view = self._apply(spark, tmp_path, [self._b1(), b2])
        orders = spark.read.parquet(str(tmp_path / "orders"))
        cust = spark.read.parquet(str(tmp_path / "cust"))
        want = sorted(
            map(tuple, orders.join(
                cust, orders["cust"] == cust["cid"]
            ).select("oid", "cust", "amt", "cid", "seg").collect())
        )
        got = sorted(
            map(tuple,
                view.select("oid", "cust", "amt", "cid", "seg").collect())
        )
        assert got == want

    def test_touched_overflow_stages_to_parquet(
        self, spark, tmp_path, monkeypatch
    ):
        """Above TOUCHED_KEYS_COLLECT_MAX the touched set must stage to
        parquet (no driver collect, no broadcast hint) and produce the
        identical view; the stage dir must not outlive the batch."""
        from pg2any_spark.streaming import pipeline as P

        # collect path (default threshold) on a twin directory
        b2 = [
            self._ev("d", "cust", 10, before={"cid": "2"}),
            self._ev("u", "orders", 11,
                     before={"oid": "10", "cust": "1"},
                     after={"oid": "10", "cust": "3", "amt": "5"}),
            self._ev("c", "cust", 12, after={"cid": "3", "seg": "C"}),
        ]
        want_dir = tmp_path / "collectpath"
        want_dir.mkdir()
        want = sorted(
            map(tuple, self._apply(spark, want_dir, [self._b1(), b2])
                .select("oid", "cust", "amt", "cid", "seg").collect())
        )
        # overflow path: every batch exceeds a threshold of 1 key
        monkeypatch.setattr(P, "TOUCHED_KEYS_COLLECT_MAX", 1)
        view = self._apply(spark, tmp_path, [self._b1(), b2])
        got = sorted(
            map(tuple,
                view.select("oid", "cust", "amt", "cid", "seg").collect())
        )
        assert got == want
        stage = str(tmp_path / "view") + ".__touched_stage"
        import os as _os
        assert not _os.path.exists(stage), "stage dir leaked past the batch"
