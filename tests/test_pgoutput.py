"""pgoutput wire codec: golden bytes, transaction semantics, v2
streamed transactions, and the Spark segment-decode path."""

from __future__ import annotations

import datetime

import pytest

from pg2any_spark.sources import pgoutput as P

TS = datetime.datetime(2026, 1, 1)


def rel_frame(identity="default", key=("id",)):
    return P.encode_relation(
        7,
        "public",
        "t1",
        [(P.COL_KEY_FLAG if c in key else 0, c, 25, -1)
         for c in ("id", "val")],
        identity,
    )


class TestGoldenBytes:
    def test_begin_layout(self):
        b = P.encode_begin(0x0102, TS, 42)
        assert b[0:1] == b"B"
        assert b[1:9] == (0x0102).to_bytes(8, "big")
        assert int.from_bytes(b[9:17], "big", signed=True) == P.ts_to_pg_us(TS)
        assert b[17:21] == (42).to_bytes(4, "big")
        assert len(b) == 21

    def test_tuple_layout(self):
        t = P.encode_tuple(["ab", None])
        # ncols=2, 't' + len 2 + 'ab', 'n'
        assert t == b"\x00\x02t\x00\x00\x00\x02abn"

    def test_relation_roundtrip_key_flags(self):
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        rel = dec.relations[7]
        assert rel.columns == ["id", "val"]
        assert rel.key_columns == ["id"]
        assert rel.identity == "default"

    def test_relation_resend_evolves_schema(self):
        # ALTER TABLE mid-stream: the server re-sends Relation with the
        # new column list before the next DML (§55.5); later tuples zip
        # against the NEW registration, earlier rows simply lack the
        # added key in their images
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin(10, TS, 1), 10)
        dec.feed(P.encode_insert(7, ["1", "a"]), 10)
        r1 = dec.feed(P.encode_commit(10, 10, TS), 10)
        rel2 = P.encode_relation(
            7, "public", "t1",
            [(P.COL_KEY_FLAG if c == "id" else 0, c, 25, -1)
             for c in ("id", "val", "extra")],
        )
        dec.feed(rel2, 11)
        dec.feed(P.encode_begin(20, TS, 2), 20)
        dec.feed(P.encode_insert(7, ["2", "b", "x"]), 20)
        r2 = dec.feed(P.encode_commit(20, 20, TS), 20)
        assert r1[0]["after"] == {"id": "1", "val": "a"}
        assert "extra" not in r1[0]["after"]
        assert r2[0]["after"] == {"id": "2", "val": "b", "extra": "x"}
        # key redefinition travels too (REPLICA IDENTITY change)
        rel3 = P.encode_relation(
            7, "public", "t1",
            [(P.COL_KEY_FLAG, c, 25, -1) for c in ("id", "val")],
            "index",
        )
        dec.feed(rel3, 21)
        dec.feed(P.encode_begin(30, TS, 3), 30)
        dec.feed(P.encode_insert(7, ["3", "c"]), 30)
        r3 = dec.feed(P.encode_commit(30, 30, TS), 30)
        assert r3[0]["key_columns"] == ["id", "val"]
        assert r3[0]["replica_identity"] == "index"


class TestTransactionSemantics:
    def _decode(self, frames):
        dec = P.PgOutputDecoder()
        out = []
        for lsn, f in frames:
            out.extend(dec.feed(f, lsn))
        return out

    def test_events_release_on_commit_with_commit_ts(self):
        rows = self._decode([
            (0, rel_frame()),
            (10, P.encode_begin(12, TS, 99)),
            (11, P.encode_insert(7, ["1", "a"])),
            (12, P.encode_commit(12, 12, TS)),
        ])
        assert len(rows) == 1
        r = rows[0]
        assert r["op"] == "c" and r["txid"] == 99 and r["lsn"] == 11
        assert r["after"] == {"id": "1", "val": "a"} and r["before"] is None
        assert r["commit_ts"] == TS
        assert r["key_columns"] == ["id"]

    def test_nothing_emitted_before_commit(self):
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin(5, TS, 1), 1)
        assert dec.feed(P.encode_insert(7, ["1", "x"]), 2) == []

    def test_update_delete_truncate_shapes(self):
        rows = self._decode([
            (0, rel_frame()),
            (1, P.encode_begin(9, TS, 5)),
            (2, P.encode_update(7, ["1", "b"], ["1", None], "K")),
            (3, P.encode_delete(7, ["2", None], "K")),
            (4, P.encode_truncate([7])),
            (5, P.encode_commit(9, 9, TS)),
        ])
        ops = [r["op"] for r in rows]
        assert ops == ["u", "d", "t"]
        assert rows[0]["before"] == {"id": "1", "val": None}
        assert rows[0]["after"] == {"id": "1", "val": "b"}
        assert rows[1]["before"] == {"id": "2", "val": None}
        assert rows[2]["before"] is None and rows[2]["after"] is None

    def test_unknown_relation_raises(self):
        dec = P.PgOutputDecoder()
        dec.feed(P.encode_begin(1, TS, 1), 0)
        with pytest.raises(ValueError, match="unknown relation"):
            dec.feed(P.encode_insert(99, ["1", "a"]), 1)

    def test_unknown_message_type_raises(self):
        with pytest.raises(ValueError, match="unknown pgoutput"):
            P.PgOutputDecoder().feed(b"Zjunk", 0)


class TestProtocolV2Streaming:
    def test_streamed_tx_commits_and_aborts(self):
        dec = P.PgOutputDecoder(protocol_version=2)
        dec.feed(rel_frame(), 0)
        # streamed xid=50 commits; streamed xid=60 aborts
        dec.feed(P.encode_stream_start(50, True), 1)
        assert dec.feed(P.encode_insert(7, ["1", "a"], stream_xid=50), 2) == []
        dec.feed(P.encode_stream_stop(), 3)
        dec.feed(P.encode_stream_start(60, True), 4)
        dec.feed(P.encode_insert(7, ["2", "b"], stream_xid=60), 5)
        dec.feed(P.encode_stream_stop(), 6)
        assert dec.feed(P.encode_stream_abort(60, 60), 7) == []
        rows = dec.feed(P.encode_stream_commit(50, 8, 8, TS), 8)
        assert [(r["txid"], r["after"]["id"]) for r in rows] == [(50, "1")]
        assert 60 not in dec.tx  # aborted buffer discarded


class TestSparkDecode:
    def test_segment_decode_matches_direct_apply(self, spark, sf_dir):
        """Wire round trip: synth events → frames → decode → apply
        must equal the non-wire apply (same final replica)."""
        from pyspark.sql import functions as F

        from pg2any_spark.operators.apply import apply_changes
        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.fixtures import load_table

        cust = load_table(spark, "customer", sf_dir)
        direct = apply_changes(
            synth_customer_events(spark, sf_dir), cust.schema,
            ["c_custkey"], table="customer", scan_for_truncate=False,
        )
        via_wire = apply_changes(
            P.decode_wal_segments(
                P.synth_customer_wal_frames(spark, sf_dir)
            ),
            cust.schema, ["c_custkey"], table="customer",
            scan_for_truncate=False,
        )
        assert via_wire.exceptAll(direct).isEmpty()
        assert direct.exceptAll(via_wire).isEmpty()

    def test_decoded_envelope_fields(self, spark, sf_dir):
        events = P.decode_wal_segments(
            P.synth_customer_wal_frames(spark, sf_dir)
        )
        row = events.filter("op = 'u'").limit(1).collect()[0]
        assert row["table"] == "customer" and row["schema"] == "public"
        assert row["replica_identity"] == "default"
        assert row["key_columns"] == ["c_custkey"]
        assert row["txid"] == 2000
        assert row["before"]["c_custkey"] is not None


class TestStreamingWireApply:
    def test_frames_stream_to_replica(self, spark, tmp_path):
        """Wire → streaming decode → replica end-to-end: frames land
        one file per segment, the checkpointed stream drains, and the
        replica equals the direct (non-wire, non-streaming) apply."""
        from pg2any_spark.operators.apply import apply_changes
        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.fixtures import load_table
        from pg2any_spark.streaming.pipeline import start_pgoutput_apply

        sf_dir = "/root/testdata/sf0.001"
        frames_dir = str(tmp_path / "frames")
        target = str(tmp_path / "replica")
        ckpt = str(tmp_path / "ckpt")
        # one file per segment: repartition by segment_id before write
        frames = P.synth_customer_wal_frames(spark, sf_dir, n_segments=4)
        frames.repartition(4, "segment_id").write.parquet(frames_dir)

        cust = load_table(spark, "customer", sf_dir)
        q = start_pgoutput_apply(
            spark, frames_dir, target, cust.schema, ["c_custkey"],
            ckpt, table="customer",
        )
        q.awaitTermination(180)

        got = spark.read.parquet(target)
        want = apply_changes(
            synth_customer_events(spark, sf_dir), cust.schema,
            ["c_custkey"], table="customer", scan_for_truncate=False,
        )
        assert got.exceptAll(want).isEmpty()
        assert want.exceptAll(got).isEmpty()


class TestStreamedTxWire:
    def test_wire_equals_envelope_reassembly(self, spark):
        """The v2 wire path and the envelope-level reassembly operator
        must produce the same final replica for the interleaved
        3-transaction scenario (abort leaves no trace)."""
        from pg2any_spark.operators.apply import apply_changes
        from pg2any_spark.sources.cdc_gen import synth_streaming_tx_events
        from pg2any_spark.sources.fixtures import load_table
        from pg2any_spark.streaming.reassembly import reassemble_committed

        sf_dir = "/root/testdata/sf0.001"
        cust = load_table(spark, "customer", sf_dir)
        envelope = apply_changes(
            reassemble_committed(synth_streaming_tx_events(spark, sf_dir)),
            cust.schema, ["c_custkey"], table="customer",
            order_cols=["commit_lsn", "lsn"], scan_for_truncate=False,
        )
        wire = apply_changes(
            P.decode_wal_segments(
                P.synth_streaming_tx_wal_frames(spark, sf_dir),
                protocol_version=2,
            ),
            cust.schema, ["c_custkey"], table="customer",
            scan_for_truncate=False,
        )
        assert wire.exceptAll(envelope).isEmpty()
        assert envelope.exceptAll(wire).isEmpty()

    def test_aborted_update_leaves_no_trace(self, spark):
        events = P.decode_wal_segments(
            P.synth_streaming_tx_wal_frames(spark, "/root/testdata/sf0.001"),
            protocol_version=2,
        )
        assert events.filter("txid = 200").count() == 0
        assert events.filter("txid = 100").count() > 0


class TestChunkedDecode:
    """Constant-memory decode (decode_wal_frames_raw + stamp_commits)
    must be envelope-identical to the whole-segment batch decode —
    same rows, same commit stamps, same abort semantics — while never
    holding a transaction in the worker (the scenario-5 memory
    model)."""

    @staticmethod
    def _canon(df):
        from pyspark.sql import functions as F

        # maps can't ride exceptAll: serialize them
        return df.select(
            "op", "schema", "table", "txid", "lsn",
            F.unix_micros("commit_ts").alias("cts"),
            F.to_json("before").alias("b"),
            F.to_json("after").alias("a"),
            F.to_json("key_columns").alias("kc"),
            "replica_identity",
        )

    def _assert_equivalent(
        self, frames, protocol_version=1, chunk_rows=17, toast_merge=False
    ):
        batch = self._canon(
            P.decode_wal_segments(frames, protocol_version, toast_merge)
        )
        chunked = self._canon(
            P.stamp_commits(
                P.decode_wal_frames_raw(
                    frames, protocol_version, chunk_rows=chunk_rows,
                    toast_merge=toast_merge,
                )
            )
        )
        assert chunked.exceptAll(batch).isEmpty()
        assert batch.exceptAll(chunked).isEmpty()

    def test_matches_batch_decode_customer(self, spark, sf_dir):
        # chunk_rows=17 forces many chunk-boundary crossings
        self._assert_equivalent(
            P.synth_customer_wal_frames(spark, sf_dir)
        )

    def test_matches_batch_decode_streamed_v2(self, spark):
        # interleaved streamed transactions incl. an abort: the missing
        # commit marker must drop tx 200's rows in the join exactly as
        # the buffering decoder discards them
        self._assert_equivalent(
            P.synth_streaming_tx_wal_frames(spark, "/root/testdata/sf0.001"),
            protocol_version=2,
        )

    def test_matches_batch_decode_toast(self, spark):
        self._assert_equivalent(
            P.synth_customer_toast_wal_frames(spark, "/root/testdata/sf0.001"),
            toast_merge=True,
        )

    def test_open_transaction_raises(self, spark):
        import datetime

        ts = datetime.datetime(2026, 1, 1)
        frames = [
            (0, 0, 0, bytearray(rel_frame())),
            (0, 1, 1, bytearray(P.encode_begin(9, ts, 42))),
            (0, 2, 1, bytearray(P.encode_insert(7, ["1", "x"]))),
        ]
        df = spark.createDataFrame(frames, P.WAL_FRAME_SCHEMA)
        with pytest.raises(Exception, match="still open"):
            P.decode_wal_frames_raw(df).collect()


class TestOuterFraming:
    """XLogData/keepalive envelopes + standby feedback (protocol
    §55.4; reference producer.rs:129-132 dispatch, client.rs:222-237
    feedback LSN)."""

    TS = __import__("datetime").datetime(2026, 1, 1, 12, 30, 45, 123456)

    def test_xlog_data_golden_layout(self):
        env = P.encode_xlog_data(0x0A0B, 0x0A0C, self.TS, b"PAYLOAD")
        assert env[0:1] == b"w"
        assert int.from_bytes(env[1:9], "big") == 0x0A0B
        assert int.from_bytes(env[9:17], "big") == 0x0A0C
        assert env[25:] == b"PAYLOAD"
        msg = P.decode_replication_message(env)
        assert msg["kind"] == "xlog" and msg["wal_start"] == 0x0A0B
        assert msg["payload"] == b"PAYLOAD"
        assert msg["send_ts_us"] == P.ts_to_pg_us(self.TS)

    def test_keepalive_golden_layout(self):
        env = P.encode_keepalive(0xFF, self.TS, reply_requested=True)
        assert env[0:1] == b"k" and len(env) == 18
        msg = P.decode_replication_message(env)
        assert msg["kind"] == "keepalive" and msg["wal_end"] == 0xFF
        assert msg["reply_requested"] is True

    def test_standby_status_roundtrip(self):
        frame = P.encode_standby_status(
            P.feedback_lsn(100), P.feedback_lsn(100), P.feedback_lsn(90),
            self.TS,
        )
        assert frame[0:1] == b"r" and len(frame) == 34
        st = P.decode_standby_status(frame)
        assert st["written_lsn"] == 101
        assert st["flushed_lsn"] == 101
        assert st["applied_lsn"] == 91
        assert st["reply_requested"] is False

    def test_unknown_envelope_raises(self):
        with pytest.raises(ValueError, match="unknown replication"):
            P.decode_replication_message(b"z123")

    def test_enveloped_stream_equals_bare(self, spark, sf_dir):
        """Wrapping every frame in XLogData and interleaving keepalives
        must be invisible after unwrap: identical decoded envelope."""
        import datetime

        import pandas as pd
        from pyspark.sql import Row, functions as F

        ts = datetime.datetime(2026, 1, 1)
        frames = P.synth_customer_wal_frames(spark, sf_dir)

        def wrap(it):
            for pdf in it:
                yield pd.DataFrame({
                    "segment_id": pdf["segment_id"],
                    "seq": pdf["seq"],
                    "envelope": [
                        P.encode_xlog_data(int(l), int(l), ts, bytes(fr))
                        for l, fr in zip(pdf["wal_lsn"], pdf["frame"])
                    ],
                })

        enveloped = frames.mapInPandas(wrap, P.XLOG_ENVELOPE_SCHEMA)
        keepalives = spark.createDataFrame(
            [Row(segment_id=s, seq=10**12 + s,
                 envelope=bytearray(P.encode_keepalive(999, ts)))
             for s in range(4)],
            P.XLOG_ENVELOPE_SCHEMA,
        )
        unwrapped = P.unwrap_xlog_frames(
            enveloped.unionByName(keepalives)
        )
        canon = lambda df: df.select(  # noqa: E731
            "op", "txid", "lsn", F.unix_micros("commit_ts").alias("cts"),
            F.to_json("after").alias("a"),
        )
        bare = canon(P.decode_wal_segments(frames))
        via_env = canon(P.decode_wal_segments(unwrapped))
        assert via_env.exceptAll(bare).isEmpty()
        assert bare.exceptAll(via_env).isEmpty()


def test_multi_table_segment_decode():
    """One segment carrying TWO relations: the registry dispatches each
    data frame to its own table's column layout."""
    import datetime

    t1 = P.encode_relation(
        1, "public", "alpha",
        [(P.COL_KEY_FLAG, "id", 25, -1), (0, "a", 25, -1)], "default",
    )
    t2 = P.encode_relation(
        2, "public", "beta",
        [(P.COL_KEY_FLAG, "k", 25, -1), (0, "b", 25, -1), (0, "c", 25, -1)],
        "default",
    )
    ts = datetime.datetime(2026, 1, 1)
    dec = P.PgOutputDecoder()
    out = []
    for lsn, f in [
        (0, t1), (1, t2),
        (2, P.encode_begin(9, ts, 7)),
        (3, P.encode_insert(1, ["1", "x"])),
        (4, P.encode_insert(2, ["9", "y", "z"])),
        (5, P.encode_commit(9, 9, ts)),
    ]:
        out.extend(dec.feed(f, lsn))
    by_table = {r["table"]: r for r in out}
    assert by_table["alpha"]["after"] == {"id": "1", "a": "x"}
    assert by_table["beta"]["after"] == {"k": "9", "b": "y", "c": "z"}
    assert by_table["beta"]["key_columns"] == ["k"]


class TestDecoderHardening:
    def test_unchanged_toast_decodes_to_sentinel_when_opted_in(self):
        # round 6: with toast_merge=True, 'u' decodes to the
        # UNCHANGED_TOAST sentinel that apply_changes(toast_merge=True)
        # resolves with merge-with-stored-row semantics. The encoder is
        # symmetric: sentinel value → kind 'u' on the wire.
        import datetime

        from pg2any_spark.schemas import UNCHANGED_TOAST

        ts = datetime.datetime(2026, 1, 1)
        dec = P.PgOutputDecoder(toast_merge=True)
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin(9, ts, 1), 1)
        frame = P.encode_update(7, ["1", UNCHANGED_TOAST])
        assert b"u" in frame  # kind byte on the wire
        dec.feed(frame, 2)
        rows = dec.feed(P.encode_commit(2, 2, ts), 2)
        assert len(rows) == 1
        assert rows[0]["after"] == {"id": "1", "val": UNCHANGED_TOAST}

    def test_unchanged_toast_raises_without_opt_in(self):
        # default pipelines cannot resolve the sentinel — a silent
        # decode would end as a NULL overwrite at apply, so the decoder
        # fails loudly unless the apply opted into toast_merge
        import datetime

        from pg2any_spark.schemas import UNCHANGED_TOAST

        ts = datetime.datetime(2026, 1, 1)
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin(9, ts, 1), 1)
        with pytest.raises(ValueError, match="toast_merge"):
            dec.feed(P.encode_update(7, ["1", UNCHANGED_TOAST]), 2)

    def test_binary_bytea_decodes_to_base64(self):
        # binary-mode ('b') tuple values: bytea columns (oid 17) carry
        # through as base64 text; any other oid fails loudly instead of
        # mis-casting a network-order binary encoding.
        import base64
        import datetime

        ts = datetime.datetime(2026, 1, 1)
        payload = b"\x00\x01\xff binary!"
        rel_bytea = P.encode_relation(
            7, "public", "t1",
            [(P.COL_KEY_FLAG, "id", 25, -1), (0, "val", P.OID_BYTEA, -1)],
            "default",
        )
        dec = P.PgOutputDecoder()
        dec.feed(rel_bytea, 0)
        dec.feed(P.encode_begin(9, ts, 1), 1)
        dec.feed(P.encode_insert(7, ["1", payload]), 2)
        rows = dec.feed(P.encode_commit(2, 2, ts), 2)
        expected = base64.b64encode(payload).decode("ascii")
        assert rows[0]["after"] == {"id": "1", "val": expected}

    def test_binary_non_bytea_raises(self):
        import datetime

        ts = datetime.datetime(2026, 1, 1)
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)  # val has oid 25 (text), not bytea
        dec.feed(P.encode_begin(9, ts, 1), 1)
        with pytest.raises(ValueError, match="binary-mode value"):
            dec.feed(P.encode_insert(7, ["1", b"\x00\x01"]), 2)

    def test_open_transaction_at_segment_end_raises(self, spark):
        # a Begin whose Commit never arrives must fail the segment
        # decode loudly (producer truncation), not emit a clean empty
        # result
        import datetime

        ts = datetime.datetime(2026, 1, 1)
        frames = [
            (0, 0, 0, bytearray(rel_frame())),
            (0, 1, 1, bytearray(P.encode_begin(9, ts, 42))),
            (0, 2, 1, bytearray(P.encode_insert(7, ["1", "x"]))),
        ]
        df = spark.createDataFrame(frames, P.WAL_FRAME_SCHEMA)
        with pytest.raises(Exception, match="still.*open|open.*still"):
            P.decode_wal_segments(df).collect()

    def test_truncated_tuple_raises(self):
        import datetime

        ts = datetime.datetime(2026, 1, 1)
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin(9, ts, 1), 1)
        full = P.encode_insert(7, ["1", "abcdefgh"])
        with pytest.raises(ValueError, match="truncated tuple"):
            dec.feed(full[:-3], 2)  # cut inside the final column

    def test_microsecond_timestamp_roundtrip(self):
        import datetime

        ts = datetime.datetime(2026, 3, 1, 12, 0, 0, 123456)
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin(9, ts, 1), 1)
        dec.feed(P.encode_insert(7, ["1", "x"]), 2)
        rows = dec.feed(P.encode_commit(9, 9, ts), 3)
        assert rows[0]["commit_ts"] == ts

    def test_subtransaction_commit_releases_children(self):
        import datetime

        ts = datetime.datetime(2026, 1, 1)
        dec = P.PgOutputDecoder(protocol_version=2)
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_stream_start(100, True), 1)
        # toplevel row + two subxact rows (101 commits with parent,
        # 102 aborts)
        dec.feed(P.encode_insert(7, ["1", "top"], stream_xid=100), 2)
        dec.feed(P.encode_insert(7, ["2", "sub-keep"], stream_xid=101), 3)
        dec.feed(P.encode_insert(7, ["3", "sub-drop"], stream_xid=102), 4)
        dec.feed(P.encode_stream_stop(), 5)
        # subtransaction 102 aborts: ONLY its row dies
        dec.feed(P.encode_stream_abort(100, 102), 6)
        rows = dec.feed(P.encode_stream_commit(100, 9, 9, ts), 7)
        got = {r["after"]["id"]: r["txid"] for r in rows}
        assert got == {"1": 100, "2": 100}  # child reports toplevel txid

    def test_whole_stream_abort_discards_children_too(self):
        import datetime

        ts = datetime.datetime(2026, 1, 1)
        dec = P.PgOutputDecoder(protocol_version=2)
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_stream_start(100, True), 1)
        dec.feed(P.encode_insert(7, ["1", "a"], stream_xid=100), 2)
        dec.feed(P.encode_insert(7, ["2", "b"], stream_xid=101), 3)
        dec.feed(P.encode_stream_stop(), 4)
        dec.feed(P.encode_stream_abort(100, 100), 5)
        assert dec.feed(P.encode_stream_commit(100, 9, 9, ts), 6) == []
        assert 101 not in dec.tx


def test_metadata_frames_are_consumed_not_fatal():
    """Origin / Type / Message frames carry no row changes; a real
    server interleaves them freely and the decoder must pass over
    them (raising would wedge the stream)."""
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    dec = P.PgOutputDecoder()
    dec.feed(rel_frame(), 0)
    assert dec.feed(b"O" + (0).to_bytes(8, "big") + b"origin\x00", 1) == []
    assert dec.feed(b"Y" + (99).to_bytes(4, "big") + b"public\x00t\x00", 2) == []
    dec.feed(P.encode_begin(9, ts, 1), 3)
    assert dec.feed(b"M" + b"\x00" + (9).to_bytes(8, "big")
                    + b"prefix\x00" + (2).to_bytes(4, "big") + b"hi", 4) == []
    dec.feed(P.encode_insert(7, ["1", "x"]), 5)
    rows = dec.feed(P.encode_commit(9, 9, ts), 6)
    assert len(rows) == 1  # the data flow around the metadata is intact


def test_wire_stream_restart_applies_new_segments_once(spark, tmp_path):
    """Checkpointed wire stream restart: a second run with the same
    checkpoint must apply only newly landed segments (no double-apply
    of the old ones, no loss of the new one)."""
    import datetime

    from pg2any_spark.streaming.pipeline import start_pgoutput_apply
    from pg2any_spark.sources.fixtures import load_table

    sf_dir = "/root/testdata/sf0.001"
    frames_dir = str(tmp_path / "frames")
    target = str(tmp_path / "replica")
    ckpt = str(tmp_path / "ckpt")
    P.synth_customer_wal_frames(spark, sf_dir, n_segments=4).repartition(
        4, "segment_id"
    ).write.parquet(frames_dir)

    cust = load_table(spark, "customer", sf_dir)
    q = start_pgoutput_apply(
        spark, frames_dir, target, cust.schema, ["c_custkey"], ckpt,
        table="customer",
    )
    q.awaitTermination(180)
    before = {
        r["c_custkey"]: r["c_acctbal"]
        for r in spark.read.parquet(target).collect()
    }
    some_key = min(before)

    # while "down": one more segment lands with a single +111 update
    ts = datetime.datetime(2026, 1, 2)
    cols = cust.columns
    row = cust.filter(f"c_custkey = {some_key}").collect()[0]
    new_vals = [
        str(row[c]) if c != "c_acctbal" else str(row["c_acctbal"] + 111.0)
        for c in cols
    ]
    old = [str(some_key) if c == "c_custkey" else None for c in cols]
    lsn = 90_000_000
    rel = P.encode_relation(
        1, "public", "customer",
        [(P.COL_KEY_FLAG if c == "c_custkey" else 0, c, 25, -1) for c in cols],
        "default",
    )
    seg = [
        (9, 0, 0, bytearray(rel)),
        (9, 1, lsn, bytearray(P.encode_begin(lsn, ts, 777))),
        (9, 2, lsn, bytearray(P.encode_update(1, new_vals, old, "K"))),
        (9, 3, lsn, bytearray(P.encode_commit(lsn, lsn, ts))),
    ]
    spark.createDataFrame(seg, P.WAL_FRAME_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(frames_dir)

    q2 = start_pgoutput_apply(
        spark, frames_dir, target, cust.schema, ["c_custkey"], ckpt,
        table="customer",
    )
    q2.awaitTermination(180)
    after = {
        r["c_custkey"]: r["c_acctbal"]
        for r in spark.read.parquet(target).collect()
    }
    assert after[some_key] == before[some_key] + 111.0
    assert len(after) == len(before)  # nothing double-applied or lost
    del after[some_key], before[some_key]
    assert after == before


class TestTwoPhase:
    """Two-phase commit frames (publication option two_phase):
    prepared transactions release only at Commit Prepared; Rollback
    Prepared discards without a trace; an unresolved prepare at
    segment end is truncation."""

    def test_prepared_tx_releases_on_commit_prepared(self):
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin_prepare(5, 5, TS, 77, "g1"), 1)
        assert dec.feed(P.encode_insert(7, ["1", "a"]), 2) == []
        # Prepare HOLDS — nothing may release yet
        assert dec.feed(P.encode_prepare(5, 5, TS, 77, "g1"), 3) == []
        assert dec.tx[77]  # buffer intact, held as prepared
        rows = dec.feed(P.encode_commit_prepared(6, 6, TS, 77, "g1"), 4)
        assert [(r["op"], r["txid"], r["commit_ts"]) for r in rows] == [
            ("c", 77, TS)
        ]
        assert 77 not in dec.prepared and 77 not in dec.tx

    def test_rollback_prepared_discards(self):
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin_prepare(5, 5, TS, 88, "g2"), 1)
        dec.feed(P.encode_insert(7, ["9", "z"]), 2)
        dec.feed(P.encode_prepare(5, 5, TS, 88, "g2"), 3)
        assert dec.feed(
            P.encode_rollback_prepared(5, 6, TS, TS, 88, "g2"), 4
        ) == []
        assert 88 not in dec.tx and 88 not in dec.prepared
        dec.check_closed("seg")  # nothing open

    def test_streamed_two_phase_releases_children(self):
        dec = P.PgOutputDecoder(protocol_version=2)
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_stream_start(50, True), 1)
        dec.feed(P.encode_insert(7, ["1", "a"], stream_xid=50), 2)
        dec.feed(P.encode_insert(7, ["2", "b"], stream_xid=51), 3)  # subxact
        dec.feed(P.encode_stream_stop(), 4)
        assert dec.feed(P.encode_stream_prepare(5, 5, TS, 50, "g3"), 5) == []
        rows = dec.feed(P.encode_commit_prepared(6, 6, TS, 50, "g3"), 6)
        assert [(r["txid"], r["after"]["id"]) for r in rows] == [
            (50, "1"), (50, "2")
        ]

    def test_commit_prepared_without_prepare_raises(self):
        dec = P.PgOutputDecoder()
        with pytest.raises(ValueError, match="unprepared"):
            dec.feed(P.encode_commit_prepared(6, 6, TS, 5, "gx"), 0)

    def test_unresolved_prepare_is_open_at_segment_end(self):
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin_prepare(5, 5, TS, 42, "g4"), 1)
        dec.feed(P.encode_insert(7, ["1", "x"]), 2)
        dec.feed(P.encode_prepare(5, 5, TS, 42, "g4"), 3)
        with pytest.raises(ValueError, match="still open"):
            dec.check_closed("seg")

    def test_chunked_decode_matches_batch(self, spark):
        # the full two-phase scenario (commits + rollbacks) through
        # the constant-memory wire path must equal the batch decode —
        # a rolled-back prepared instance's rows never join a marker
        TestChunkedDecode()._assert_equivalent(
            P.synth_customer_two_phase_wal_frames(
                spark, "/root/testdata/sf0.001"
            )
        )

    def test_begin_reusing_prepared_xid_raises(self):
        # PostgreSQL cannot reassign an xid while its prepared tx is
        # pending — a reuse means corruption, and merging onto the
        # held buffer would commit prepared rows under a stranger
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin_prepare(5, 5, TS, 7, "g"), 1)
        dec.feed(P.encode_insert(7, ["1", "a"]), 2)
        dec.feed(P.encode_prepare(5, 5, TS, 7, "g"), 3)
        with pytest.raises(ValueError, match="still PREPARED"):
            dec.feed(P.encode_begin(9, TS, 7), 4)

    def test_gid_mismatch_raises(self):
        dec = P.PgOutputDecoder()
        dec.feed(rel_frame(), 0)
        dec.feed(P.encode_begin_prepare(5, 5, TS, 7, "right"), 1)
        dec.feed(P.encode_prepare(5, 5, TS, 7, "right"), 2)
        with pytest.raises(ValueError, match="mis-paired"):
            dec.feed(P.encode_commit_prepared(6, 6, TS, 7, "wrong"), 3)

    def test_zero_row_unresolved_prepare_is_open(self):
        # even an EMPTY prepared tx left unresolved is truncation: the
        # missing resolution frame is information loss
        dec = P.PgOutputDecoder()
        dec.feed(P.encode_begin_prepare(5, 5, TS, 9, "g"), 0)
        dec.feed(P.encode_prepare(5, 5, TS, 9, "g"), 1)
        with pytest.raises(ValueError, match="still open"):
            dec.check_closed("seg")
