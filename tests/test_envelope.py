"""Debezium envelope projection parity (reference ``kafka.rs:215-344``)."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import Row

from pg2any_spark.functions.envelope import to_debezium
from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA

TS = datetime.datetime(2026, 1, 1, 12, 0, 0)


def make_event(spark, op="c", before=None, after=None):
    return spark.createDataFrame(
        [
            Row(
                op=op,
                schema="public",
                table="t1",
                txid=42,
                lsn=1234,
                commit_ts=TS,
                before=before,
                after=after,
                key_columns=["id"],
                replica_identity="default",
            )
        ],
        CHANGE_EVENT_SCHEMA,
    )


def test_insert_envelope(spark):
    df = make_event(spark, "c", after={"id": "1", "val": "9"})
    row = to_debezium(df, topic_prefix="cdc", source_db="testdb").collect()[0]
    assert row["topic"] == "cdc.public.t1"
    key = json.loads(row["key"])
    assert key == {"id": "1"}
    value = json.loads(row["value"])
    payload = value["payload"]
    assert payload["op"] == "c"
    assert payload["before"] is None
    assert payload["after"] == {"id": "1", "val": "9"}
    src = payload["source"]
    assert src["connector"] == "pg2any"
    assert src["db"] == "testdb"
    assert src["txId"] == 42 and src["lsn"] == 1234
    assert payload["ts_ms"] == int(TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    assert value["schema"]["name"] == "cdc.public.t1.Envelope"
    fields = value["schema"]["fields"][0]["fields"]
    assert {f["field"] for f in fields} == {"id", "val"}


def test_delete_envelope_uses_before(spark):
    df = make_event(spark, "d", before={"id": "3"})
    row = to_debezium(df).collect()[0]
    value = json.loads(row["value"])
    assert value["payload"]["after"] is None
    assert value["payload"]["before"] == {"id": "3"}
    assert json.loads(row["key"]) == {"id": "3"}


def test_from_debezium_roundtrip(spark):
    from pg2any_spark.functions.envelope import from_debezium

    df = make_event(spark, "u", before={"id": "3", "val": "1"}, after={"id": "3", "val": "2"})
    back = from_debezium(to_debezium(df)).collect()[0]
    assert back["op"] == "u"
    assert back["schema"] == "public" and back["table"] == "t1"
    assert back["txid"] == 42 and back["lsn"] == 1234
    assert back["before"] == {"id": "3", "val": "1"}
    assert back["after"] == {"id": "3", "val": "2"}
    assert back["key_columns"] == ["id"]
    assert back["replica_identity"] == "default"
    # ts survives at millisecond precision (TS has zero micros)
    assert back["commit_ts"].replace(tzinfo=None) == TS


def test_from_debezium_delete_key_from_before(spark):
    from pg2any_spark.functions.envelope import from_debezium

    df = make_event(spark, "d", before={"id": "3"})
    back = from_debezium(to_debezium(df)).collect()[0]
    assert back["op"] == "d"
    assert back["after"] is None
    assert back["before"] == {"id": "3"}
    assert back["key_columns"] == ["id"]


class TestKafkaProducePathStandIn:
    """End-to-end produce path without a broker (reference
    ``kafka.rs:346-416`` delivery barrier): the envelope flows through
    an ACTUAL Structured Streaming query — readStream → to_debezium →
    writeStream(foreachBatch capturing the exact (topic, key, value)
    records a Kafka sink would transmit) — and the captured bytes are
    golden-asserted character-for-character. Swapping the capturing
    foreachBatch for format('kafka') + kafka_producer_options is the
    only delta to a live broker."""

    def test_streamed_envelope_exact_bytes(self, spark, tmp_path):
        # single-column row: map key order through the Python→JVM
        # conversion is not insertion-stable, and this assertion is
        # byte-exact on purpose
        src = str(tmp_path / "events")
        make_event(spark, "c", after={"id": "7"}).coalesce(1).write.parquet(src)

        captured = []

        def capture(batch_df, batch_id):
            captured.extend(
                (r["topic"], r["key"], r["value"])
                for r in batch_df.collect()
            )

        stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(src)
        q = (
            to_debezium(stream, topic_prefix="cdc", source_db="postgres")
            .writeStream.foreachBatch(capture)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        ts_ms = int(TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        fields = '{"type":"string","optional":true,"field":"id"}'
        expected_value = (
            '{"schema":{"type":"struct","fields":['
            f'{{"type":"struct","fields":[{fields}],"optional":true,"field":"before"}},'
            f'{{"type":"struct","fields":[{fields}],"optional":true,"field":"after"}}'
            '],"optional":false,"name":"cdc.public.t1.Envelope"},'
            '"payload":{"before":null,"after":{"id":"7"},'
            '"source":{"version":"0.1.0","connector":"pg2any","name":"cdc",'
            f'"ts_ms":{ts_ms},"db":"postgres","schema":"public","table":"t1",'
            '"txId":42,"lsn":1234},'
            f'"op":"c","ts_ms":{ts_ms}}}}}'
        )
        assert captured == [("cdc.public.t1", '{"id":"7"}', expected_value)]
