"""Metrics-name parity with the reference's Prometheus registry
(``monitoring/metrics.rs:13-132``) and batch/stream accounting."""

from __future__ import annotations

import datetime
import time

from pyspark.sql import Row

import pg2any_spark.streaming.metrics as M
from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


def _events(spark):
    rows = [
        Row(op="c", schema="public", table="t1", txid=1, lsn=10, commit_ts=TS,
            before=None, after={"id": "1"}, key_columns=["id"], replica_identity="default"),
        Row(op="u", schema="public", table="t1", txid=1, lsn=11, commit_ts=TS,
            before={"id": "1"}, after={"id": "1"}, key_columns=["id"], replica_identity="default"),
        Row(op="d", schema="public", table="t2", txid=2, lsn=12, commit_ts=TS,
            before={"id": "9"}, after=None, key_columns=["id"], replica_identity="default"),
    ]
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def test_record_batch_counts_and_lsn(spark):
    m = M.CdcMetrics()
    M.record_batch(m, _events(spark))
    assert m.get(M.EVENTS_PROCESSED_TOTAL) == 3
    assert m.get(M.EVENTS_BY_TYPE, event_type="insert", table_name="t1") == 1
    assert m.get(M.EVENTS_BY_TYPE, event_type="update", table_name="t1") == 1
    assert m.get(M.EVENTS_BY_TYPE, event_type="delete", table_name="t2") == 1
    assert m.get(M.CURRENT_RECEIVED_LSN) == 12
    # txid 1 spans two (op, table) groups but is ONE transaction:
    # distinct txids are counted once over the whole batch
    assert m.get(M.TRANSACTIONS_PROCESSED_TOTAL) == 2
    M.record_applied(m, 12)
    assert m.get(M.LAST_PROCESSED_LSN) == 12
    assert m.get(M.FULL_TRANSACTIONS_PROCESSED_TOTAL) == 1


def test_prometheus_rendering_uses_reference_names(spark):
    m = M.CdcMetrics()
    M.record_batch(m, _events(spark))
    text = m.render_prometheus()
    assert "pg2any_events_processed_total 3" in text
    assert 'pg2any_events_by_type_total{event_type="insert",table_name="t1"} 1' in text
    assert "pg2any_uptime_seconds" in text
    assert 'pg2any_build_info{version="' in text


def test_metrics_http_endpoint(spark):
    """Scrape contract parity with metrics_server.rs: /metrics serves
    the Prometheus text with the reference counter names, /health
    serves the health JSON, everything else 404s."""
    import urllib.error
    import urllib.request

    m = M.CdcMetrics()
    M.record_batch(m, _events(spark))
    srv = M.MetricsServer(m, port=0, host="127.0.0.1").start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        resp = urllib.request.urlopen(f"{base}/metrics", timeout=10)
        assert resp.status == 200
        assert resp.headers["content-type"].startswith("text/plain; version=0.0.4")
        text = resp.read().decode()
        assert "pg2any_events_processed_total 3" in text
        assert "pg2any_transactions_processed_total 2" in text
        assert "pg2any_uptime_seconds" in text

        health = urllib.request.urlopen(f"{base}/health", timeout=10)
        assert health.status == 200
        assert health.read() == b'{"status":"healthy"}'

        try:
            urllib.request.urlopen(f"{base}/nope", timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_listener_tracks_stream_progress(spark, tmp_path):
    m = M.CdcMetrics()
    listener = M.make_listener(m)
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "events")
        _events(spark).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(src)
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("metrics_smoke")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener callbacks are async; poll briefly
        deadline = time.time() + 15
        while time.time() < deadline and m.get(M.EVENT_PROCESSING_DURATION,
                                               event_type="batch",
                                               destination_type="spark") == 0:
            time.sleep(0.2)
        assert m.get(M.EVENT_PROCESSING_DURATION, event_type="batch",
                     destination_type="spark") > 0
        assert m.get(M.SOURCE_CONNECTION_STATUS) in (0, 1)
    finally:
        spark.streams.removeListener(listener)


def test_listener_logs_and_counts_poisoned_event(caplog):
    """A callback failure must be logged at WARN with the event type
    and counted — never silently swallowed, never propagated to the
    listener bus."""
    import logging

    m = M.CdcMetrics()
    listener = M.make_listener(m)

    class Poisoned:
        @property
        def progress(self):
            raise RuntimeError("boom")

    with caplog.at_level(logging.WARNING, logger="pg2any_spark.streaming.metrics"):
        listener.onQueryProgress(Poisoned())  # must not raise
    assert any(
        "onQueryProgress" in r.message and "Poisoned" in r.message
        for r in caplog.records
    )
    assert (
        m.get(
            M.ERRORS_TOTAL,
            error_type="onQueryProgress",
            component="metrics_listener",
        )
        == 1
    )
