"""Metrics surface with the reference's Prometheus counter names.

The reference exposes a Prometheus registry from its metrics HTTP
server (``monitoring/metrics.rs:13-132``); the names below are a
1:1 port so dashboards built against pg2any keep working. Sources of
truth in Spark:

- ``StreamingQueryListener`` progress events supply the stream-level
  numbers (rows/s, batch durations, uptime) — the reference computes
  these itself in the consumer loop.
- the ``foreachBatch`` apply hook supplies event-level numbers
  (per-type/table counts, LSN high-water marks) — one small
  ``groupBy('op','table').count()`` per micro-batch, aggregated
  map-side; never a per-row driver callback.

No Prometheus client dependency: counters live in a thread-safe dict
and ``render_prometheus()`` emits the text exposition format the
reference's ``/metrics`` endpoint serves.
"""

from __future__ import annotations

import logging
import threading
import time

from pyspark.sql import DataFrame, functions as F

logger = logging.getLogger(__name__)

LIB_VERSION = "0.1.0"

#: Counter/gauge names, verbatim from ``monitoring/metrics.rs``.
EVENTS_PROCESSED_TOTAL = "pg2any_events_processed_total"
EVENTS_BY_TYPE = "pg2any_events_by_type_total"  # labels: event_type, table_name
EVENTS_RATE = "pg2any_events_per_second"
CONSUMER_QUEUE_SIZE = "pg2any_consumer_queue_length"
LAST_PROCESSED_LSN = "pg2any_last_processed_lsn"
CURRENT_RECEIVED_LSN = "pg2any_current_received_lsn"
ERRORS_TOTAL = "pg2any_errors_total"  # labels: error_type, component
SOURCE_CONNECTION_STATUS = "pg2any_source_connection_status"
DESTINATION_CONNECTION_STATUS = "pg2any_destination_connection_status"
EVENT_PROCESSING_DURATION = "pg2any_event_processing_duration_seconds"
ACTIVE_CONNECTIONS = "pg2any_active_connections"
UPTIME_SECONDS = "pg2any_uptime_seconds"
BUILD_INFO = "pg2any_build_info"
TRANSACTIONS_PROCESSED_TOTAL = "pg2any_transactions_processed_total"
FULL_TRANSACTIONS_PROCESSED_TOTAL = "pg2any_full_transactions_processed_total"


class CdcMetrics:
    """Thread-safe metric store keyed by (name, labels tuple)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._values: dict[tuple[str, tuple[tuple[str, str], ...]], float] = {}
        self._started = time.monotonic()
        self.set(BUILD_INFO, 1, version=LIB_VERSION)

    @staticmethod
    def _key(name: str, labels: dict[str, str]):
        return (name, tuple(sorted(labels.items())))

    def inc(self, name: str, amount: float = 1.0, **labels: str) -> None:
        k = self._key(name, labels)
        with self._lock:
            self._values[k] = self._values.get(k, 0.0) + amount

    def set(self, name: str, value: float, **labels: str) -> None:
        with self._lock:
            self._values[self._key(name, labels)] = float(value)

    def get(self, name: str, **labels: str) -> float:
        with self._lock:
            return self._values.get(self._key(name, labels), 0.0)

    def render_prometheus(self) -> str:
        """Text exposition format, like the reference's /metrics."""
        self.set(UPTIME_SECONDS, time.monotonic() - self._started)
        with self._lock:
            lines = []
            for (name, labels), value in sorted(self._values.items()):
                if labels:
                    lbl = ",".join(f'{k}="{v}"' for k, v in labels)
                    lines.append(f"{name}{{{lbl}}} {value:g}")
                else:
                    lines.append(f"{name} {value:g}")
        return "\n".join(lines) + "\n"


class MetricsServer:
    """HTTP exposition server — the reference's ``metrics_server.rs``
    contract: ``GET /metrics`` → Prometheus text format (version=0.0.4
    content type), ``GET /health`` → ``{"status":"healthy"}``, anything
    else → 404 "Not Found". Runs on a daemon thread; ``port=0`` binds
    an ephemeral port (see ``.port`` after start)."""

    def __init__(self, metrics: CdcMetrics, port: int = 8080, host: str = "0.0.0.0"):
        import http.server

        registry = metrics

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path == "/metrics":
                    body = registry.render_prometheus().encode()
                    self.send_response(200)
                    self.send_header(
                        "content-type", "text/plain; version=0.0.4; charset=utf-8"
                    )
                elif self.path == "/health":
                    body = b'{"status":"healthy"}'
                    self.send_response(200)
                    self.send_header("content-type", "application/json")
                else:
                    body = b"Not Found"
                    self.send_response(404)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # quiet scrape logs
                pass

        self._server = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "MetricsServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="metrics-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)


#: op code → the reference's event_type label values.
_OP_LABEL = {"c": "insert", "u": "update", "d": "delete", "t": "truncate"}


def record_batch(metrics: CdcMetrics, batch_df: DataFrame) -> None:
    """Per-micro-batch event accounting — call from the foreachBatch
    apply hook. One distributed aggregate per batch: (op, table)
    counts + LSN/txid high-water marks; only the tiny aggregate rows
    reach the driver."""
    rows = (
        batch_df.groupBy("op", "table")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("lsn").alias("max_lsn"),
        )
        .collect()
    )
    max_lsn = 0
    for r in rows:
        metrics.inc(EVENTS_PROCESSED_TOTAL, r["n"])
        metrics.inc(
            EVENTS_BY_TYPE,
            r["n"],
            event_type=_OP_LABEL.get(r["op"], r["op"]),
            table_name=r["table"],
        )
        max_lsn = max(max_lsn, r["max_lsn"] or 0)
    if rows:
        # Distinct txids over the WHOLE batch — summing per-(op, table)
        # distinct counts would count one transaction once per table or
        # op-type it touches.
        n_tx = batch_df.select(F.count_distinct("txid").alias("n")).first()["n"]
        metrics.set(CURRENT_RECEIVED_LSN, max_lsn)
        metrics.inc(TRANSACTIONS_PROCESSED_TOTAL, n_tx)


def record_applied(metrics: CdcMetrics, lsn: int) -> None:
    """Mark a batch durably applied (the reference's ACK-after-apply:
    ``transaction_manager.rs:1993-2029``)."""
    metrics.set(LAST_PROCESSED_LSN, lsn)
    metrics.inc(FULL_TRANSACTIONS_PROCESSED_TOTAL)


def make_listener(metrics: CdcMetrics):
    """StreamingQueryListener wiring progress events into the registry.

    Import is deferred so batch-only deployments never touch the
    streaming listener machinery. A callback failure must never kill
    the listener bus, but it must not be silent either — a quiet
    metrics outage on a long-running pipeline multiplies every other
    incident — so failures are logged at WARN with the event type and
    counted in ``pg2any_errors_total{component="metrics_listener"}``.
    """
    from pyspark.sql.streaming import StreamingQueryListener

    def guarded(fn):
        def wrapper(self, event) -> None:
            try:
                fn(self, event)
            except Exception:
                logger.warning(
                    "metrics listener %s failed on %s",
                    fn.__name__,
                    type(event).__name__,
                    exc_info=True,
                )
                metrics.inc(
                    ERRORS_TOTAL,
                    error_type=fn.__name__,
                    component="metrics_listener",
                )

        wrapper.__name__ = fn.__name__
        return wrapper

    class CdcMetricsListener(StreamingQueryListener):
        @guarded
        def onQueryStarted(self, event) -> None:
            metrics.set(SOURCE_CONNECTION_STATUS, 1)

        @guarded
        def onQueryProgress(self, event) -> None:
            p = event.progress
            metrics.set(EVENTS_RATE, p.processedRowsPerSecond or 0.0)
            metrics.set(CONSUMER_QUEUE_SIZE, p.numInputRows or 0)
            dur_ms = (p.durationMs or {}).get("triggerExecution", 0)
            metrics.inc(
                EVENT_PROCESSING_DURATION,
                dur_ms / 1000.0,
                event_type="batch",
                destination_type="spark",
            )

        @guarded
        def onQueryTerminated(self, event) -> None:
            metrics.set(SOURCE_CONNECTION_STATUS, 0)
            if getattr(event, "exception", None):
                metrics.inc(ERRORS_TOTAL, error_type="query", component="consumer")

        @guarded
        def onQueryIdle(self, event) -> None:
            metrics.set(EVENTS_RATE, 0.0)

    return CdcMetricsListener()
