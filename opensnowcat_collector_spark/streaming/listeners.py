"""X2 metrics: StreamingQueryListener -> counters (statsd analogue).

reference: core/.../Collector.scala:138-160 (request count/latency by
method/status via Datadog registry).  In Spark the per-batch progress
event carries rows/sec and durations; this listener accumulates them and
can forward to any statsd-like callable.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    def __init__(self, emit=None):
        self.progress_events: list[dict] = []
        self.emit = emit  # optional callable(name, value)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
        }
        self.progress_events.append(rec)
        if self.emit:
            self.emit("collector.batch.input_rows", p.numInputRows)
            self.emit("collector.batch.rows_per_sec", p.processedRowsPerSecond or 0)

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass


class StatsdEmitter:
    """StatsD line emitter over UDP (reference:
    monitoring.metrics.statsd block, reference.conf:74-83; the Scala side
    reports through a Datadog/StatsD registry).  Wire format:
    ``<prefix>.<name>:<value>|<type>`` one metric per datagram; the
    socket is injectable so tests assert the exact lines without a
    network."""

    def __init__(self, hostname: str = "localhost", port: int = 8125,
                 prefix: str = "snowplow.collector", send=None):
        self.addr = (hostname, port)
        self.prefix = prefix
        if send is None:
            import socket

            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

            def send(data: bytes) -> None:
                sock.sendto(data, self.addr)

        self._send = send

    def gauge(self, name: str, value) -> None:
        self._send(f"{self.prefix}.{name}:{value}|g".encode())

    def count(self, name: str, value: int = 1) -> None:
        self._send(f"{self.prefix}.{name}:{value}|c".encode())

    def __call__(self, name: str, value) -> None:  # MetricsListener emit hook
        self.gauge(name, value)
