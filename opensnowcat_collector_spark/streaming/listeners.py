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
