"""Sink implementations (SURVEY §2.6).

All sinks share the reference's ``Sink`` surface (``storeRawEvents``,
``maxBytes``, ``isHealthy``, ``shutdown`` — core/.../sinks/Sink.scala:25-36)
re-expressed for Spark micro-batches: a sink is an object with
``write(df, epoch_id)`` called from ``foreachBatch`` (or a native
``writeStream`` format for Kafka/console).

Structured Streaming checkpointing upgrades the reference's at-least-once-
with-edge-loss delivery to at-least-once (exactly-once into idempotent /
transactional sinks) — SURVEY §4.1.
"""

from .base import BackoffPolicy, CircuitBreaker, RetryingSink, Sink, SinkHealth
from .cloud import KinesisSink, SqsSink
from .files import ParquetSink
from .memory import MemorySink
from .queues import EventBuffer, NsqSink, PubSubSink, RabbitMQSink
from .stdout import StdoutSink

__all__ = [
    "BackoffPolicy",
    "CircuitBreaker",
    "EventBuffer",
    "KinesisSink",
    "MemorySink",
    "NsqSink",
    "ParquetSink",
    "PubSubSink",
    "RabbitMQSink",
    "RetryingSink",
    "Sink",
    "SinkHealth",
    "SqsSink",
    "StdoutSink",
]
