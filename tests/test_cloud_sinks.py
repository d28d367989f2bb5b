"""K1/K3-K6 sink writers with injected fake clients, A2 chunking, A3
bounded buffer, and the T9 Thrift wire codec."""

from __future__ import annotations

import base64
import random

import pytest

from opensnowcat_collector_spark.sinks.base import BackoffPolicy
from opensnowcat_collector_spark.sinks.cloud import (
    KinesisSink,
    SqsSink,
    chunk_records,
)
from opensnowcat_collector_spark.sinks.queues import (
    EventBuffer,
    NsqSink,
    PubSubSink,
    RabbitMQSink,
)
from opensnowcat_collector_spark.thrift_codec import (
    decode_collector_payload,
    encode_collector_payload,
)

FAST = {"policy": BackoffPolicy(max_retries=2), "sleep": lambda s: None,
        "rng": random.Random(42), "distributed": False}


def _records_df(spark, n=25, prefix="r"):
    rows = [(f"pk-{i % 3}", f'{{"{prefix}": {i}}}') for i in range(n)]
    return spark.createDataFrame(rows, "partition_key string, serialized string")


# --- A2 chunking ------------------------------------------------------------


def test_chunk_records_by_count_and_bytes():
    rows = [("k", "x" * 10)] * 25
    assert [len(b) for b in chunk_records(rows, 10, 10**9)] == [10, 10, 5]
    # byte budget: each row is 10 bytes, cap 35 -> 3 per batch
    assert [len(b) for b in chunk_records(rows, 500, 35)] == [3] * 8 + [1]
    # a single row larger than the budget still ships alone
    assert [len(b) for b in chunk_records([("k", "y" * 100)], 10, 35)] == [1]


# --- A3 bounded buffer ------------------------------------------------------


def test_event_buffer_drops_oldest():
    buf = EventBuffer(max_size=3)
    for i in range(5):
        buf.add(i)
    assert buf.drain() == [2, 3, 4]
    assert buf.dropped == 2
    assert len(buf) == 0


# --- K1 Kinesis -------------------------------------------------------------


class FakeKinesis:
    def __init__(self, fail_seq=()):
        self.calls = []
        self.records = []
        self.fail_seq = list(fail_seq)  # per-call list of failing indices

    def put_records(self, StreamName, Records):
        self.calls.append(len(Records))
        failing = set(self.fail_seq.pop(0)) if self.fail_seq else set()
        out = []
        for i, r in enumerate(Records):
            if i in failing:
                out.append({"ErrorCode": "ProvisionedThroughputExceededException"})
            else:
                self.records.append((r["PartitionKey"], r["Data"].decode()))
                out.append({"SequenceNumber": "1"})
        return {"FailedRecordCount": len(failing), "Records": out}


def test_kinesis_sink_delivers_all(spark):
    fk = FakeKinesis()
    sink = KinesisSink("s", client_factory=lambda: fk, **FAST)
    sink.write(_records_df(spark, 25))
    assert len(fk.records) == 25


def test_kinesis_sink_retries_only_failed_subset(spark):
    fk = FakeKinesis(fail_seq=[[0, 2], []])  # first call fails 2 records
    sink = KinesisSink("s", client_factory=lambda: fk, **FAST)
    sink.write(_records_df(spark, 5))
    assert len(fk.records) == 5
    assert fk.calls == [5, 2]  # retry carried only the failed subset


def test_kinesis_sink_fails_over_to_sqs(spark):
    # every kinesis call fails for one record -> exhaust retries -> SQS
    fk = FakeKinesis(fail_seq=[[0], [0], [0]])
    fsqs = FakeSqs()
    sink = KinesisSink(
        "s",
        client_factory=lambda: fk,
        sqs_failover_queue_url="q",
        sqs_client_factory=lambda: fsqs,
        **FAST,
    )
    sink.write(_records_df(spark, 3))
    assert len(fk.records) == 2
    assert len(fsqs.messages) == 1
    body, attrs = fsqs.messages[0]
    assert attrs["kinesisKey"]["StringValue"].startswith("pk-")
    assert base64.b64decode(body).decode().startswith('{"r":')


def test_kinesis_sink_raises_without_failover(spark):
    fk = FakeKinesis(fail_seq=[[0], [0], [0]])
    sink = KinesisSink("s", client_factory=lambda: fk, **FAST)
    with pytest.raises(Exception, match="delivery failed"):
        sink.write(_records_df(spark, 2))


# --- K3 SQS -----------------------------------------------------------------


class FakeSqs:
    def __init__(self, fail_first=0):
        self.batches = []
        self.messages = []
        self.fail_first = fail_first

    def send_message_batch(self, QueueUrl, Entries):
        self.batches.append(len(Entries))
        failed = []
        for e in Entries:
            if self.fail_first > 0:
                self.fail_first -= 1
                failed.append({"Id": e["Id"]})
            else:
                self.messages.append((e["MessageBody"], e["MessageAttributes"]))
        return {"Failed": failed}


def test_sqs_sink_batches_of_ten(spark):
    fs = FakeSqs()
    sink = SqsSink("q", client_factory=lambda: fs, **FAST)
    sink.write(_records_df(spark, 25))
    assert len(fs.messages) == 25
    assert all(b <= 10 for b in fs.batches)
    # bodies are base64 (SqsSink.scala base64 body)
    body, attrs = fs.messages[0]
    assert base64.b64decode(body).decode().startswith('{"r":')
    assert "kinesisKey" in attrs


def test_sqs_sink_retries_failed_entries(spark):
    fs = FakeSqs(fail_first=3)
    sink = SqsSink("q", client_factory=lambda: fs, **FAST)
    sink.write(_records_df(spark, 12))
    assert len(fs.messages) == 12


# --- K4 PubSub / K5 NSQ / K6 RabbitMQ --------------------------------------


class FakeFuture:
    def result(self):
        return "id"


class FakePublisher:
    def __init__(self):
        self.published = []

    def publish(self, topic, data, **attrs):
        self.published.append((topic, data, attrs))
        return FakeFuture()


def test_pubsub_sink(spark):
    fp = FakePublisher()
    sink = PubSubSink("projects/p/topics/t", publisher_factory=lambda: fp, distributed=False)
    sink.write(_records_df(spark, 7))
    assert len(fp.published) == 7
    assert fp.published[0][0] == "projects/p/topics/t"


def test_nsq_sink(spark):
    posts = []
    sink = NsqSink(
        "localhost:4151", "events",
        http_post=lambda url, body: (posts.append((url, body)), 200)[1],
        distributed=False,
    )
    sink.write(_records_df(spark, 4))
    url, body = posts[0]
    assert "topic=events" in url
    assert body.count(b"\n") == 3  # 4 records, newline-joined mpub format


class FlakyChannel:
    def __init__(self, fail_times=2):
        self.fail_times = fail_times
        self.published = []

    def basic_publish(self, exchange, routing_key, body):
        if self.fail_times > 0:
            self.fail_times -= 1
            raise ConnectionError("amqp down")
        self.published.append((exchange, routing_key, body))


def test_rabbitmq_sink_retries_with_backoff(spark):
    sleeps = []
    ch = FlakyChannel(fail_times=2)
    sink = RabbitMQSink(
        "ex", "rk", channel_factory=lambda: ch,
        sleep=lambda s: sleeps.append(s), distributed=False,
    )
    sink.write(_records_df(spark, 2))
    assert len(ch.published) == 2
    # multiplicative backoff: 100ms then 200ms
    assert sleeps == [0.1, 0.2]


# --- T9 Thrift codec --------------------------------------------------------


def test_thrift_roundtrip():
    row = {
        "schema": "iglu:com.snowplowanalytics.snowplow/CollectorPayload/thrift/1-0-0",
        "ip_address": "1.2.3.4",
        "timestamp": 1705320000000,
        "encoding": "UTF-8",
        "collector": "app-0.1.0-stdout",
        "querystring": "e=pv",
        "body": None,  # optional field omitted from the wire
        "path": "/i",
        "user_agent": "ua",
        "referer_uri": None,
        "hostname": "h",
        "network_user_id": "n",
        "headers": ["A: b", "C: d"],
        "content_type": None,
    }
    data = encode_collector_payload(row)
    back = decode_collector_payload(data)
    assert back == {k: v for k, v in row.items() if v is not None}
    # wire structure: i64 timestamp field header = type 10, id 200
    assert bytes([10, 0, 200]) in data
    # schema field id 31337 (0x7a69)
    assert bytes([11, 0x7A, 0x69]) in data


def test_thrift_decode_skips_unknown_fields():
    import struct as s

    extra = bytearray()
    extra.append(11)  # string field
    extra += s.pack(">h", 999)  # unknown id
    extra += s.pack(">i", 2) + b"zz"
    known = encode_collector_payload({"ip_address": "1.1.1.1"})
    combined = bytes(extra) + known  # prepend unknown field, keep STOP from known
    assert decode_collector_payload(combined) == {"ip_address": "1.1.1.1"}


def test_thrift_bytes_column(spark):
    from opensnowcat_collector_spark.thrift_codec import with_thrift_bytes

    df = spark.createDataFrame(
        [("1.2.3.4", 1705320000000, "/i", ["H: v"], "sch")],
        "ip_address string, timestamp long, path string, headers array<string>, schema string",
    )
    out = with_thrift_bytes(df).collect()[0]
    decoded = decode_collector_payload(bytes(out["thrift_bytes"]))
    assert decoded["ip_address"] == "1.2.3.4"
    assert decoded["timestamp"] == 1705320000000
    assert decoded["headers"] == ["H: v"]


def test_gcp_user_agent_matches_reference_spec():
    """Port of GcpUserAgentSpec.scala: exact string + the GCP partner
    attribution regex must extract 'Snowplow;'."""
    import re

    from opensnowcat_collector_spark.sinks.queues import create_gcp_user_agent

    ua = create_gcp_user_agent("Snowplow OSS")
    assert ua == "Snowplow OSS/collector (GPN:Snowplow;)"
    m = re.search(
        r"(?iu)(?:[^\(\)\/]+\/[^\/]+\s+)*(?:[^\s][^\(\)\/]+\/[^\/]+\s?\([^\(\)]*)gpn:(.*)[;\)]",
        ua,
    )
    assert m and m.group(1) == "Snowplow;"
    sink_ua = PubSubSink(
        "projects/p/topics/t", publisher_factory=lambda: None, gcp_user_agent_product="Acme"
    ).user_agent
    assert sink_ua == "Acme/collector (GPN:Snowplow;)"


# --- wire-format request shapes (VERDICT r5 item 4) -------------------------
# Exact request dicts pinned against the reference builders — the part of
# kinesis/src/it/.../KinesisSinkSpec the broker-less sandbox can verify.


class RawCaptureKinesis:
    """Records the verbatim put_records kwargs (no normalization)."""

    def __init__(self):
        self.requests = []

    def put_records(self, **kwargs):
        self.requests.append(kwargs)
        return {
            "FailedRecordCount": 0,
            "Records": [{"SequenceNumber": "1"}] * len(kwargs["Records"]),
        }


class RawCaptureSqs:
    def __init__(self):
        self.requests = []

    def send_message_batch(self, **kwargs):
        self.requests.append(kwargs)
        return {"Failed": []}


def test_kinesis_putrecords_request_shape(spark):
    """KinesisSink.scala:271: PutRecordsRequestEntry carries the partition
    key verbatim and the payload as RAW bytes (no base64 on the Kinesis
    path — base64 is SQS-only)."""
    fk = RawCaptureKinesis()
    sink = KinesisSink("events-stream", client_factory=lambda: fk, **FAST)
    df = spark.createDataFrame(
        [("pk-a", '{"e": 1}'), ("pk-b", '{"e": 2}')],
        "partition_key string, serialized string",
    )
    sink.write(df)
    assert fk.requests == [
        {
            "StreamName": "events-stream",
            "Records": [
                {"Data": b'{"e": 1}', "PartitionKey": "pk-a"},
                {"Data": b'{"e": 2}', "PartitionKey": "pk-b"},
            ],
        }
    ]


def test_sqs_sendmessagebatch_request_shape(spark):
    """SqsSink.scala:193-209: entry = unique Id + base64 MessageBody +
    a single String attribute ``kinesisKey`` holding the partition key."""
    fs = RawCaptureSqs()
    sink = SqsSink("https://sqs.example/q", client_factory=lambda: fs, **FAST)
    df = spark.createDataFrame(
        [("pk-a", '{"e": 1}'), ("pk-b", '{"e": 2}')],
        "partition_key string, serialized string",
    )
    sink.write(df)
    assert fs.requests == [
        {
            "QueueUrl": "https://sqs.example/q",
            "Entries": [
                {
                    "Id": "0",
                    "MessageBody": base64.b64encode(b'{"e": 1}').decode("ascii"),
                    "MessageAttributes": {
                        "kinesisKey": {"DataType": "String", "StringValue": "pk-a"}
                    },
                },
                {
                    "Id": "1",
                    "MessageBody": base64.b64encode(b'{"e": 2}').decode("ascii"),
                    "MessageAttributes": {
                        "kinesisKey": {"DataType": "String", "StringValue": "pk-b"}
                    },
                },
            ],
        }
    ]


def test_kinesis_failover_request_shape(spark):
    """KinesisSink.scala:304-320: the failover message is the SQS wire
    shape (base64 + kinesisKey), not a re-serialized Kinesis entry."""
    fk = FakeKinesis(fail_seq=[[0], [0], [0]])  # one record exhausts retries
    fs = RawCaptureSqs()
    sink = KinesisSink(
        "s",
        client_factory=lambda: fk,
        sqs_failover_queue_url="https://sqs.example/buf",
        sqs_client_factory=lambda: fs,
        **FAST,
    )
    df = spark.createDataFrame(
        [("pk-a", '{"e": 1}')], "partition_key string, serialized string"
    )
    sink.write(df)
    assert fs.requests == [
        {
            "QueueUrl": "https://sqs.example/buf",
            "Entries": [
                {
                    "Id": "0",
                    "MessageBody": base64.b64encode(b'{"e": 1}').decode("ascii"),
                    "MessageAttributes": {
                        "kinesisKey": {"DataType": "String", "StringValue": "pk-a"}
                    },
                }
            ],
        }
    ]


def test_sqs_1mib_guard_exact_accounting():
    """SQSPublisher.scala:303-307: the cap is on base64(body) length plus
    the 100 B attribute estimate, against 1 MiB exactly.  786357 raw
    bytes -> b64 1048476 + 100 == 1048576 passes; one more raw byte
    rounds b64 up to 1048480 and trips the guard."""
    from opensnowcat_collector_spark.sinks.cloud import _sqs_send
    from opensnowcat_collector_spark.sinks.base import BackoffPolicy

    def run(n):
        fs = RawCaptureSqs()
        _sqs_send(
            fs,
            "q",
            [("pk", "x" * n)],
            BackoffPolicy(max_retries=1, min_backoff_ms=1, max_backoff_ms=1),
            __import__("random").Random(0),
            lambda s: None,
            on_exhausted=lambda f: None,
        )
        return fs.requests

    assert len(run(786357)) == 1  # exactly at the cap: ships
    with pytest.raises(RuntimeError, match="exceed"):
        run(786358)


# --- K2 Kafka wire shape ----------------------------------------------------


def test_kafka_options_exact_producer_props():
    """KafkaSink.scala:377-400 + model.scala KafkaTimeouts defaults: the
    writer options must carry acks=all, retries, the BufferConfig-mapped
    buffer.memory/linger.ms, and the four non-blocking timeout guards —
    as exact strings (Spark passes kafka.* options to the producer
    verbatim)."""
    from opensnowcat_collector_spark.config import BufferConfig
    from opensnowcat_collector_spark.sinks.kafka import kafka_options

    buf = BufferConfig(byte_limit=3145728, time_limit_ms=500)
    assert kafka_options("broker1:9092,broker2:9092", "events", buf) == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "topic": "events",
        "kafka.acks": "all",
        "kafka.linger.ms": "500",
        "kafka.buffer.memory": "3145728",
        "kafka.retries": "10",
        "kafka.max.block.ms": "5000",
        "kafka.request.timeout.ms": "5000",
        "kafka.delivery.timeout.ms": "10000",
        "kafka.metadata.max.age.ms": "5000",
    }
    # producerConf passthrough (KafkaSink.scala:398: producerConf
    # entries override/extend the computed props)
    assert (
        kafka_options("b:9092", "t", buf, extra={"kafka.compression.type": "lz4"})[
            "kafka.compression.type"
        ]
        == "lz4"
    )


def test_kafka_record_mapping(spark):
    """(partition_key, serialized) -> (key, value): the partition key is
    the kafka record key, so same-user events keep per-partition order —
    the reference's KafkaProducer[String, Array[Byte]] contract."""
    from opensnowcat_collector_spark.sinks.kafka import to_kafka_records

    recs = to_kafka_records(_records_df(spark, 3)).collect()
    assert [(r["key"], r["value"]) for r in recs] == [
        ("pk-0", '{"r": 0}'),
        ("pk-1", '{"r": 1}'),
        ("pk-2", '{"r": 2}'),
    ]
