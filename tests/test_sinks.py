"""Sink machinery tests: retry backoff, circuit breaker, failover
(EventBufferSpec / RetryPolicySpec analogues, SURVEY §5.5)."""

from __future__ import annotations

import random

import pytest

from opensnowcat_collector_spark.sinks.base import (
    BackoffPolicy,
    CircuitBreaker,
    RetryingSink,
)
from opensnowcat_collector_spark.sinks.memory import MemorySink


def test_backoff_jitter_within_bounds():
    policy = BackoffPolicy(min_backoff_ms=100, max_backoff_ms=1000, max_retries=5)
    rng = random.Random(42)
    prev = None
    for _ in range(20):
        b = policy.next_backoff_ms(prev, rng)
        assert 66 <= b <= 1000
        if prev is not None:
            assert b >= int(prev * 2 / 3) or b == 1000
        prev = b


def test_circuit_breaker_states():
    t = [0.0]
    cb = CircuitBreaker(threshold=3, reset_ms=60000, clock=lambda: t[0])
    assert cb.allow() and cb.state == cb.CLOSED
    for _ in range(3):
        cb.record_failure()
    assert cb.state == cb.OPEN
    assert not cb.allow()
    t[0] = 61.0  # past reset window
    assert cb.allow() and cb.state == cb.HALF_OPEN
    cb.record_failure()
    assert cb.state == cb.OPEN
    t[0] = 125.0
    assert cb.allow()
    cb.record_success()
    assert cb.state == cb.CLOSED


def test_retrying_sink_recovers(spark):
    df = spark.range(3)
    primary = MemorySink(fail_first=2)
    sink = RetryingSink(
        primary,
        policy=BackoffPolicy(min_backoff_ms=1, max_backoff_ms=2, max_retries=3),
        sleep=lambda s: None,
    )
    sink.write(df)
    assert len(primary.batches) == 1
    assert sink.is_healthy() is False or sink.health.healthy  # healthy after success


def test_retrying_sink_fails_over_to_backup(spark):
    df = spark.range(3)
    primary = MemorySink(fail_first=100)
    backup = MemorySink()
    sink = RetryingSink(
        primary,
        backup=backup,
        policy=BackoffPolicy(min_backoff_ms=1, max_backoff_ms=2, max_retries=2),
        sleep=lambda s: None,
    )
    sink.write(df)
    assert len(backup.batches) == 1
    assert len(primary.batches) == 0


def test_retrying_sink_raises_without_backup(spark):
    df = spark.range(1)
    primary = MemorySink(fail_first=100)
    sink = RetryingSink(
        primary,
        policy=BackoffPolicy(min_backoff_ms=1, max_backoff_ms=2, max_retries=1),
        sleep=lambda s: None,
    )
    with pytest.raises(RuntimeError, match="sink delivery failed"):
        sink.write(df)


def test_health_probe_flips_and_recovers():
    """Active probe (KinesisSink.scala:372-395 analogue): a failing probe
    marks the sink unhealthy; a succeeding probe recovers probe-detected
    unhealthiness (but never masks a write failure)."""
    from opensnowcat_collector_spark.sinks.base import HealthProbe, Sink, SinkHealth

    class Probeable(Sink):
        def __init__(self):
            super().__init__()
            self.fail_probe = False

        def write(self, df, epoch_id=0):
            pass

        def probe(self):
            if self.fail_probe:
                raise RuntimeError("endpoint down")

    s = Probeable()
    hp = HealthProbe(s, interval_s=0.01)
    assert hp.probe_once() and s.is_healthy()
    s.fail_probe = True
    assert not hp.probe_once()
    assert not s.is_healthy() and "endpoint down" in s.health.last_error
    s.fail_probe = False
    assert hp.probe_once() and s.is_healthy()
    # write-failure health is NOT cleared by a passing probe
    s.health = SinkHealth(False, "delivery failed")
    assert hp.probe_once()
    assert not s.is_healthy()


def test_probe_unhealthy_primary_fast_fails_over(spark):
    """When the active probe has marked the primary down, RetryingSink
    skips the primary retry ladder and delivers via the backup."""
    from opensnowcat_collector_spark.sinks.base import SinkHealth

    df = spark.range(3)
    primary = MemorySink(fail_first=100)
    primary.health = SinkHealth(False, "probe: endpoint down")
    backup = MemorySink()
    calls = {"n": 0}
    orig = primary.write

    def counting_write(d, e=0):
        calls["n"] += 1
        return orig(d, e)

    primary.write = counting_write
    sink = RetryingSink(
        primary,
        backup=backup,
        policy=BackoffPolicy(min_backoff_ms=1, max_backoff_ms=2, max_retries=5),
        sleep=lambda s: None,
    )
    sink.write(df)
    assert len(backup.batches) == 1
    assert calls["n"] == 0  # primary never attempted


def test_kinesis_probe_checks_stream_status():
    from opensnowcat_collector_spark.sinks.cloud import KinesisSink

    class DescribeClient:
        def __init__(self, status):
            self.status = status

        def describe_stream(self, StreamName):
            return {"StreamDescription": {"StreamStatus": self.status}}

    ok = KinesisSink("s", client_factory=lambda: DescribeClient("ACTIVE"))
    ok.probe()  # no raise
    bad = KinesisSink("s", client_factory=lambda: DescribeClient("DELETING"))
    with pytest.raises(RuntimeError, match="DELETING"):
        bad.probe()
