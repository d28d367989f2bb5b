"""Property-based tests (hypothesis) for the trickiest pure functions —
an upgrade over the reference's example-only specs (SURVEY §5.8 notes it
has no property tests).

No Spark session needed: these run in milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opensnowcat_collector_spark.sinks.cloud import chunk_records
from opensnowcat_collector_spark.sinks.queues import EventBuffer
from opensnowcat_collector_spark.thrift_codec import (
    decode_collector_payload,
    encode_collector_payload,
)
from opensnowcat_collector_spark.transforms.split import (
    _compact,
    _utf8_size,
    split_elements,
)

# --- split_elements invariants (SplitBatch.scala:48-74 semantics) -----------

_elements = st.lists(
    st.dictionaries(
        st.text(min_size=1, max_size=5),
        st.one_of(st.integers(-1000, 1000), st.text(max_size=20)),
        max_size=4,
    ),
    max_size=20,
)


@given(_elements, st.integers(1, 500))
@settings(max_examples=200, deadline=None)
def test_split_preserves_every_element_in_order(els, maximum):
    batches, failed = split_elements(els, maximum)
    recovered = [e for b in batches for e in b]
    # every input element lands in exactly one batch or in failed
    assert len(recovered) + len(failed) == len(els)
    # batch elements keep input order (failed are removed in place)
    it = iter(els)
    for e in recovered:
        for cand in it:
            if cand is e:
                break
        else:
            raise AssertionError("batch element out of input order")


@given(_elements, st.integers(1, 500))
@settings(max_examples=200, deadline=None)
def test_split_batches_respect_budget(els, maximum):
    batches, failed = split_elements(els, maximum)
    for b in batches:
        assert sum(_utf8_size(_compact(e)) + 1 for e in b) <= maximum
    for f in failed:
        assert _utf8_size(_compact(f)) + 1 > maximum


# --- thrift codec roundtrip -------------------------------------------------

_payloads = st.fixed_dictionaries(
    {},
    optional={
        "schema": st.text(max_size=30),
        "ip_address": st.text(max_size=20),
        "timestamp": st.integers(-(2**63), 2**63 - 1),
        "encoding": st.text(max_size=10),
        "collector": st.text(max_size=20),
        "querystring": st.text(max_size=50),
        "body": st.text(max_size=100),
        "path": st.text(max_size=30),
        "user_agent": st.text(max_size=30),
        "referer_uri": st.text(max_size=30),
        "hostname": st.text(max_size=20),
        "network_user_id": st.text(max_size=36),
        "headers": st.lists(st.text(max_size=30), max_size=5),
        "content_type": st.text(max_size=20),
    },
)


@given(_payloads)
@settings(max_examples=300, deadline=None)
def test_thrift_roundtrip_property(row):
    assert decode_collector_payload(encode_collector_payload(row)) == row


# --- A2 chunker invariants --------------------------------------------------


@given(
    st.lists(st.tuples(st.text(max_size=5), st.text(max_size=40)), max_size=40),
    st.integers(1, 20),
    st.integers(1, 200),
)
@settings(max_examples=200, deadline=None)
def test_chunk_records_invariants(rows, max_records, max_bytes):
    batches = list(chunk_records(rows, max_records, max_bytes))
    assert [r for b in batches for r in b] == rows  # order + completeness
    for b in batches:
        assert len(b) <= max_records
        size = sum(len(r[1].encode()) for r in b)
        # byte budget holds unless a single record alone exceeds it
        assert size <= max_bytes or len(b) == 1


# --- A3 buffer invariants ---------------------------------------------------


@given(st.lists(st.integers(), max_size=50), st.integers(1, 10))
@settings(max_examples=200, deadline=None)
def test_event_buffer_keeps_newest(items, cap):
    buf = EventBuffer(cap)
    for x in items:
        buf.add(x)
    kept = buf.drain()
    assert kept == items[-cap:] if items else kept == []
    assert buf.dropped == max(0, len(items) - cap)


# ---------------------------------------------------------------------------
# r5 admission ops: PII scrub + blocklist, checked as pure functions via
# Python re (the regexes are engine-portable by design — Java, RE2, and
# Python agree on this subset; the Spark-side behavior is pinned by
# test_tpch_patterns + the DuckDB oracle)
# ---------------------------------------------------------------------------

import re as _re

from opensnowcat_collector_spark.engine.llmdata.text import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_PHONE,
)


def _scrub(text: str) -> str:
    t = _re.sub(_PII_EMAIL, "<EMAIL>", text)
    t = _re.sub(_PII_PHONE, "<PHONE>", t)
    return _re.sub(_PII_IPV4, "<IP>", t)


_pii_free = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz  .,!?"), max_size=80
)


@given(_pii_free, st.integers(0, 10**9))
@settings(max_examples=300, deadline=None)
def test_pii_scrub_idempotent_and_complete(base, n):
    """Scrubbing is idempotent (placeholders contain no PII shapes) and
    the scrubbed text never matches any PII pattern again."""
    text = f"{base} u{n}@ex{n % 97}.example.org {base} 555-{n % 1000:03d}-{n % 10000:04d} 10.{n % 256}.0.{n % 100}"
    once = _scrub(text)
    assert _scrub(once) == once
    for pat in (_PII_EMAIL, _PII_PHONE, _PII_IPV4):
        assert not _re.search(pat, once)


@given(_pii_free)
@settings(max_examples=200, deadline=None)
def test_pii_scrub_no_false_positives_on_clean_text(base):
    """Text with no digits and no @ is returned byte-identical."""
    assert _scrub(base) == base


