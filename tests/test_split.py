"""SplitBatchSpec port (reference: core/src/test/.../SplitBatchSpec.scala)
— pure-function tests of the bin-packer + split/serialize semantics, plus
the Spark mapInPandas path."""

from __future__ import annotations

import json

from opensnowcat_collector_spark.config import CollectorConfig
from opensnowcat_collector_spark.transforms.split import (
    _compact,
    _utf8_size,
    serialize_payload,
    split_and_serialize,
    split_elements,
)


def _payload(body=None, **kw) -> dict:
    row = {
        "schema": "iglu:com.snowplowanalytics.snowplow/CollectorPayload/thrift/1-0-0",
        "ip_address": "1.2.3.4",
        "timestamp": 1705320000000,
        "encoding": "UTF-8",
        "collector": "app-0.1.0-stdout",
        "querystring": "e=pv",
        "body": body,
        "path": "/com.snowplowanalytics.snowplow/tp2",
        "user_agent": "ua",
        "referer_uri": None,
        "hostname": "h",
        "network_user_id": "n",
        "headers": ["A: b"],
        "content_type": "application/json",
    }
    row.update(kw)
    return row


# --- split() semantics (SplitBatchSpec "split" cases) ----------------------


def test_split_empty():
    batches, failed = split_elements([], 1000)
    assert batches == [] and failed == []


def test_split_single_batch_when_all_fit():
    els = [{"k": i} for i in range(3)]
    batches, failed = split_elements(els, 1000)
    assert batches == [els] and failed == []


def test_split_oversized_element_fails_alone():
    big = {"k": "x" * 100}
    small = {"k": 1}
    batches, failed = split_elements([big, small], 50)
    assert failed == [big]
    assert batches == [[small]]


def test_split_respects_byte_budget_exactly():
    # elements of known serialized size: {"k":"xxxx"} = 12 bytes, +1 join
    el = {"k": "xxxx"}
    size = _utf8_size(_compact(el))
    assert size == 12
    # budget fits exactly two elements: 2*(12+1) = 26
    batches, failed = split_elements([el, el, el], 26)
    assert failed == []
    assert [len(b) for b in batches] == [2, 1]


def test_split_boundary_one_byte_short():
    el = {"k": "xxxx"}
    batches, failed = split_elements([el, el], 25)  # 26 needed for two
    assert [len(b) for b in batches] == [1, 1]
    assert failed == []


# --- splitAndSerializePayload semantics ------------------------------------


def test_small_event_passes_through():
    p = _payload(body='{"schema":"s","data":[1]}')
    goods, bads = split_and_serialize(p, 1_000_000)
    assert len(goods) == 1 and not bads
    assert goods[0]["serialized"] == serialize_payload(p)


def test_oversized_get_cannot_be_split():
    p = _payload(body=None, querystring="e=pv&" + "x" * 500)
    goods, bads = split_and_serialize(p, 400)
    assert not goods and len(bads) == 1
    assert bads[0]["expectation"] == "GET requests cannot be split"
    assert bads[0]["actual_size"] == _utf8_size(serialize_payload(p))
    # payload truncated to a tenth of the max
    assert len(bads[0]["payload"]) == 400 // 10


def test_oversized_non_json_body():
    p = _payload(body="not json" + "x" * 500)
    goods, bads = split_and_serialize(p, 400)
    assert not goods and len(bads) == 1
    assert bads[0]["expectation"].startswith("cannot split POST requests which are not json")


def test_oversized_not_self_describing():
    p = _payload(body=json.dumps({"data": ["x" * 500]}))
    goods, bads = split_and_serialize(p, 400)
    assert bads and bads[0]["expectation"].startswith(
        "cannot split POST requests which are not self-describing"
    )


def test_oversized_envelope_still_too_big():
    # tiny data array but a huge querystring: removing data can't save it
    p = _payload(
        body='{"schema":"iglu:x","data":[1]}', querystring="e=pv&" + "q" * 1000
    )
    goods, bads = split_and_serialize(p, 500)
    assert not goods and len(bads) == 1
    assert 'event without "data" field is still too big' in bads[0]["expectation"]


def test_split_three_good_four_bad():
    """SplitBatchSpec.scala:139-157 analogue: mixed small/huge elements."""
    small = [{"e": "pv", "i": i} for i in range(3)]
    huge = [{"e": "pv", "blob": "z" * 2000} for _ in range(4)]
    body = _compact({"schema": "iglu:x", "data": small + huge})
    p = _payload(body=body)
    whole = _utf8_size(serialize_payload(p))
    assert whole > 800
    goods, bads = split_and_serialize(p, 800)
    assert len(bads) == 4
    assert all(b["expectation"] == "this POST request split is still too large" for b in bads)
    # all small elements survive across the good batches
    recovered = []
    for g in goods:
        recovered.extend(json.loads(g["body"])["data"])
    assert recovered == small
    # every good batch respects the size limit
    assert all(g["size"] < 800 or len(json.loads(g["body"])["data"]) == 1 for g in goods)


def test_split_batches_fit_max_bytes():
    els = [{"e": "pv", "n": i, "pad": "p" * 40} for i in range(20)]
    body = _compact({"schema": "iglu:x", "data": els})
    p = _payload(body=body)
    goods, bads = split_and_serialize(p, 700)
    assert not bads
    assert len(goods) >= 2
    recovered = [e for g in goods for e in json.loads(g["body"])["data"]]
    assert recovered == els
    assert all(g["size"] <= 700 for g in goods)


# --- Spark path -------------------------------------------------------------


def test_pipeline_split_oversized(spark):
    from opensnowcat_collector_spark import pipeline
    from opensnowcat_collector_spark.config import SinkConfig
    from opensnowcat_collector_spark.schema import RAW_REQUEST_SCHEMA

    from .fixtures import _req

    els = [{"e": "pv", "n": i, "pad": "p" * 60} for i in range(12)]
    body = _compact(
        {"schema": "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4", "data": els}
    )
    reqs = [
        _req(0),
        _req(
            1,
            method="POST",
            path="/com.snowplowanalytics.snowplow/tp2",
            body=body,
            content_type="application/json",
            querystring=None,
        ),
        _req(2, querystring="e=pv&huge=" + "x" * 2000),  # oversized GET
    ]
    cfg = CollectorConfig(
        deterministic_now_ms=1705320000000,
        good_sink=SinkConfig(kind="stdout", max_bytes=900),
    )
    raw = spark.createDataFrame(reqs, RAW_REQUEST_SCHEMA)
    res = pipeline.run(raw, cfg)
    good = res.good.collect()
    bad = res.bad.collect()
    # req-0 is small -> one good; req-1 splits into >=2 goods; req-2 -> bad
    by_req = {}
    for r in good:
        by_req.setdefault(r["request_id"], []).append(r)
    assert len(by_req["req-0000"]) == 1
    assert len(by_req["req-0001"]) >= 2
    ordered = sorted(by_req["req-0001"], key=lambda r: r["split_index"])
    recovered = [e for r in ordered for e in json.loads(r["body"])["data"]]
    assert recovered == els
    assert all(r["serialized_size"] < 900 for r in by_req["req-0001"])
    sv = [b for b in bad if b["kind"] == "size_violation"]
    assert len(sv) == 1
    assert "GET requests cannot be split" in sv[0]["expectation"]
    assert sv[0]["maximum_allowed_size_bytes"] == 900
    # JVM to_json byte accounting must match the Python splitter's
    # canonical serialization exactly
    r0 = by_req["req-0000"][0].asDict()
    assert r0["serialized"] == serialize_payload(r0)
    assert r0["serialized_size"] == _utf8_size(r0["serialized"])
