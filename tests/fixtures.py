"""Raw-request fixtures for collector-pipeline tests (FIXTURES.md §1),
modeled on the reference's test corpus (CollectorServiceSpec /
AnalyticsJsFixture / AmplitudeFixture shapes, re-authored)."""

from __future__ import annotations

import datetime
import json

SEGMENT_PAGE_BODY = json.dumps(
    {
        "type": "page",
        "userId": "user-1",
        "anonymousId": "anon-1",
        "properties": {"url": "https://example.com/pricing", "page": "Pricing"},
        "context": {
            "locale": "en-US",
            "timezone": "Europe/Amsterdam",
            "library": {"name": "analytics.js", "version": "next-1.51.3"},
        },
    },
    separators=(",", ":"),
)

AMPLITUDE_BATCH_BODY = json.dumps(
    {
        "api_key": "test-api-key",
        "events": [
            {
                "device_id": "dev-1",
                "user_id": "amp-user-1",
                "time": 1700000000001,
                "event_type": "watch_tutorial",
                "ip": "$remote",
                "library": "amplitude-ts/2.9.2",
                "insert_id": "ins-1",
            },
            {
                "device_id": "dev-2",
                "time": 1700000000002,
                "event_type": "$identify",
                "ip": "203.0.113.9",
                "insert_id": "ins-2",
            },
        ],
    },
    separators=(",", ":"),
)

TRACKER_BATCH_BODY = json.dumps(
    {
        "schema": "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4",
        "data": [
            {"e": "pv", "aid": "site", "tv": "js-3.5.0", "p": "web", "url": "https://x.test/a"},
            {"e": "pv", "aid": "site", "tv": "js-3.5.0", "p": "web", "url": "https://x.test/b"},
        ],
    },
    separators=(",", ":"),
)

T0 = datetime.datetime(2024, 1, 15, 12, 0, 0)


def _req(i: int, **kw) -> dict:
    base = {
        "request_id": f"req-{i:04d}",
        "method": "GET",
        "path": "/i",
        "querystring": "e=pv&aid=site",
        "body": None,
        "user_agent": "Mozilla/5.0 test",
        "referer_uri": "https://ref.example/page",
        "hostname": "collector.example.com",
        "remote_ip": "198.51.100.7",
        "headers": [
            "User-Agent: Mozilla/5.0 test",
            "X-Forwarded-For: 198.51.100.7",
            "Cookie: sp=abc",
            "Remote-Address: 10.0.0.1",
            "Raw-Request-URI: /i?e=pv",
        ],
        "origin": "shop.example.com",
        "cookies": {"sp": "11111111-1111-4111-8111-111111111111"},
        "content_type": None,
        "sp_anonymous": None,
        "request_time": T0 + datetime.timedelta(seconds=i),
    }
    base.update(kw)
    return base


def raw_requests() -> list[dict]:
    return [
        _req(0),  # pixel GET with cookie nuid
        _req(1, querystring="e=pv&nuid=22222222-2222-4222-8222-222222222222"),  # qs nuid
        _req(2, cookies={}, querystring="e=pv"),  # no nuid anywhere -> uuid
        _req(3, sp_anonymous="*"),  # anonymous -> zero uuid + header scrub
        _req(
            4,
            method="POST",
            path="/com.snowplowanalytics.snowplow/tp2",
            body=TRACKER_BATCH_BODY,
            content_type="application/json",
            querystring=None,
        ),
        _req(5, path="/r/tp2", querystring="u=https%3A%2F%2Fdest.example%2Fland&e=pv"),
        _req(6, querystring="bad=%zz"),  # illegal percent-encoding -> generic_error
        _req(
            7,
            method="POST",
            path="/com.segment/v1/p",
            body=SEGMENT_PAGE_BODY,
            content_type="text/plain",
            cookies={"ajs_anonymous_id": "anon-cookie", "ajs_user_id": "user-cookie"},
            querystring=None,
        ),
        _req(
            8,
            method="POST",
            path="/com.amplitude/2/httpapi",
            body=AMPLITUDE_BATCH_BODY,
            content_type="application/json",
            querystring=None,
        ),
        _req(9, path="/health"),  # ops endpoint -> no event
        _req(10, path="/ice.png", cookies={"dnt": "1", "sp": "abc"}),  # DNT cookie test
        _req(11, method="OPTIONS", path="/com.snowplowanalytics.snowplow/tp2"),  # CORS preflight
        _req(12, remote_ip=None, cookies={}),  # unknown ip
        # duplicate querystring key (?e=pv&e=pp): pekko Uri.Query accepts
        # duplicates; str_to_map must not abort the batch (LAST_WIN policy)
        _req(13, querystring="e=pv&e=pp&aid=site"),
    ]
