"""X1 telemetry heartbeat: self-describing oss_context payload on an
interval.

reference: core/.../telemetry/TelemetryAkkaService.scala:63-101 (interval
POST of a cached payload) and telemetry/package.scala:25-62 (payload
fields).  In Spark the schedule belongs to an external cron or a
StreamingQueryListener tick; this module owns payload construction and a
single-POST sender with an injectable transport (no network in tests).
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Callable

from ..config import CollectorConfig

OSS_CONTEXT_SCHEMA = "iglu:com.snowplowanalytics.oss/oss_context/jsonschema/1-0-1"
PAYLOAD_DATA_SCHEMA = "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4"


def build_telemetry_payload(
    cfg: CollectorConfig,
    user_provided_id: str | None = None,
    instance_id: str | None = None,
    region: str | None = None,
    cloud: str | None = None,
) -> dict:
    """The oss_context event wrapped in a payload_data envelope, mirroring
    telemetry/package.scala:25-62 field-for-field (appGeneratedId is fresh
    per process, like the reference's applicationId)."""
    ctx = {
        "schema": OSS_CONTEXT_SCHEMA,
        "data": {
            "userProvidedId": user_provided_id,
            "moduleName": "collector-spark",
            "moduleVersion": None,
            "instanceId": instance_id,
            "appGeneratedId": str(uuid.uuid4()),
            "cloud": cloud,
            "region": region,
            "applicationName": cfg.app_name,
            "applicationVersion": cfg.app_version,
        },
    }
    return {
        "schema": PAYLOAD_DATA_SCHEMA,
        "data": [
            {
                "e": "ue",
                "aid": cfg.app_name,
                "p": "srv",
                "tv": f"{cfg.app_name}-{cfg.app_version}",
                "ue_pr": json.dumps(
                    {
                        "schema": "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0",
                        "data": ctx,
                    }
                ),
            }
        ],
    }


def send_heartbeat(
    cfg: CollectorConfig,
    url: str | None = None,
    post: Callable[[str, bytes], int] | None = None,
    **payload_kw,
) -> int:
    """One heartbeat POST; transport injectable (tests never hit the
    network).  Returns the HTTP status, or -1 when telemetry is disabled
    by config (reference: TelemetryAkkaService gates on !disable).  The
    endpoint defaults to the configured telemetry url/port/secure."""
    if cfg.telemetry.disable:
        return -1
    if url is None:
        url = cfg.telemetry.endpoint
    body = json.dumps(build_telemetry_payload(cfg, **payload_kw)).encode("utf-8")
    if post is None:
        from urllib.request import Request, urlopen  # noqa: PLC0415

        def post(u: str, b: bytes) -> int:
            with urlopen(
                Request(u, data=b, headers={"Content-Type": "application/json"}),
                timeout=30,
            ) as resp:
                return resp.status

    return post(url, body)
