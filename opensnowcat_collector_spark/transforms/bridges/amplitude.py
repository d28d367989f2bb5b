"""T8/F5 Amplitude bridge: origin allowlist + per-event fan-out rewrite.

reference: AmplitudeBridge.scala:56-112 (wildcard origin matching),
:114-269 (request handling, 20 MB cap, per-event fan-out), :271-330
(payload construction).

One HTTP request carries ``{"api_key": ..., "events": [...]}`` and fans
out to N stored events — in Spark that's ``explode`` over the parsed
events array (SURVEY §3.3), then the same JSON-construction toolkit as the
analytics.js bridge per element.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNSTRUCT_SCHEMA = "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0"
PAYLOAD_DATA_SCHEMA = "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4"
AMPLITUDE_EVENT_SCHEMA = "iglu:com.amplitude/payload/jsonschema/1-0-0"
CANONICAL_PATH = "/com.snowplowanalytics.snowplow/tp2"
APP_ID = "amp_bridge"
MAX_REQUEST_BYTES = 20 * 1024 * 1024  # AmplitudeBridge.scala:133

_AMP_RE = r"^/com\.amplitude/2/(httpapi|batch)$"


def is_amplitude(path: Column) -> Column:
    return path.rlike(_AMP_RE)


def origin_allowed(origin: Column, allowed_domains: tuple[str, ...]) -> Column:
    """F5 wildcard origin matching (AmplitudeBridge.scala:56-112):
    '*' allows all; '*.example.com' allows example.com and subdomains;
    exact entries allow the host and its subdomains."""
    if not allowed_domains or "*" in allowed_domains:
        return F.lit(True)
    conds = None
    for d in allowed_domains:
        base = d[2:] if d.startswith("*.") else d
        c = origin.isNotNull() & ((origin == base) | origin.endswith("." + base))
        conds = c if conds is None else (conds | c)
    return F.coalesce(conds, F.lit(False))


def disabled(df: DataFrame) -> DataFrame:
    """Bridge switched off (experimental.enableAmplitudeBridge=false, the
    reference default): Amplitude-path requests fall through as plain
    vendor events — same columns, null/false, no explode."""
    return (
        df.withColumn("is_amplitude", F.lit(False))
        .withColumn("amp_valid", F.lit(None).cast("boolean"))
        .withColumn("amp_events", F.lit(None).cast("array<string>"))
    )


def fan_out(df: DataFrame, allowed_domains: tuple[str, ...] = ()) -> DataFrame:
    """Explode Amplitude batches into one row per event with the rewritten
    Snowplow body.  Non-Amplitude rows pass through untouched with
    ``amp_event_json`` null.

    Returns the input frame with:
      is_amplitude, amp_valid (api_key present + events non-empty + origin
      allowed + size cap), amp_events (array<string> of per-event JSON) —
    the pipeline explodes ``amp_events`` and builds per-event bodies via
    :func:`rewrite_event`.
    """
    matched = is_amplitude(F.col("path")) & (F.col("method") == "POST")
    body = F.col("body")
    api_key = F.get_json_object(body, "$.api_key")
    # JSON array of events as strings: from_json to array<string> keeps each
    # element's raw JSON via get_json_object indexing trick; instead parse
    # into an array of strings with from_json(schema 'array<string>') on the
    # events subtree — Spark renders each object element back to JSON text.
    events_raw = F.get_json_object(body, "$.events")
    events_arr = F.from_json(events_raw, "array<string>")
    size_ok = F.length(F.coalesce(body, F.lit(""))) <= MAX_REQUEST_BYTES
    valid = (
        body.isNotNull()
        & api_key.isNotNull()
        & events_arr.isNotNull()
        & (F.size(events_arr) > 0)
        & origin_allowed(F.col("origin"), allowed_domains)
        & size_ok
    )
    return (
        df.withColumn("is_amplitude", matched)
        .withColumn("amp_valid", F.when(matched, valid))
        .withColumn("amp_events", F.when(matched & valid, events_arr))
    )


def rewrite_event(df: DataFrame, event_col: str = "amp_event") -> DataFrame:
    """Build the per-event Snowplow envelope from one exploded Amplitude
    event JSON string (AmplitudeBridge.scala:160-330):

    - ``ip == "$remote"`` -> substitute the actual client ip;
    - uid/duid/dtm from user_id/device_id/time;
    - tv from library else 'amplitude-unknown'; constants aid/e/p;
    - event wrapped as {"data": event} inside the amplitude payload schema
      inside an unstruct envelope, base64 into ue_px.
    """
    ev = F.col(event_col)
    ip_sub = F.when(
        F.get_json_object(ev, "$.ip") == "$remote",
        # textual substitution keeps the rest of the event JSON untouched
        F.replace(ev, F.lit('"$remote"'), F.concat(F.lit('"'), F.col("ip_address"), F.lit('"'))),
    ).otherwise(ev)

    event_payload = F.concat(
        F.lit('{"schema":"' + UNSTRUCT_SCHEMA + '","data":{"schema":"'),
        F.lit(AMPLITUDE_EVENT_SCHEMA),
        F.lit('","data":{"data":'),
        ip_sub,
        F.lit("}}}"),
    )
    tv = F.coalesce(F.get_json_object(ip_sub, "$.library"), F.lit("amplitude-unknown"))
    tracker_event = F.struct(
        F.lit(APP_ID).alias("aid"),
        F.lit("ue").alias("e"),
        tv.alias("tv"),
        F.lit("app").alias("p"),
        F.base64(F.encode(event_payload, "UTF-8")).alias("ue_px"),
        F.col("network_user_id").alias("tnuid"),
        F.get_json_object(ip_sub, "$.user_id").alias("uid"),
        F.get_json_object(ip_sub, "$.device_id").alias("duid"),
        F.get_json_object(ip_sub, "$.time").alias("dtm"),
    )
    envelope = F.to_json(
        F.struct(
            F.lit(PAYLOAD_DATA_SCHEMA).alias("schema"),
            F.array(tracker_event).alias("data"),
        ),
        {"ignoreNullFields": "true"},
    )
    return df.withColumn("amp_body", envelope).withColumn("amp_path", F.lit(CANONICAL_PATH))
