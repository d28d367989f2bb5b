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


def _origin_allowed_frag(allowed_domains: tuple[str, ...]) -> str:
    """``origin_allowed`` as a SQL fragment (same tree, see ``sqlfrag``)."""
    from ...sqlfrag import sql_str

    if not allowed_domains or "*" in allowed_domains:
        return "true"
    conds = []
    for d in allowed_domains:
        base = d[2:] if d.startswith("*.") else d
        conds.append(
            f"(origin IS NOT NULL AND (origin = {sql_str(base)}"
            f" OR endswith(origin, {sql_str('.' + base)})))"
        )
    return f"coalesce({' OR '.join(conds)}, false)"


def disabled(df: DataFrame) -> DataFrame:
    """Bridge switched off (experimental.enableAmplitudeBridge=false, the
    reference default): Amplitude-path requests fall through as plain
    vendor events — same columns, null/false, no explode."""
    return df.withColumns(
        {
            "is_amplitude": F.lit(False),
            "amp_valid": F.expr("cast(NULL as boolean)"),
            "amp_events": F.expr("cast(NULL as array<string>)"),
        }
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

    Built as parsed SQL fragments (``sqlfrag``, optimization r14).
    """
    from ...sqlfrag import sql_str

    matched = f"(path rlike {sql_str(_AMP_RE)} AND method = 'POST')"
    # JSON array of events as strings: from_json to array<string> keeps each
    # element's raw JSON via get_json_object indexing trick; instead parse
    # into an array of strings with from_json(schema 'array<string>') on the
    # events subtree — Spark renders each object element back to JSON text.
    events_arr = "from_json(get_json_object(body, '$.events'), 'array<string>')"
    valid = (
        "(body IS NOT NULL"
        " AND get_json_object(body, '$.api_key') IS NOT NULL"
        f" AND {events_arr} IS NOT NULL"
        f" AND size({events_arr}) > 0"
        f" AND {_origin_allowed_frag(allowed_domains)}"
        f" AND length(coalesce(body, '')) <= {MAX_REQUEST_BYTES})"
    )
    return df.withColumns(
        {
            "is_amplitude": F.expr(matched),
            "amp_valid": F.expr(f"CASE WHEN {matched} THEN {valid} END"),
            "amp_events": F.expr(
                f"CASE WHEN {matched} AND {valid} THEN {events_arr} END"
            ),
        }
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
    from ...sqlfrag import sql_str

    ev = event_col
    remote_quoted = sql_str('"$remote"')
    # textual substitution keeps the rest of the event JSON untouched
    ip_sub = (
        f"CASE WHEN get_json_object({ev}, '$.ip') = '$remote'"
        f" THEN replace({ev}, {remote_quoted},"
        " concat('\"', ip_address, '\"'))"
        f" ELSE {ev} END"
    )
    head = (
        '{"schema":"' + UNSTRUCT_SCHEMA + '","data":{"schema":"'
        + AMPLITUDE_EVENT_SCHEMA + '","data":{"data":'
    )
    tail = sql_str("}" * 3)
    event_payload = f"concat({sql_str(head)}, {ip_sub}, {tail})"
    tracker_event = (
        "named_struct("
        f"'aid', {sql_str(APP_ID)},"
        " 'e', 'ue',"
        f" 'tv', coalesce(get_json_object({ip_sub}, '$.library'), 'amplitude-unknown'),"
        " 'p', 'app',"
        f" 'ue_px', base64(encode({event_payload}, 'UTF-8')),"
        " 'tnuid', network_user_id,"
        f" 'uid', get_json_object({ip_sub}, '$.user_id'),"
        f" 'duid', get_json_object({ip_sub}, '$.device_id'),"
        f" 'dtm', get_json_object({ip_sub}, '$.time'))"
    )
    envelope = (
        f"to_json(named_struct('schema', {sql_str(PAYLOAD_DATA_SCHEMA)},"
        f" 'data', array({tracker_event})), map('ignoreNullFields', 'true'))"
    )
    return df.withColumns(
        {"amp_body": F.expr(envelope), "amp_path": F.lit(CANONICAL_PATH)}
    )
