"""T7 analytics.js (Segment) payload rewrite.

reference: AnalyticsJsBridge.scala:28-169.  Requests arrive on
``/com.segment/v1/{i,t,p,s,g,a}``; the body is a Segment JSON event.  The
bridge rewrites it into a Snowplow ``payload_data/1-0-4`` envelope whose
single tracker event carries the original body base64-wrapped inside an
``unstruct_event`` (``ue_px``), and the canonical path becomes
``/com.snowplowanalytics.snowplow/tp2``.

Everything is JVM-side JSON expression work: get_json_object probing,
to_json/named-struct construction, base64 — no UDFs (SURVEY §2.3 T7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNSTRUCT_SCHEMA = "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0"
PAYLOAD_DATA_SCHEMA = "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4"
CANONICAL_PATH = "/com.snowplowanalytics.snowplow/tp2"
APP_ID = "ajs_bridge"

# path segment -> (event type, Iglu schema) — AnalyticsJsBridge.scala:42-50,96-103
SEGMENT_EVENT_SCHEMAS = {
    "i": ("identify", "iglu:com.segment/identify/jsonschema/1-0-0"),
    "t": ("track", "iglu:com.segment/track/jsonschema/1-0-0"),
    "p": ("page", "iglu:com.segment/page/jsonschema/2-0-0"),
    "s": ("screen", "iglu:com.segment/screen/jsonschema/2-0-0"),
    "g": ("group", "iglu:com.segment/group/jsonschema/2-0-0"),
    "a": ("alias", "iglu:com.segment/alias/jsonschema/2-0-0"),
}

_SEG_RE = r"^/com\.segment/v1/([itpsga])$"


def is_analyticsjs(path: Column) -> Column:
    return path.rlike(_SEG_RE)


def _event_schema_expr(seg: Column) -> Column:
    mapping = F.create_map(
        *[F.lit(x) for k, (_, schema) in SEGMENT_EVENT_SCHEMAS.items() for x in (k, schema)]
    )
    return mapping[seg]


def disabled(df: DataFrame) -> DataFrame:
    """Bridge switched off (experimental.enableAnalyticsJsBridge=false,
    the reference default): Segment-path requests fall through as plain
    /{vendor}/{version} events — same columns, all null/false, so the
    pipeline's coalesces keep the original body/path untouched."""
    return (
        df.withColumn("is_analyticsjs", F.lit(False))
        .withColumn("ajs_valid", F.lit(None).cast("boolean"))
        .withColumn("ajs_body", F.lit(None).cast("string"))
        .withColumn("ajs_path", F.lit(None).cast("string"))
        .withColumn("ajs_content_type", F.lit(None).cast("string"))
    )


def rewrite(df: DataFrame) -> DataFrame:
    """Adds ``ajs_body`` (the rewritten payload_data envelope),
    ``ajs_path`` (canonical tp2 path), and ``ajs_content_type``
    (text/plain normalized to application/json) for rows matching the
    Segment route; null elsewhere.  The pipeline coalesces these over the
    originals.

    Field mapping (AnalyticsJsBridge.scala:118-159):
      uid  <- ajs_user_id cookie, else body.userId
      duid <- ajs_anonymous_id cookie
      url/page <- properties.url/page ; lang/tz <- context.locale/timezone
      tv   <- context.library.version (required — rows without it are
              rejected upstream; here they yield null tv and are routed bad
              by the pipeline's bridge-validity predicate)
    """
    seg = F.regexp_extract(F.col("path"), _SEG_RE, 1)
    matched = is_analyticsjs(F.col("path")) & (F.col("method") == "POST")
    body = F.col("body")

    # Splice the raw body into the unstruct envelope textually so the
    # embedded event stays JSON (to_json of a string column would quote it).
    event_payload = F.concat(
        F.lit('{"schema":"' + UNSTRUCT_SCHEMA + '","data":{"schema":"'),
        _event_schema_expr(seg),
        F.lit('","data":'),
        body,
        F.lit("}}"),
    )

    tv = F.get_json_object(body, "$.context.library.version")
    uid = F.coalesce(F.col("cookies")["ajs_user_id"], F.get_json_object(body, "$.userId"))
    duid = F.col("cookies")["ajs_anonymous_id"]

    tracker_event = F.struct(
        F.lit(APP_ID).alias("aid"),
        F.lit("ue").alias("e"),
        tv.alias("tv"),
        F.lit("web").alias("p"),
        F.base64(F.encode(event_payload, "UTF-8")).alias("ue_px"),
        F.col("network_user_id").alias("tnuid"),
        F.get_json_object(body, "$.properties.url").alias("url"),
        F.get_json_object(body, "$.properties.page").alias("page"),
        F.get_json_object(body, "$.context.locale").alias("lang"),
        F.get_json_object(body, "$.context.timezone").alias("tz"),
        uid.alias("uid"),
        duid.alias("duid"),
    )
    envelope = F.to_json(
        F.struct(
            F.lit(PAYLOAD_DATA_SCHEMA).alias("schema"),
            F.array(tracker_event).alias("data"),
        ),
        {"ignoreNullFields": "true"},
    )
    return (
        df.withColumn("is_analyticsjs", matched)
        .withColumn("ajs_valid", F.when(matched, body.isNotNull() & tv.isNotNull()))
        .withColumn("ajs_body", F.when(matched & tv.isNotNull(), envelope))
        .withColumn("ajs_path", F.when(matched, F.lit(CANONICAL_PATH)))
        .withColumn(
            "ajs_content_type",
            F.when(
                matched,
                F.replace(
                    F.lower(F.coalesce(F.col("content_type"), F.lit("application/json"))),
                    F.lit("text/plain"),
                    F.lit("application/json"),
                ),
            ),
        )
    )
