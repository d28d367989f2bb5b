"""Collector dataflow operators exposed in the graded query gate.

Synthesizes a deterministic raw-request DataFrame from the ``events``
table (pure column expressions — no extra input data), runs the REAL
pipeline ``enrich`` stage (transforms T1-T6, F1, F3, F6 from SURVEY §2),
and projects the decision columns.  The DuckDB oracle replicates the
transform semantics directly over ``events``, so this is an end-to-end
parity check of the collector logic itself, not just of the relational
toolkit it is built from.

reference semantics verified here:
- T1 nuid resolution order (CollectorService.scala:133-141,539-547):
  SP-Anonymous -> zero UUID; else ``nuid`` query param; else cookie.
- T2 ip fallback + partition key (CollectorService.scala:520-532).
- T3 path mapping (CollectorService.scala:102-108).
- T4/F3 querystring parse + percent-encoding validation
  (CollectorService.scala:184-199).
- S3 redirect detection (CollectorService.scala:131).
- F1 do-not-track regex cookie (model.scala:69-72).
- F6 header scrubbing incl. SP-Anonymous extras (CollectorService.scala:466-478).
- T5 Set-Cookie suppression under DNT/anonymous (CollectorService.scala:401-434).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline
from ..config import CollectorConfig, CookieBounceConfig, DoNotTrackCookieConfig
from .relational import register
from .tables import table

_CFG = CollectorConfig(
    deterministic_now_ms=1705320000000,
    do_not_track_cookie=DoNotTrackCookieConfig(enabled=True, name="dnt", value="opt-out"),
    paths={"/ice.png": "/i"},
    use_ip_address_as_partition_key=True,
    # the roundtrip query exercises both bridges (reference default is
    # off; enabled here exactly like the reference's bridge test configs)
    enable_analyticsjs_bridge=True,
    enable_amplitude_bridge=True,
)

# DuckDB replica of identity._uuid_expr's deterministic v4-shaped UUID.
_DUCK_UUID = (
    "substr(md5(request_id),1,8) || '-' || substr(md5(request_id),9,4)"
    " || '-4' || substr(md5(request_id),14,3)"
    " || '-8' || substr(md5(request_id),18,3)"
    " || '-' || substr(md5(request_id),21,12)"
)

_ORACLE = f"""
WITH r AS (
  SELECT 'ev-' || CAST(event_id AS VARCHAR) AS request_id,
         user_id, event_type
  FROM events
)
SELECT request_id,
       CASE WHEN user_id % 7 = 0 THEN '00000000-0000-0000-0000-000000000000'
            WHEN user_id % 7 = 1 AND user_id % 17 <> 0
                 THEN 'ck-' || CAST(user_id AS VARCHAR)
            ELSE 'u-' || CAST(user_id AS VARCHAR) END AS network_user_id,
       CASE WHEN user_id % 13 = 0 THEN 'unknown'
            ELSE '10.0.' || CAST(user_id % 250 AS VARCHAR) || '.7' END AS ip_address,
       CASE WHEN user_id % 13 = 0 THEN {_DUCK_UUID}
            ELSE '10.0.' || CAST(user_id % 250 AS VARCHAR) || '.7' END AS partition_key,
       CASE WHEN user_id % 5 = 2 THEN '/r/track' ELSE '/i' END AS mapped_path,
       user_id % 5 = 2 AS is_redirect,
       user_id % 17 <> 0 AS qs_valid,
       CASE WHEN user_id % 17 = 0 THEN NULL ELSE event_type END AS param_e,
       CAST(CASE WHEN user_id % 7 = 0 THEN 1 ELSE 2 END AS INTEGER) AS n_headers,
       user_id % 11 = 0 AS do_not_track,
       NOT (user_id % 11 = 0 OR user_id % 7 = 0) AS has_set_cookie
FROM r
"""


@register("collector_enrich_events", oracle=_ORACLE)
def collector_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> synthetic raw HTTP requests -> REAL pipeline.enrich ->
    decision columns.  Shuffle-free narrow plan (the enrich stage is pure
    projections/filters), identical at any scale."""
    e = table(spark, sf_dir, "events")
    uid = F.col("user_id")
    uid_s = uid.cast("string")
    et = F.col("event_type")

    qs = (
        F.when(uid % 17 == 0, F.concat(F.lit("e=%zz&nuid=u-"), uid_s))
        .when(uid % 7 == 1, F.concat(F.lit("e="), et))
        .otherwise(F.concat(F.lit("e="), et, F.lit("&nuid=u-"), uid_s))
    )
    base_cookies = F.create_map(F.lit("sp"), F.concat(F.lit("ck-"), uid_s))
    cookies = F.when(
        uid % 11 == 0,
        F.map_concat(base_cookies, F.create_map(F.lit("dnt"), F.lit("opt-out"))),
    ).otherwise(base_cookies)

    raw = e.select(
        F.concat(F.lit("ev-"), F.col("event_id").cast("string")).alias("request_id"),
        F.lit("GET").alias("method"),
        F.when(uid % 5 == 0, F.lit("/ice.png"))
        .when(uid % 5 == 2, F.lit("/r/track"))
        .otherwise(F.lit("/i"))
        .alias("path"),
        qs.alias("querystring"),
        F.lit(None).cast("string").alias("body"),
        F.lit("UA").alias("user_agent"),
        F.lit(None).cast("string").alias("referer_uri"),
        F.lit("collector.local").alias("hostname"),
        F.when(uid % 13 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("10.0."), (uid % 250).cast("string"), F.lit(".7")))
        .alias("remote_ip"),
        F.array(
            F.lit("User-Agent: UA"),
            F.lit("X-Forwarded-For: 9.9.9.9"),
            F.lit("Raw-Request-URI: /x"),
        ).alias("headers"),
        F.lit(None).cast("string").alias("origin"),
        cookies.alias("cookies"),
        F.lit(None).cast("string").alias("content_type"),
        F.when(uid % 7 == 0, F.lit("*")).otherwise(F.lit(None).cast("string")).alias(
            "sp_anonymous"
        ),
        F.col("ts").alias("request_time"),
    )
    enriched = pipeline.enrich(raw, _CFG)
    return enriched.select(
        "request_id",
        "network_user_id",
        "ip_address",
        "partition_key",
        "mapped_path",
        "is_redirect",
        "qs_valid",
        F.col("query_params")["e"].alias("param_e"),
        F.size("scrubbed_headers").alias("n_headers"),
        "do_not_track",
        F.col("set_cookie").isNotNull().alias("has_set_cookie"),
    )


# ---------------------------------------------------------------------------
# T7/T8 bridge round-trip: synthesize Segment + Amplitude requests from
# events, run the REAL pipeline (enrich + build_events, incl. the
# amplitude explode fan-out), then extract every constructed envelope
# field back out (incl. unbase64'ing ue_px) and compare to the oracle's
# directly-computed truth.
# ---------------------------------------------------------------------------

_BRIDGE_ORACLE = """
WITH seg AS (
  SELECT 'ev-' || CAST(event_id AS VARCHAR) AS request_id,
         user_id, event_id, event_type
  FROM events WHERE user_id % 2 = 0
), amp AS (
  SELECT 'ev-' || CAST(e.event_id AS VARCHAR) AS request_id,
         e.user_id, e.event_id, e.ts, sub.sfx
  FROM events e CROSS JOIN (VALUES ('a'), ('b')) AS sub(sfx)
  WHERE e.user_id % 2 = 1
)
SELECT request_id,
       '/com.snowplowanalytics.snowplow/tp2' AS path,
       'ajs_bridge' AS aid, 'ue' AS e_param, 'web' AS p_param,
       '1.2.3' AS tv,
       'u-' || CAST(user_id AS VARCHAR) AS tnuid,
       'su' || CAST(user_id AS VARCHAR) AS uid_param,
       'anon-' || CAST(user_id AS VARCHAR) AS duid,
       CAST(NULL AS VARCHAR) AS dtm,
       'https://site/' || event_type AS url,
       'pg-' || CAST(event_id AS VARCHAR) AS page,
       'en-US' AS lang,
       'iglu:com.segment/page/jsonschema/2-0-0' AS inner_schema,
       CAST(NULL AS VARCHAR) AS inner_ip
FROM seg
UNION ALL
SELECT request_id,
       '/com.snowplowanalytics.snowplow/tp2' AS path,
       'amp_bridge' AS aid, 'ue' AS e_param, 'app' AS p_param,
       'amplitude-js/8.0' AS tv,
       'u-' || CAST(user_id AS VARCHAR) AS tnuid,
       'au' || CAST(user_id AS VARCHAR) || '-' || sfx AS uid_param,
       'd' || CAST(user_id AS VARCHAR) || '-' || sfx AS duid,
       CAST(epoch_ms(ts) AS VARCHAR) AS dtm,
       CAST(NULL AS VARCHAR) AS url,
       CAST(NULL AS VARCHAR) AS page,
       CAST(NULL AS VARCHAR) AS lang,
       'iglu:com.amplitude/payload/jsonschema/1-0-0' AS inner_schema,
       '10.0.' || CAST(user_id % 250 AS VARCHAR) || '.7' AS inner_ip
FROM amp
"""


@register("collector_bridge_roundtrip", oracle=_BRIDGE_ORACLE)
def collector_bridge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment (T7) and Amplitude (T8, 2-event fan-out) requests through
    the full pipeline; every envelope field is then re-extracted from the
    produced body — aid/e/p constants, tv, uid/duid/dtm lifts, url/page/
    locale lifts, and the base64 ue_px inner payload (schema + substituted
    $remote ip).  Narrow plan + one explode; no shuffle."""
    e = table(spark, sf_dir, "events")
    uid = F.col("user_id")
    uid_s = uid.cast("string")
    eid_s = F.col("event_id").cast("string")
    ip = F.concat(F.lit("10.0."), (uid % 250).cast("string"), F.lit(".7"))
    ms = F.unix_millis(F.col("ts")).cast("string")

    seg_body = F.concat(
        F.lit('{"userId":"su'), uid_s,
        F.lit('","properties":{"url":"https://site/'), F.col("event_type"),
        F.lit('","page":"pg-'), eid_s,
        F.lit('"},"context":{"library":{"version":"1.2.3"},"locale":"en-US","timezone":"UTC"}}'),
    )

    def amp_event(sfx: str):
        return F.concat(
            F.lit('{"device_id":"d'), uid_s, F.lit(f'-{sfx}'),
            F.lit('","user_id":"au'), uid_s, F.lit(f'-{sfx}'),
            F.lit('","time":'), ms,
            F.lit(',"ip":"$remote","library":"amplitude-js/8.0"}'),
        )

    amp_body = F.concat(
        F.lit('{"api_key":"k","events":['), amp_event("a"), F.lit(","), amp_event("b"), F.lit("]}")
    )

    is_seg = uid % 2 == 0
    raw = e.select(
        F.concat(F.lit("ev-"), eid_s).alias("request_id"),
        F.lit("POST").alias("method"),
        F.when(is_seg, F.lit("/com.segment/v1/p"))
        .otherwise(F.lit("/com.amplitude/2/httpapi"))
        .alias("path"),
        F.concat(F.lit("nuid=u-"), uid_s).alias("querystring"),
        F.when(is_seg, seg_body).otherwise(amp_body).alias("body"),
        F.lit("UA").alias("user_agent"),
        F.lit(None).cast("string").alias("referer_uri"),
        F.lit("collector.local").alias("hostname"),
        ip.alias("remote_ip"),
        F.array().cast("array<string>").alias("headers"),
        F.lit(None).cast("string").alias("origin"),
        F.when(
            is_seg, F.create_map(F.lit("ajs_anonymous_id"), F.concat(F.lit("anon-"), uid_s))
        ).otherwise(F.create_map().cast("map<string,string>")).alias("cookies"),
        F.lit("application/json").alias("content_type"),
        F.lit(None).cast("string").alias("sp_anonymous"),
        F.col("ts").alias("request_time"),
    )
    res = pipeline.run(raw, _CFG)
    body = F.col("body")
    d0 = "$.data[0]."
    ue_px = F.decode(F.unbase64(F.get_json_object(body, d0 + "ue_px")), "UTF-8")
    return res.good.select(
        "request_id",
        "path",
        F.get_json_object(body, d0 + "aid").alias("aid"),
        F.get_json_object(body, d0 + "e").alias("e_param"),
        F.get_json_object(body, d0 + "p").alias("p_param"),
        F.get_json_object(body, d0 + "tv").alias("tv"),
        F.get_json_object(body, d0 + "tnuid").alias("tnuid"),
        F.get_json_object(body, d0 + "uid").alias("uid_param"),
        F.get_json_object(body, d0 + "duid").alias("duid"),
        F.get_json_object(body, d0 + "dtm").alias("dtm"),
        F.get_json_object(body, d0 + "url").alias("url"),
        F.get_json_object(body, d0 + "page").alias("page"),
        F.get_json_object(body, d0 + "lang").alias("lang"),
        F.get_json_object(ue_px, "$.data.schema").alias("inner_schema"),
        F.get_json_object(ue_px, "$.data.data.data.ip").alias("inner_ip"),
    )


# ---------------------------------------------------------------------------
# Structured Streaming under the oracle gate: the hourly rollup computed
# by an actual streaming query (file source -> watermark -> tumbling
# window -> memory sink), hash-compared to the same SQL as the batch twin.
# ---------------------------------------------------------------------------

_STREAMING_ROLLUP_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
FROM events
GROUP BY 1, 2
"""

_STREAM_Q_SEQ = [0]


@register("streaming_hourly_rollup", oracle=_STREAMING_ROLLUP_ORACLE)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events replayed through a REAL streaming query: parquet file
    source -> 1h watermark -> tumbling window agg -> memory sink
    (availableNow drains everything, so the complete result equals the
    batch rollup and the DuckDB oracle).  This puts the Structured
    Streaming execution path itself under the correctness gate."""
    import tempfile

    from .streaming_queries import ROCKSDB_PROVIDER, _stream_table
    from .tables import normalize_event_ts

    # match _drain_to_memory: the driver's bare session must run the
    # graded streaming path on the production RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    batch = table(spark, sf_dir, "events")
    src = normalize_event_ts(_stream_table(spark, sf_dir, "events"))
    _STREAM_Q_SEQ[0] += 1
    qname = f"stream_rollup_{_STREAM_Q_SEQ[0]}"
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double") / 100.0
            ).alias("total_value"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_rollup_")
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    from .streaming_queries import _await_drain

    try:
        _await_drain(q, "streaming_hourly_rollup")
    finally:
        # same no-leak discipline as streaming_queries._drain_to_memory:
        # RocksDB state files per run would otherwise accumulate in /tmp
        # forever across sweep/bench/driver rounds
        if not q.isActive:
            import shutil

            shutil.rmtree(ckpt, ignore_errors=True)
    assert batch is not None  # keep the batch loader exercised for schema parity
    return spark.table(qname).select(
        F.col("w.start").alias("hour_start"),
        "event_type",
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# F2 cookie bounce under the oracle gate: bounce-enabled config, requests
# with/without resolvable nuid.
# ---------------------------------------------------------------------------

_BOUNCE_CFG = CollectorConfig(
    deterministic_now_ms=1705320000000,
    cookie_bounce=CookieBounceConfig(enabled=True),
)

_BOUNCE_ORACLE = f"""
SELECT 'ev-' || CAST(event_id AS VARCHAR) AS request_id,
       -- bounce iff nuid unresolvable (no qs nuid, no cookie), not already
       -- bouncing (n3pc), pixel GET, not a redirect
       (user_id % 3 = 0 AND user_id % 4 <> 0 AND user_id % 5 <> 2) AS bounce,
       CASE WHEN user_id % 3 = 0 AND user_id % 4 = 0
                 THEN '00000000-0000-0000-0000-000000000000'  -- bouncing: fallback nuid
            WHEN user_id % 3 = 0 THEN {_DUCK_UUID}                  -- deterministic md5-derived uuid
            ELSE 'u-' || CAST(user_id AS VARCHAR) END AS resolved_nuid,
       user_id % 4 = 0 AS already_bouncing
FROM (SELECT 'ev-' || CAST(event_id AS VARCHAR) AS request_id, user_id, event_id FROM events) r
"""


@register("collector_bounce_events", oracle=_BOUNCE_ORACLE)
def collector_bounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 cookie-bounce semantics (CollectorService.scala:134-141) through
    the real enrich stage: bounce fires only for pixel GETs with an
    unresolvable nuid that aren't already carrying the n3pc marker and
    aren't redirects.  deterministic_now_ms freezes the fresh-uuid branch
    so ALL nuid outcomes (fallback / md5-uuid / qs) are oracle-exact."""
    e = table(spark, sf_dir, "events")
    uid = F.col("user_id")
    uid_s = uid.cast("string")

    # uid%3==0: no nuid anywhere (bounce candidates); others carry qs nuid.
    # uid%4==0: already bouncing (n3pc=true in qs).
    # uid%5==2: redirect path (never bounces).
    qs = (
        F.when((uid % 3 == 0) & (uid % 4 == 0), F.lit("e=pv&n3pc=true"))
        .when(uid % 3 == 0, F.lit("e=pv"))
        .when(uid % 4 == 0, F.concat(F.lit("e=pv&n3pc=true&nuid=u-"), uid_s))
        .otherwise(F.concat(F.lit("e=pv&nuid=u-"), uid_s))
    )
    raw = e.select(
        F.concat(F.lit("ev-"), F.col("event_id").cast("string")).alias("request_id"),
        F.lit("GET").alias("method"),
        F.when(uid % 5 == 2, F.lit("/r/track")).otherwise(F.lit("/i")).alias("path"),
        qs.alias("querystring"),
        F.lit(None).cast("string").alias("body"),
        F.lit("UA").alias("user_agent"),
        F.lit(None).cast("string").alias("referer_uri"),
        F.lit("collector.local").alias("hostname"),
        F.lit("10.0.0.1").alias("remote_ip"),
        F.array().cast("array<string>").alias("headers"),
        F.lit(None).cast("string").alias("origin"),
        F.create_map().cast("map<string,string>").alias("cookies"),
        F.lit(None).cast("string").alias("content_type"),
        F.lit(None).cast("string").alias("sp_anonymous"),
        F.col("ts").alias("request_time"),
    )
    enriched = pipeline.enrich(raw, _BOUNCE_CFG)
    # deterministic_now_ms freezes the fresh-uuid branch to an md5-derived
    # v4-shaped uuid of request_id, which the oracle reproduces exactly
    return enriched.select(
        "request_id",
        "bounce",
        F.col("network_user_id").alias("resolved_nuid"),
        F.col("qs_bouncing").alias("already_bouncing"),
    )
