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
from ..config import CollectorConfig, DoNotTrackCookieConfig
from .relational import register
from .tables import table

_CFG = CollectorConfig(
    deterministic_now_ms=1705320000000,
    do_not_track_cookie=DoNotTrackCookieConfig(enabled=True, name="dnt", value="opt-out"),
    paths={"/ice.png": "/i"},
    use_ip_address_as_partition_key=True,
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
