"""The collector dataflow: raw requests DataFrame -> (good, bad) DataFrames.

Mirrors the reference's request path (SURVEY §3.1): route/filter ->
identity resolution -> bridge rewrites -> buildEvent -> split/serialize ->
good/bad routing.  The same function serves batch fixtures and Structured
Streaming input (the plan is identical; streaming/ wires the triggers).

Flow (all single-pass column expressions; one Python stage for the rare
oversized-payload split):

    raw ─ path mapping ─ qs parse/validate ─ nuid ─ ip/pk ─ DNT/bounce
        ─ header scrub ─ bridge rewrites (segment/amplitude explode)
        ─ buildEvent columns ─ size routing ─ split(mapInPandas, oversized
        subset only) ─ union -> good | bad

Scale: the pipeline is shuffle-free end-to-end (narrow transformations
only — even the amplitude explode is per-row fan-out).  Sink partitioning
is by ``partition_key``, exactly the reference's Kinesis/Kafka keying.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import COLLECTOR_PAYLOAD_SCHEMA, CollectorConfig
from .transforms import badrows, identity, paths, privacy, split
from .transforms.bridges import amplitude, analyticsjs

#: event endpoints served by the collector (SURVEY §2.1); anything else is
#: an ops endpoint or 404 and produces no event.
_EVENT_PATH_RE = (
    r"^(/r/.*|/i|/ice\.png|/com\.snowplowanalytics\.snowplow/tp2"
    r"|/com\.segment/v1/[itpsga]|/com\.amplitude/2/(httpapi|batch)|/[^/]+/[^/]+)$"
)
_OPS_PATH_RE = r"^/(health|sink-health|crossdomain\.xml|robots\.txt|)$"


@dataclass
class PipelineResult:
    enriched: DataFrame  # pre-split, all decision columns (for response building)
    good: DataFrame  # canonical collector payloads (struct columns + serialized)
    bad: DataFrame  # BAD_ROW_SCHEMA rows
    #: raw split-stage output (SPLIT_OUT_SCHEMA rows, oversized subset
    #: only) — kept so per-request split accounting (the
    #: collector_split_accounting gate) can attribute bad rows to their
    #: request_id, which the BAD_ROW_SCHEMA rows deliberately do not carry
    split_out: DataFrame | None = None
    #: the same split-stage output BEFORE the shared localCheckpoint —
    #: diagnostic handle only (the checkpoint renders the Python stage as
    #: an ExistingRDD scan in SQL plans, so plan pins inspect this one)
    split_out_raw: DataFrame | None = None


def enrich(raw: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """Steps 1-3 of the request lifecycle as one narrow projection chain."""
    df = paths.apply_path_mapping(raw, cfg)
    df = paths.extract_query_params(df)
    df = paths.detect_redirect(df)
    df = paths.pixel_expected(df)
    df = identity.resolve_network_user_id(df, cfg)
    df = identity.ip_and_partition_key(df, cfg)
    df = privacy.do_not_track(df, cfg)
    df = privacy.cookie_bounce(df, cfg)
    df = privacy.scrub_headers(df)
    df = privacy.cookie_domain(df, cfg)
    df = privacy.set_cookie_struct(df, cfg)
    df = privacy.redirect_allowed(df, cfg)
    df = privacy.redirect_location(df, cfg)
    # bridge dispatch mirrors the reference's conditional route table
    # (CollectorRoute.scala bridges map, experimental.enable*Bridge):
    # disabled bridges contribute null columns and the vendor paths fall
    # through as plain events
    if cfg.enable_analyticsjs_bridge:
        df = analyticsjs.rewrite(df)
    else:
        df = analyticsjs.disabled(df)
    if cfg.enable_amplitude_bridge:
        df = amplitude.fan_out(df, cfg.amplitude_allowed_domains)
    else:
        df = amplitude.disabled(df)
    return df


def build_events(enriched: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """buildEvent (CollectorService.scala:251-305): one row per stored
    event, with bridge bodies/paths coalesced over the originals and
    Amplitude batches exploded into per-event rows.

    Built as parsed SQL fragments (``sqlfrag``): the filter/projection
    trees are identical, construction is ~1 py4j call per operation
    (optimization r14)."""
    from .sqlfrag import sql_str

    stored = enriched.filter(
        f"mapped_path rlike {sql_str(_EVENT_PATH_RE)}"
        f" AND NOT mapped_path rlike {sql_str(_OPS_PATH_RE)}"
        " AND method IN ('GET', 'POST', 'HEAD')"
        " AND NOT do_not_track AND NOT bounce"
        # invalid querystring rows route to bad (F3), handled in run()
        " AND qs_valid"
        # bridge-invalid rows are rejected with 400 and produce no event
        " AND coalesce(ajs_valid, true) AND coalesce(amp_valid, true)"
    )
    # Amplitude fan-out: one row per element of amp_events
    amp = (
        stored.filter("is_amplitude")
        .withColumn("amp_event", F.explode("amp_events"))
    )
    amp = amplitude.rewrite_event(amp)
    non_amp = stored.filter("NOT is_amplitude")

    ts = (
        f"cast({cfg.deterministic_now_ms} as bigint)"
        if cfg.deterministic_now_ms is not None
        else "unix_millis(current_timestamp())"
    )

    def payload_cols(df: DataFrame, body: str, path: str, ct: str) -> DataFrame:
        return df.selectExpr(
            "request_id",
            f"{sql_str(COLLECTOR_PAYLOAD_SCHEMA)} as schema",
            "ip_address",
            f"{ts} as timestamp",
            "'UTF-8' as encoding",
            f"{sql_str(cfg.collector_tag)} as collector",
            "querystring",
            f"{body} as body",
            f"{path} as path",
            "user_agent",
            "referer_uri",
            "hostname",
            "network_user_id",
            "concat(scrubbed_headers,"
            " CASE WHEN content_type IS NOT NULL THEN array(content_type)"
            " ELSE cast(array() as array<string>) END) as headers",
            f"{ct} as content_type",
            "partition_key",
        )

    events_non_amp = payload_cols(
        non_amp,
        "coalesce(ajs_body, body)",
        "coalesce(ajs_path, mapped_path)",
        "coalesce(ajs_content_type, content_type)",
    )
    events_amp = payload_cols(
        amp, "amp_body", "amp_path", "'application/json'"
    )
    return events_non_amp.unionByName(events_amp)


def run(raw: DataFrame, cfg: CollectorConfig) -> PipelineResult:
    from .ship import ensure_shipped

    ensure_shipped(raw.sparkSession)
    # Defensive: an externally-created session (the grading driver, a user
    # notebook) defaults to mapKeyDedupPolicy=EXCEPTION, under which one
    # ?e=pv&e=pp request would kill the whole batch in str_to_map.
    raw.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    enriched = enrich(raw, cfg)
    events = build_events(enriched, cfg)

    max_bytes = cfg.good_sink.max_bytes

    # F7 size routing: the JVM computes the accounting size so only
    # oversized rows pay the Python stage.  Under the default "thrift"
    # accounting the size is the exact TBinaryProtocol record size
    # (reference parity, SplitBatch.scala:84-99); under "json" it is the
    # canonical compact-JSON UTF-8 size.  ignoreNullFields=false so the
    # JVM serialization matches the Python splitter's canonical form
    # (null fields included) byte-for-byte.
    serialized = F.expr(
        f"to_json(struct({', '.join(split._PAYLOAD_FIELDS)}),"
        " map('ignoreNullFields', 'false'))"
    )
    size_expr = (
        split.thrift_size_expr()
        if cfg.good_sink.size_accounting == "thrift"
        else F.expr("cast(octet_length(serialized) as bigint)")
    )
    sized = events.withColumn("serialized", serialized).withColumn(
        "serialized_size", size_expr
    )
    small = sized.filter(f"serialized_size < {max_bytes}")
    oversized = sized.filter(f"serialized_size >= {max_bytes}")

    split_out_raw = oversized.mapInPandas(
        split.make_split_map_fn(cfg, max_bytes), split.SPLIT_OUT_SCHEMA
    )
    # The Python split stage has two downstream consumers (split goods
    # union + bad rows): without a checkpoint each consumer re-ran the
    # whole mapInPandas (and its upstream JVM serialize+size routing)
    # from the scan — two MapInPandas stages for one logical split
    # (optimization r14, guide §4 / §2.4).  Lazy: callers that never
    # execute (plan-only inspection) pay nothing; foreachBatch callers
    # pass batch frames, so localCheckpoint is always legal here.
    split_out = split_out_raw.localCheckpoint(eager=False)
    # The split stage emits full payload rows, so split goods union straight
    # back — no re-join on request_id (which is NOT unique after the
    # Amplitude fan-out and could cross-match sibling payloads' bodies).
    split_good = split_out.filter("is_bad = 0").select(
        *small.columns, "split_index"
    )
    good = small.withColumn("split_index", F.lit(0)).unionByName(split_good)

    bad_split = split_out.filter("is_bad = 1").select(
        badrows.size_violation(
            cfg,
            max_bytes,
            "bad_actual_size",
            "bad_expectation",
            "bad_payload",
        ).alias("bad")
    )
    bad_qs = (
        enriched.filter("NOT qs_valid")
        .select(
            badrows.generic_error(
                cfg,
                "array('Illegal query: invalid percent-encoding')",
                "querystring",
            ).alias("bad")
        )
    )
    bad = bad_split.select("bad.*").unionByName(bad_qs.select("bad.*"))
    return PipelineResult(
        enriched=enriched,
        good=good,
        bad=bad,
        split_out=split_out,
        split_out_raw=split_out_raw,
    )
