"""T10 bad-row construction + F7 per-record size guard.

reference: SplitBatch.scala:124-151 (SizeViolation, truncation to
maxBytes/10), CollectorService.scala:184-195 (GenericError on illegal
querystring); self-describing envelope per snowplow-badrows.

Bad rows are structured columns here (BAD_ROW_SCHEMA); ``to_self_describing_json``
renders the wire format for sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CollectorConfig
from ..schema import GENERIC_ERROR_SCHEMA, SIZE_VIOLATION_SCHEMA


def _now_ms(cfg: CollectorConfig) -> Column:
    if cfg.deterministic_now_ms is not None:
        return F.lit(cfg.deterministic_now_ms).cast("long")
    return F.unix_millis(F.current_timestamp())


def size_violation(
    cfg: CollectorConfig,
    max_bytes: int,
    actual_size: Column,
    expectation: str | Column,
    payload: Column,
) -> Column:
    """SizeViolation struct with the payload truncated to maxBytes/10
    (SplitBatch.scala:142)."""
    exp = F.lit(expectation) if isinstance(expectation, str) else expectation
    return F.struct(
        F.lit("size_violation").alias("kind"),
        F.lit(cfg.app_name).alias("app_name"),
        F.lit(cfg.app_version).alias("app_version"),
        _now_ms(cfg).alias("failure_timestamp"),
        F.lit(max_bytes).cast("int").alias("maximum_allowed_size_bytes"),
        actual_size.cast("int").alias("actual_size_bytes"),
        F.concat(F.lit("oversized collector payload: "), exp).alias("expectation"),
        F.lit(None).cast("array<string>").alias("errors"),
        F.substring(payload, 1, max_bytes // 10).alias("payload"),
        F.col("partition_key").alias("partition_key"),
    )


def generic_error(cfg: CollectorConfig, errors: Column, payload: Column) -> Column:
    """GenericError struct (illegal querystring path)."""
    return F.struct(
        F.lit("generic_error").alias("kind"),
        F.lit(cfg.app_name).alias("app_name"),
        F.lit(cfg.app_version).alias("app_version"),
        _now_ms(cfg).alias("failure_timestamp"),
        F.lit(None).cast("int").alias("maximum_allowed_size_bytes"),
        F.lit(None).cast("int").alias("actual_size_bytes"),
        F.lit(None).cast("string").alias("expectation"),
        errors.alias("errors"),
        F.coalesce(payload, F.lit("")).alias("payload"),
        F.col("partition_key").alias("partition_key"),
    )


def to_self_describing_json(bad: Column) -> Column:
    """Render a bad-row struct as the self-describing JSON wire format."""
    schema = F.when(bad["kind"] == "size_violation", F.lit(SIZE_VIOLATION_SCHEMA)).otherwise(
        F.lit(GENERIC_ERROR_SCHEMA)
    )
    return F.to_json(
        F.struct(
            schema.alias("schema"),
            F.struct(
                F.struct(
                    bad["app_name"].alias("artifact"),
                    bad["app_version"].alias("version"),
                ).alias("processor"),
                F.struct(
                    bad["failure_timestamp"].alias("timestamp"),
                    bad["maximum_allowed_size_bytes"].alias("maximumAllowedSizeBytes"),
                    bad["actual_size_bytes"].alias("actualSizeBytes"),
                    bad["expectation"].alias("expectation"),
                    bad["errors"].alias("messages"),
                ).alias("failure"),
                bad["payload"].alias("payload"),
            ).alias("data"),
        )
    )
