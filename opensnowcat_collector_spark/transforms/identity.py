"""T1 network-user-id resolution + T2 ip/partition-key extraction.

reference: CollectorService.scala:133-141,520-547.

Resolution order (T1):
1. ``SP-Anonymous`` header present -> constant all-zero UUID
2. ``nuid`` query parameter
3. collector cookie value
4. if bouncing -> configured fallback nuid, else random UUID

Nondeterminism: ``uuid()`` is frozen to a request-id-derived UUID when
``cfg.deterministic_now_ms`` is set, so golden tests compare exact values
(the reference's tests face the same issue and assert only structure —
SURVEY §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ZERO_UUID, CollectorConfig


def _uuid_expr(cfg: CollectorConfig, seed_col: str = "request_id") -> Column:
    if cfg.deterministic_now_ms is not None:
        # deterministic v4-shaped UUID from md5(request_id)
        h = F.md5(F.col(seed_col))
        return F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.concat(F.lit("4"), F.substring(h, 14, 3)),
            F.concat(F.lit("8"), F.substring(h, 18, 3)),
            F.substring(h, 21, 12),
        )
    return F.uuid()


def resolve_network_user_id(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """Adds ``network_user_id`` plus the intermediate ``nuid_opt_missing``
    flag the bounce filter needs (CollectorService.scala:134-141)."""
    qs_params = F.str_to_map(F.coalesce(F.col("querystring"), F.lit("")), F.lit("&"), F.lit("="))
    nuid_opt = F.when(
        F.col("sp_anonymous").isNotNull(), F.lit(ZERO_UUID)
    ).otherwise(F.coalesce(qs_params["nuid"], F.col("cookies")[cfg.cookie.name]))
    bouncing = qs_params[cfg.cookie_bounce.name].isNotNull()
    nuid = F.coalesce(
        nuid_opt,
        F.when(bouncing, F.lit(cfg.cookie_bounce.fallback_network_user_id)).otherwise(
            _uuid_expr(cfg)
        ),
    )
    return (
        df.withColumn("nuid_opt_missing", nuid_opt.isNull())
        .withColumn("qs_bouncing", bouncing)
        .withColumn("network_user_id", nuid)
    )


def ip_and_partition_key(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """ip 'unknown' fallback + partition key (ip or UUID).
    The partition key feeds sink partitioning (Kafka key / repartition) —
    with useIpAddressAsPartitionKey the stream co-locates per-client events
    (useful for sessionization but skew-prone at scale; random UUID is the
    default for uniform shard load, exactly as in the reference)."""
    ip = F.coalesce(F.col("remote_ip"), F.lit("unknown"))
    pk = (
        F.when(F.col("remote_ip").isNull(), _uuid_expr(cfg))
        .when(F.lit(cfg.use_ip_address_as_partition_key), F.col("remote_ip"))
        .otherwise(_uuid_expr(cfg))
    )
    return df.withColumn("ip_address", ip).withColumn("partition_key", pk)
