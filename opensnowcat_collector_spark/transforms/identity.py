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

Expressions are parsed SQL fragments (``sqlfrag``): identical trees,
one py4j call per transform (optimization r14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ZERO_UUID, CollectorConfig
from ..sqlfrag import sql_str


def _uuid_frag(cfg: CollectorConfig, seed_col: str = "request_id") -> str:
    if cfg.deterministic_now_ms is not None:
        # deterministic v4-shaped UUID from md5(request_id)
        h = f"md5({seed_col})"
        return (
            f"concat_ws('-', substring({h}, 1, 8), substring({h}, 9, 4),"
            f" concat('4', substring({h}, 14, 3)),"
            f" concat('8', substring({h}, 18, 3)), substring({h}, 21, 12))"
        )
    return "uuid()"


def resolve_network_user_id(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """Adds ``network_user_id`` plus the intermediate ``nuid_opt_missing``
    flag the bounce filter needs (CollectorService.scala:134-141)."""
    qs_params = "str_to_map(coalesce(querystring, ''), '&', '=')"
    nuid_opt = (
        f"CASE WHEN sp_anonymous IS NOT NULL THEN {sql_str(ZERO_UUID)}"
        f" ELSE coalesce({qs_params}['nuid'],"
        f" cookies[{sql_str(cfg.cookie.name)}]) END"
    )
    bouncing = f"{qs_params}[{sql_str(cfg.cookie_bounce.name)}] IS NOT NULL"
    nuid = (
        f"coalesce({nuid_opt}, CASE WHEN {bouncing}"
        f" THEN {sql_str(cfg.cookie_bounce.fallback_network_user_id)}"
        f" ELSE {_uuid_frag(cfg)} END)"
    )
    return df.withColumns(
        {
            "nuid_opt_missing": F.expr(f"({nuid_opt}) IS NULL"),
            "qs_bouncing": F.expr(bouncing),
            "network_user_id": F.expr(nuid),
        }
    )


def ip_and_partition_key(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """ip 'unknown' fallback + partition key (ip or UUID).
    The partition key feeds sink partitioning (Kafka key / repartition) —
    with useIpAddressAsPartitionKey the stream co-locates per-client events
    (useful for sessionization but skew-prone at scale; random UUID is the
    default for uniform shard load, exactly as in the reference)."""
    use_ip = "true" if cfg.use_ip_address_as_partition_key else "false"
    return df.withColumns(
        {
            "ip_address": F.expr("coalesce(remote_ip, 'unknown')"),
            "partition_key": F.expr(
                f"CASE WHEN remote_ip IS NULL THEN {_uuid_frag(cfg)}"
                f" WHEN {use_ip} THEN remote_ip"
                f" ELSE {_uuid_frag(cfg)} END"
            ),
        }
    )
