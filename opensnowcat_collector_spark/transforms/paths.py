"""T3 path mapping + T4 query-parameter extraction + F3 querystring
validation.

reference: CollectorService.scala:102-108 (determinePath), :198-199
(extractQueryParams), :184-195 (GenericError on illegal querystring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CollectorConfig


def apply_path_mapping(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """Config-map path rewrite with identity default.  The mapping is a
    tiny literal map -> constant-folded by Catalyst (no join, no shuffle)."""
    if not cfg.paths:
        return df.withColumn("mapped_path", F.col("path"))
    mapping = F.create_map(*[F.lit(x) for kv in cfg.paths.items() for x in kv])
    return df.withColumn("mapped_path", F.coalesce(mapping[F.col("path")], F.col("path")))


# A querystring is illegal when it contains a percent sign not followed by
# two hex digits (the same class of error pekko's Uri.Query rejects).
_ILLEGAL_QS_RE = "%(?![0-9A-Fa-f]{2})"


def valid_querystring(col: Column) -> Column:
    return ~F.coalesce(col, F.lit("")).rlike(_ILLEGAL_QS_RE)


def extract_query_params(df: DataFrame) -> DataFrame:
    """querystring -> MAP<STRING,STRING> with url-decoding, plus the F3
    validity predicate routing invalid rows to the bad side-channel.
    str_to_map + url_decode are JVM built-ins — no UDF."""
    qs = F.coalesce(F.col("querystring"), F.lit(""))
    raw_map = F.str_to_map(qs, F.lit("&"), F.lit("="))
    decoded = F.map_from_arrays(
        F.transform(F.map_keys(raw_map), lambda k: F.url_decode(k)),
        F.transform(F.map_values(raw_map), lambda v: F.url_decode(F.coalesce(v, F.lit("")))),
    )
    valid = valid_querystring(F.col("querystring"))
    return df.withColumn("qs_valid", valid).withColumn(
        "query_params",
        F.when(F.col("querystring").isNull(), F.create_map().cast("map<string,string>")).when(
            valid, decoded
        ),
    )


def detect_redirect(df: DataFrame) -> DataFrame:
    """S3: /r/* click-tracking redirect detection (CollectorService.scala:131)."""
    return df.withColumn("is_redirect", F.col("mapped_path").startswith("/r/"))


def pixel_expected(df: DataFrame) -> DataFrame:
    """S2: GET/HEAD pixel endpoints — event data in querystring, 1x1 GIF
    response (CollectorRoute.scala:114-152)."""
    return df.withColumn(
        "pixel_expected",
        F.col("method").isin("GET", "HEAD")
        & ~F.col("mapped_path").rlike("^/(health|sink-health|crossdomain\\.xml|robots\\.txt)$"),
    )
