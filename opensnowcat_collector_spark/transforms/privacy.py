"""F1 do-not-track filter, F2 cookie-bounce filter, F6 header scrubbing,
T5 cookie-header construction, T6 redirect-macro substitution, F4
redirect-domain allowlist.

reference: model.scala:69-78, CollectorService.scala:134-141,161,374-464,
466-478,485-518.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CollectorConfig


def do_not_track(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """F1: DNT cookie name exists and value fullmatches the configured
    regex -> event not stored (response still 200)."""
    if not cfg.do_not_track_cookie.enabled:
        return df.withColumn("do_not_track", F.lit(False))
    val = F.col("cookies")[cfg.do_not_track_cookie.name]
    return df.withColumn(
        "do_not_track",
        val.isNotNull() & val.rlike(f"^(?:{cfg.do_not_track_cookie.value})$"),
    )


def cookie_bounce(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """F2: bounce iff enabled ∧ nuid unresolvable ∧ not already bouncing ∧
    pixel request ∧ not a redirect (CollectorService.scala:134-141).
    Requires resolve_network_user_id + detect_redirect + pixel_expected."""
    if not cfg.cookie_bounce.enabled:
        return df.withColumn("bounce", F.lit(False))
    return df.withColumn(
        "bounce",
        F.col("nuid_opt_missing")
        & ~F.col("qs_bouncing")
        & F.col("pixel_expected")
        & ~F.col("is_redirect"),
    )


_ALWAYS_SCRUBBED = ["remote-address", "raw-request-uri"]
_ANON_SCRUBBED = _ALWAYS_SCRUBBED + ["x-forwarded-for", "x-real-ip", "cookie"]


def _header_name(h: Column) -> Column:
    return F.lower(F.trim(F.substring_index(h, ":", 1)))


def scrub_headers(df: DataFrame) -> DataFrame:
    """F6: drop Remote-Address / Raw-Request-URI always; additionally
    X-Forwarded-For / X-Real-Ip / Cookie under SP-Anonymous — a
    higher-order filter() over the headers array, no explode."""
    always = F.array(*[F.lit(x) for x in _ALWAYS_SCRUBBED])
    anon = F.array(*[F.lit(x) for x in _ANON_SCRUBBED])
    denylist = F.when(F.col("sp_anonymous").isNotNull(), anon).otherwise(always)
    return df.withColumn(
        "scrubbed_headers",
        F.filter(
            F.coalesce(F.col("headers"), F.array().cast("array<string>")),
            lambda h: ~F.array_contains(denylist, _header_name(h)),
        ),
    )


def cookie_domain(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """T5 domain resolution: first configured domain the Origin host
    matches exactly or as a subdomain, else fallback
    (CollectorService.scala:485-518).  The origin column carries the
    Origin-header host."""
    if not cfg.cookie.domains:
        return df.withColumn("cookie_domain", F.lit(cfg.cookie.fallback_domain).cast("string"))
    host = F.col("origin")
    match = None
    for d in cfg.cookie.domains:
        cond = host.isNotNull() & ((host == d) | host.endswith("." + d))
        this = F.when(cond, F.lit(d))
        match = this if match is None else match.when(cond, F.lit(d))
    domain = match.otherwise(F.lit(cfg.cookie.fallback_domain).cast("string"))
    return df.withColumn("cookie_domain", domain)


def set_cookie_struct(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """T5: response Set-Cookie struct — suppressed under DNT or
    SP-Anonymous (CollectorService.scala:401-434).  Response assembly is
    the thin receiver's job; the engine computes the decision columns."""
    if not cfg.cookie.enabled:
        return df.withColumn("set_cookie", F.lit(None).cast(
            "struct<name:string,value:string,expires_ms:bigint,domain:string,path:string,"
            "secure:boolean,http_only:boolean,same_site:string>"
        ))
    now_ms = (
        F.lit(cfg.deterministic_now_ms)
        if cfg.deterministic_now_ms is not None
        else F.unix_millis(F.current_timestamp())
    )
    struct = F.struct(
        F.lit(cfg.cookie.name).alias("name"),
        F.col("network_user_id").alias("value"),
        (now_ms + F.lit(cfg.cookie.expiration_ms)).alias("expires_ms"),
        F.col("cookie_domain").alias("domain"),
        F.lit("/").alias("path"),
        F.lit(cfg.cookie.secure).alias("secure"),
        F.lit(cfg.cookie.http_only).alias("http_only"),
        F.lit(cfg.cookie.same_site).cast("string").alias("same_site"),
    )
    return df.withColumn(
        "set_cookie",
        F.when(F.col("do_not_track") | F.col("sp_anonymous").isNotNull(), F.lit(None)).otherwise(
            struct
        ),
    )


# Host extraction equivalent to the reference's ``new URL(target).getHost``
# (CollectorService.scala:393-397): scheme '://', optional userinfo '@',
# host up to ':' port / '/' path.  NOT Spark's parse_url: (a) strict
# parse_url ABORTS THE WHOLE BATCH on any invalid URL in the column
# (found by the r7 collector_redirect_origin_gates oracle gate), and
# (b) even try_parse_url uses the stricter java.net.URI, which rejects a
# pre-substitution macro placeholder path (``u=https://d/${SP_NUID}``)
# that java.net.URL — and therefore the reference — accepts and allows.
# The scheme alternation mirrors java.net.URL's built-in protocol
# handlers (case-insensitive, like the JDK): an unknown scheme such as
# ``foo://h/x`` throws MalformedURLException in the reference and must
# yield a null host (=> denied) here, not a parsed one.  The host
# capture's first alternative keeps bracketed IPv6 literals whole —
# java.net.URL.getHost returns '[::1]' (brackets INCLUDED) for
# 'https://[::1]/x', so an allowlist entry '[::1]' must match; without
# it the [^/?#:]+ class stops at the first ':' inside the literal.
_URL_HOST_RE = r"^(?i:https?|ftp|file|jar|netdoc)://(?:[^/?#@]*@)?(\[[^/?#\]]+\]|[^/?#:]+)"


def redirect_allowed(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """F4: redirect target host must EXACTLY equal a configured domain.
    The reference (CollectorService.scala:391-398) wraps the host in an
    Option — ``Option(new URL(target).getHost)`` — and then calls
    ``config.redirectDomains.exists(url.contains)``: that is Scala
    ``Option.contains``, i.e. host == domain, NOT substring match (a
    substring match would admit ``ok.org.evil.com`` — an open-redirect
    bypass).  An EMPTY allowlist short-circuits to true BEFORE the URL
    is ever parsed (CollectorService.scala:391), so a present-but-
    malformed target — including the blank ``u=``, which reaches the
    match as Some("") — is still allowed in that mode; only the non-empty
    path reaches the try block where MalformedURLException => false
    (target unparseable -> disallowed)."""
    target = F.col("query_params")["u"]
    if not cfg.redirect_domains:
        allowed = target.isNotNull()
    else:
        host = F.nullif(F.regexp_extract(target, _URL_HOST_RE, 1), F.lit(""))
        allowed = host.isNotNull() & host.isin(*cfg.redirect_domains)
    return df.withColumn("redirect_allowed", F.when(F.col("is_redirect"), allowed))


def redirect_location(df: DataFrame, cfg: CollectorConfig) -> DataFrame:
    """T6: substitute the redirect macro (default ``${SP_NUID}``) with the
    resolved nuid in the target when enabled."""
    target = F.col("query_params")["u"]
    if cfg.redirect_macro.enabled:
        token = cfg.redirect_macro.placeholder or "${SP_NUID}"
        loc = F.replace(target, F.lit(token), F.col("network_user_id"))
    else:
        loc = target
    return df.withColumn(
        "redirect_location", F.when(F.col("is_redirect") & F.col("redirect_allowed"), loc)
    )
