"""Streaming operators beyond the plain pipeline (SURVEY §2.8 streaming):

- stream-static enrichment join (event stream x dimension table),
- stream-stream interval join with watermarks (click->purchase
  attribution within a bounded horizon),
- custom stateful sessionization via ``applyInPandasWithState``
  (the escape hatch for session logic ``session_window`` can't express,
  e.g. carrying per-session aggregates or emitting on timeout only).

All three are the idiomatic Structured Streaming formulations: state is
keyed and watermark-bounded, so RocksDB state size stays proportional to
the active-key working set, not the stream history (the 100 TB design
constraint from SURVEY §7's risk register).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def enrich_stream_static(stream: DataFrame, dim: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream-static join: the static side is re-read per micro-batch and
    broadcast (dimension tables are small by definition here) — the
    streaming twin of the pipeline's T3 path-mapping/enrichment joins."""
    return stream.join(F.broadcast(dim), on, how)


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 30,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: purchase attributed to any click by the same
    user within the preceding `horizon_minutes`.  Both sides carry
    watermarks so the join state is bounded: a click can be dropped from
    state once its attribution horizon has passed the watermark.
    ``how='left_outer'`` additionally emits unattributed clicks (null
    purchase columns) once the watermark proves no purchase can arrive —
    the conversion-funnel "no purchase followed" signal."""
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"""
            c_user_id = p_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL {horizon_minutes} MINUTES
            """
        ),
        how,
    ).select("c_user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("closed_by", StringType()),  # 'gap' | 'timeout'
    ]
)


def make_session_fn(gap_ms: int, timeout_flush: bool = True, timeout_ms: int | None = None):
    """applyInPandasWithState function: accumulates per-user session state,
    emits a session row whenever a gap > gap_ms is observed inside a batch,
    and (when ``timeout_flush``) flushes the open session on
    processing-time timeout.  State per key is three longs —
    constant-size, watermark-independent.

    ``timeout_ms`` decouples the WALL-CLOCK inactivity timeout from the
    EVENT-TIME gap (default: equal, the serving-mode choice where stream
    time tracks wall time).  A bounded replay compresses event time, so
    its flush timeout must be real-seconds short while the gap stays
    event-time large.

    ``timeout_flush=False`` registers no timeout: open sessions stay in
    state forever.  That is the mode for bounded availableNow replays —
    with ProcessingTimeTimeout the streaming engine must keep scheduling
    empty batches so pending timeouts can fire, and an availableNow drain
    therefore never terminates."""
    flush_ms = gap_ms if timeout_ms is None else timeout_ms

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        gap_us = gap_ms * 1000
        out: list[dict] = []
        if state.hasTimedOut:
            if state.exists:
                n, start_us, last_us = state.get
                out.append(
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "start_us": start_us,
                        "last_us": last_us,
                        "closed_by": "timeout",
                    }
                )
            state.remove()
        else:
            # micros-since-epoch: events carry microsecond precision and
            # the emitted session bounds must round-trip it exactly
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(t.value // 1_000) for t in pdf["ts"])
            ts_us.sort()
            if state.exists:
                n, start_us, last_us = state.get
            else:
                n, start_us, last_us = 0, None, None
            for t in ts_us:
                if last_us is not None and t - last_us > gap_us:
                    out.append(
                        {
                            "user_id": user_id,
                            "n_events": n,
                            "start_us": start_us,
                            "last_us": last_us,
                            "closed_by": "gap",
                        }
                    )
                    n, start_us = 0, None
                n += 1
                start_us = t if start_us is None else start_us
                last_us = t
            state.update((n, start_us, last_us))
            if timeout_flush:
                state.setTimeoutDuration(flush_ms)
        if out:
            df = pd.DataFrame(out)
            yield pd.DataFrame(
                {
                    "user_id": df["user_id"].astype("int64"),
                    "n_events": df["n_events"].astype("int64"),
                    "session_start": pd.to_datetime(df["start_us"], unit="us"),
                    "session_end": pd.to_datetime(df["last_us"], unit="us"),
                    "closed_by": df["closed_by"],
                }
            )

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    timeout_flush: bool = True,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState) — closed
    sessions emit on gap within the stream; open sessions flush on
    processing-time timeout when ``timeout_flush`` (continuous serving
    mode; ``timeout_ms`` overrides the wall-clock inactivity horizon),
    or stay held in state when not (bounded availableNow replays,
    which cannot terminate while timeouts are pending)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes * 60 * 1000, timeout_flush, timeout_ms),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_flush
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def curate_document_stream(
    stream: DataFrame,
    corpus_hashes: DataFrame,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Continuous-crawl curation: incoming documents (streaming DF with
    doc_id/text/lang/source) are deduplicated against the static corpus
    and annotated with the quality features the batch gates use.

    - exact dedup = stream-static LEFT ANTI join on md5(text) against the
      corpus hash index (``corpus_hashes``: one ``exact_hash`` column,
      e.g. built by ``engine.llmdata.dedup.dedup_incremental``'s corpus
      side, refreshed per micro-batch by the file source);
    - in-stream dedup = ``dropDuplicates("exact_hash")`` bounds repeat
      payloads inside the micro-batch;
    - quality columns (n_tokens, type-token ratio, stopword fraction)
      are the streaming twins of text_quality_score — pure projections,
      no state.

    State design at 100 TB: the anti-join side is a static table the
    micro-batch planner broadcasts or hash-joins per batch; nothing
    accumulates in the state store, so the stream's memory is bounded by
    the micro-batch, not the corpus.
    """
    sw = stopwords if stopwords is not None else ["the", "a", "of", "and", "to"]
    ws = F.split(F.lower("text"), " ")
    hashed = stream.withColumn("exact_hash", F.md5("text"))
    fresh = hashed.join(corpus_hashes, "exact_hash", "left_anti").dropDuplicates(
        ["exact_hash"]
    )
    n_tokens = F.size(ws)
    n_stop = F.size(F.array_intersect(ws, F.array(*[F.lit(w) for w in sw])))
    return fresh.select(
        "doc_id",
        "lang",
        "source",
        "exact_hash",
        n_tokens.cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(ws)).cast("double") / n_tokens).alias("ttr"),
        (n_stop.cast("double") / n_tokens).alias("stopword_kind_frac"),
    )
