"""Unit pins for the r5 TPC-H pattern queries and admission-control ops.

The full-registry DuckDB sweep (test_relational_oracle.py) already
verifies value parity; these tests pin the *semantics choices* that the
sweep can't distinguish — whole-token blocklist matching, redaction
order, exact-integer thresholds — so a refactor that keeps parity but
changes a documented behavior still fails.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensnowcat_collector_spark.engine.llmdata.curation import BLOCKLIST
from opensnowcat_collector_spark.engine.llmdata.text import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_PHONE,
)

SF = "/root/testdata/sf0.001"


def test_blocklist_matches_whole_tokens_not_substrings(spark):
    df = spark.createDataFrame(
        [("slow query",), ("slowly moving",), ("clean text",)], ["text"]
    )
    flag = F.arrays_overlap(
        F.split(F.lower("text"), " "), F.array(*[F.lit(w) for w in BLOCKLIST])
    )
    got = [r[0] for r in df.select(flag).collect()]
    # 'slowly' must NOT be rejected for 'slow'
    assert got == [True, False, False]


def test_pii_regexes_redact_and_count(spark):
    text = (
        "reach me at jane.doe+x@corp.example.org or 555-123-4567, "
        "server 192.168.0.12 backup 10.0.0.1"
    )
    df = spark.createDataFrame([(text,)], ["t"])
    row = df.select(
        F.regexp_count("t", F.lit(_PII_EMAIL)).alias("e"),
        F.regexp_count("t", F.lit(_PII_PHONE)).alias("p"),
        F.regexp_count("t", F.lit(_PII_IPV4)).alias("i"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
            ),
            _PII_IPV4,
            "<IP>",
        ).alias("clean"),
    ).first()
    assert (row.e, row.p, row.i) == (1, 1, 2)
    assert row.clean == (
        "reach me at <EMAIL> or <PHONE>, server <IP> backup <IP>"
    )


def test_pii_email_scrubbed_before_ip_pass(spark):
    # a dotted-digit email domain is consumed by the EMAIL pass (which
    # runs first), so the IP pass must find nothing left to double-match
    df = spark.createDataFrame([("mail a@12.34.56.com end",)], ["t"])
    cleaned = df.select(
        F.regexp_replace(
            F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
        ).alias("c")
    ).first()[0]
    assert cleaned == "mail <EMAIL> end"


@pytest.mark.parametrize(
    "name,min_rows",
    [
        ("q2_minprice_supplier", 1),
        ("q4_priority_exists", 1),
        ("q6_forecast_revenue", 1),
        ("q11_important_balance", 1),
        ("q16_part_supplier_counts", 1),
        ("q20_excess_supply", 1),
        ("q21_waiting_supplier", 1),
    ],
)
def test_pattern_queries_nonempty_at_smoke_sf(spark, name, min_rows):
    """The pattern queries must be discriminative (non-empty) even at the
    smoke scale factor, so a threshold regression can't silently turn a
    query into a vacuous 0-row match."""
    from opensnowcat_collector_spark.engine import registry

    qs = registry.all_queries()
    assert qs[name](spark, SF).count() >= min_rows


def test_q17_threshold_is_exact_integer_form(spark):
    """5*qty_c*cnt < sum_qc  <=>  qty < 0.2*avg(qty): spot-check the
    rationalized comparison against a tiny hand computation."""
    rows = [(1, 10.0), (1, 10.0), (1, 40.0)]  # avg=20 -> 0.2*avg=4 -> none below
    df = spark.createDataFrame(rows, ["k", "q"])
    agg = df.groupBy("k").agg(
        F.sum(F.round(F.col("q") * 100).cast("long")).alias("sum_qc"),
        F.count(F.lit(1)).alias("cnt"),
    )
    joined = df.join(agg, "k").filter(
        F.lit(5) * F.round(F.col("q") * 100).cast("long") * F.col("cnt")
        < F.col("sum_qc")
    )
    assert joined.count() == 0
    rows2 = [(1, 1.0), (1, 10.0), (1, 40.0)]  # avg=17 -> 3.4 -> the 1.0 row passes
    df2 = spark.createDataFrame(rows2, ["k", "q"])
    agg2 = df2.groupBy("k").agg(
        F.sum(F.round(F.col("q") * 100).cast("long")).alias("sum_qc"),
        F.count(F.lit(1)).alias("cnt"),
    )
    joined2 = df2.join(agg2, "k").filter(
        F.lit(5) * F.round(F.col("q") * 100).cast("long") * F.col("cnt")
        < F.col("sum_qc")
    )
    assert [r.q for r in joined2.collect()] == [1.0]


def test_repeated_ngram_fraction_counts_positions_not_distinct(spark):
    """A doc repeating one shared shingle many times must count every
    window position, not the distinct shingle once."""
    from opensnowcat_collector_spark.engine import registry
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs = spark.createDataFrame(
            [
                # doc 0: 'x y z' repeated -> 7 windows, all shared with doc 1
                (0, "x y z x y z x y z", "en", "s0", 17),
                (1, "x y z only once here", "en", "s0", 20),
                (2, "totally different words entirely", "en", "s1", 32),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.doc_id: r
            for r in registry.all_queries()["dedup_repeated_ngram_fraction"](
                spark, d
            ).collect()
        }
        # doc 0 windows: 'x y z','y z x','z x y','x y z','y z x','z x y',
        # 'x y z' — 7 positions; only 'x y z' is shared with doc 1, at 3
        # positions -> n_dup counts every position, not the distinct once
        assert out[0].n_windows == 7
        assert out[0].n_dup == 3
        assert out[2].n_dup == 0 and out[2].drop_flag == 0
        assert out[0].drop_flag == 0  # 10*3 < 7*7


def test_tfidf_ranking_deterministic_and_log_free(spark):
    from opensnowcat_collector_spark.engine import registry
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs = spark.createDataFrame(
            [
                (0, "apple apple banana", "en", "s0", 18),
                (1, "banana cherry cherry", "en", "s0", 20),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        rows = registry.all_queries()["text_tfidf_topterms"](spark, d).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        d0 = sorted(by_doc[0], key=lambda r: r.rank)
        # doc 0: apple tf=2 df=1 -> score 2*2/1=4; banana tf=1 df=2 -> 1
        assert [r.term for r in d0] == ["apple", "banana"]
        assert d0[0].score == 4.0 and d0[1].score == 1.0
