#!/usr/bin/env python
"""Converged-DF probe for the streaming fuzzy screen (VERDICT r12
items 2/6).

The r12 probe pinned the streaming fuzzy screen's ~110 s verify floor
to the levenshtein DP over a pair set inflated by the STATIC-trained
rarity table: a subset document frequency under-counts, so its rare set
— and hence the blocked pair fan-out — is a SUPERSET of the full-corpus
screen's.  ``streaming_fuzzy_refresh`` converges the trained DF toward
the full-corpus DF; this probe turns that convergence argument into a
measured row by running the stream screen's pair blocking + verify
under BOTH rarity tables on the same replica corpus:

- static: rare from the static-slice DF (what the artifact serves
  before any refresh) — the r12 measured configuration.
- converged: rare from the FULL-corpus DF (the fixed point of the
  refresh fold) — the pair set here equals the batch screen's
  restricted to the stream slice, by the containment property.

One K per process (probe-timing discipline):

    python tools/fuzzy_converged_probe.py /tmp/scale_probe_v3/x8-documents

Prints one JSON line with pair counts + stage times; paste into
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]

    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine.llmdata.curation import (
        BENCH_MOD,
        CURATION_CORPUS_SPLIT,
        FUZZY_BLOCK_DF,
        FUZZY_CONTAM_MAX_REL,
    )
    from opensnowcat_collector_spark.engine.llmdata.dedup import shingles_of
    from opensnowcat_collector_spark.engine.tables import table
    from opensnowcat_collector_spark.session import get_spark

    spark = get_spark(app_name="fuzzy-converged-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d = table(spark, sf_dir, "documents")
    is_bench = (F.col("doc_id") % BENCH_MOD) == 0
    static_docs = d.filter((F.col("doc_id") < CURATION_CORPUS_SPLIT) | is_bench)
    stream_docs = d.filter(
        (F.col("doc_id") >= CURATION_CORPUS_SPLIT) & ~is_bench
    )

    out: dict = {"probe": "fuzzy_converged", "sf_dir": sf_dir}

    t0 = time.perf_counter()
    static_sh = shingles_of(static_docs).distinct().localCheckpoint(eager=False)
    rare_static = (
        static_sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= FUZZY_BLOCK_DF)
        .select("shingle")
        .localCheckpoint(eager=False)
    )
    out["rare_static_rows"] = rare_static.count()
    out["t_rare_static"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    full_sh = shingles_of(d).distinct().localCheckpoint(eager=False)
    rare_conv = (
        full_sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= FUZZY_BLOCK_DF)
        .select("shingle")
        .localCheckpoint(eager=False)
    )
    out["rare_converged_rows"] = rare_conv.count()
    out["t_rare_converged"] = round(time.perf_counter() - t0, 3)

    be = (
        static_sh.join(static_docs.filter(is_bench).select("doc_id"), "doc_id")
        .select(F.col("doc_id").alias("b_doc"), "shingle")
        .localCheckpoint(eager=False)
    )
    bt = (
        d.filter(is_bench)
        .select(
            F.col("doc_id").alias("b_doc"),
            F.lower("text").alias("b_text"),
            F.length("text").alias("b_len"),
        )
        .localCheckpoint(eager=False)
    )
    be.count(), bt.count()
    stream_sh = shingles_of(stream_docs).distinct().localCheckpoint(eager=False)
    stream_sh.count()
    tt = stream_docs.select(
        F.col("doc_id").alias("t_doc"),
        F.lower("text").alias("t_text"),
        F.length("text").alias("t_len"),
    )

    for name, rare in (("static", rare_static), ("converged", rare_conv)):
        t0 = time.perf_counter()
        pairs = (
            stream_sh.join(rare, "shingle")
            .join(F.broadcast(be), "shingle")
            .select(F.col("doc_id").alias("t_doc"), "b_doc")
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_pairs = pairs.count()
        t_pairs = round(time.perf_counter() - t0, 3)
        rel = F.round(
            F.levenshtein("t_text", "b_text").cast("double")
            / F.greatest("t_len", "b_len"),
            6,
        )
        t0 = time.perf_counter()
        flagged = (
            pairs.join(tt, "t_doc")
            .join(F.broadcast(bt), "b_doc")
            .select("t_doc", rel.alias("rel"))
            .groupBy("t_doc")
            .agg(
                F.min("rel").alias("min_rel_edit"),
            )
            .filter(F.col("min_rel_edit") <= FUZZY_CONTAM_MAX_REL)
            .count()
        )
        t_verify = round(time.perf_counter() - t0, 3)
        out[name] = {
            "pairs": n_pairs,
            "t_pairs": t_pairs,
            "t_verify": t_verify,
            "flagged": flagged,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
