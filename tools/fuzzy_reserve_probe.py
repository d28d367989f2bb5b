#!/usr/bin/env python
"""Served re-serve fan-out measurement for the fuzzy screen (VERDICT
r13 item 2's "Done" row).

The r13 convergence probe SIMULATED the converged rarity table by
recomputing full-corpus DFs in-probe.  With ``republish_fuzzy`` the
refreshed artifact now actually exists on disk, so this probe measures
the production number itself: blocked pair fan-out on the stream slice
when the screen reads each artifact GENERATION —

- gen1: the static-trained ``build_fuzzy`` rarity table (what serving
  reads before any refresh),
- gen2: the REPUBLISHED rarity table (``republish_fuzzy`` — the real
  refresh fold drained, merged, and atomically published),
- batch: the batch screen's own full-corpus rare set, recomputed —
  the convergence target.

Expected: pairs_gen2 == pairs_batch exactly (the republished table IS
the converged one — also driver-graded via
``streaming_fuzzy_serve_refreshed``), with pairs_gen1 several times
larger (the r12/r13 superset fan-out, ~5.9x at every measured scale).

    python tools/fuzzy_reserve_probe.py [sf_dir]

Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine.llmdata.curation import (
        BENCH_MOD,
        CURATION_CORPUS_SPLIT,
        FUZZY_BLOCK_DF,
    )
    from opensnowcat_collector_spark.engine.llmdata.dedup import shingles_of
    from opensnowcat_collector_spark.engine.streaming_queries import (
        build_fuzzy,
        republish_fuzzy,
    )
    from opensnowcat_collector_spark.engine.tables import table
    from opensnowcat_collector_spark.session import get_spark

    spark = get_spark(app_name="fuzzy-reserve-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"probe": "fuzzy_reserve_fanout", "sf_dir": sf_dir}

    t0 = time.perf_counter()
    p1 = build_fuzzy(spark, sf_dir)
    out["t_build_gen1"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    p2 = republish_fuzzy(spark, sf_dir)  # drains the stream + publishes
    out["t_republish_gen2"] = round(time.perf_counter() - t0, 3)

    d = table(spark, sf_dir, "documents")
    is_bench = (F.col("doc_id") % BENCH_MOD) == 0
    stream_sh = shingles_of(
        d.filter((F.col("doc_id") >= CURATION_CORPUS_SPLIT) & ~is_bench)
    ).distinct().localCheckpoint(eager=False)
    be = spark.read.parquet(os.path.join(p1, "be"))

    def fanout(rare) -> int:
        # the serving screen's blocking join (artifact `be` already
        # carries (b_doc, shingle)).  The twin broadcasts `be` because
        # real benchmarks are bounded; replica corpora scale the
        # benchmark with K, so here the join is left unhinted and AQE
        # decides — the pair COUNT, the measured quantity, is identical.
        return (
            stream_sh.join(rare.hint("merge"), "shingle")
            .join(be.hint("merge"), "shingle")
            .select(F.col("doc_id").alias("t_doc"), "b_doc")
            .distinct()
            .count()
        )

    for tag, rare in (
        ("gen1", spark.read.parquet(os.path.join(p1, "rare"))),
        ("gen2", spark.read.parquet(os.path.join(p2, "rare"))),
        (
            "batch",
            shingles_of(d)
            .distinct()
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= FUZZY_BLOCK_DF)
            .select("shingle"),
        ),
    ):
        t0 = time.perf_counter()
        out[f"pairs_{tag}"] = fanout(rare)
        out[f"t_pairs_{tag}"] = round(time.perf_counter() - t0, 3)

    out["gen2_equals_batch"] = out["pairs_gen2"] == out["pairs_batch"]
    out["gen1_over_gen2"] = round(
        out["pairs_gen1"] / max(out["pairs_gen2"], 1), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
