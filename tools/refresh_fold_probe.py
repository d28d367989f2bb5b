#!/usr/bin/env python
"""Fixed-batch refresh-fold probe for the fuzzy-rarity and CDC chunk
tables (VERDICT r13 item 7).

The r13 refresh-twin probe rows scale the DRAINED STREAM with the
corpus, so the O(batch + table) fold claim reads as a plain linear
curve.  This probe separates the two terms by holding the stream slice
CONSTANT (the base corpus's stream docs 100..499 — 400 documents,
present unshifted in every K-fold replica because replica 0 is the
identity map) while the HISTORY grows with K, and times three phases:

- table: materialize the history-side table (fuzzy: shingle DF counts;
  cdc: distinct chunk hashes) — the artifact build, pay-once, expected
  ~linear in K on replicas.
- increment: the PER-EPOCH batch-scaled stage (fuzzy: the fixed
  batch's shingle-DF aggregation; cdc: the fixed batch's chunking +
  membership anti-join against the history table) — the cost every
  serving epoch pays.  Claim: ~flat as history grows (the anti-join
  probes the table but ships only the constant batch).
- fold: the DRAIN-TIME merge (fuzzy: one full-outer sum with the DF
  table + re-gate; cdc: one union-distinct with the chunk table) —
  the once-per-refresh table touch.  Claim: scales with the TABLE,
  paid once per refresh cadence, never per epoch.

One family + one K per process (probe-timing discipline: fresh JVM,
idle machine, compare ratios not points):

    python tools/refresh_fold_probe.py fuzzy /tmp/scale_probe_v3/x8-documents [reps]
    python tools/refresh_fold_probe.py cdc   /tmp/scale_probe_v3/x8-documents [reps]

Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH_LO, BATCH_HI = 100, 500  # the fixed stream batch: 400 base docs


def main() -> None:
    family = sys.argv[1]
    sf_dir = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine.llmdata.curation import (
        FUZZY_BLOCK_DF,
    )
    from opensnowcat_collector_spark.engine.llmdata.dedup import (
        cdc_chunks_of,
        shingles_of,
    )
    from opensnowcat_collector_spark.engine.tables import table
    from opensnowcat_collector_spark.session import get_spark

    spark = get_spark(app_name=f"refresh-fold-probe-{family}")
    spark.sparkContext.setLogLevel("ERROR")

    d = table(spark, sf_dir, "documents")
    in_batch = (F.col("doc_id") >= BATCH_LO) & (F.col("doc_id") < BATCH_HI)
    hist_docs = d.filter(~in_batch)
    batch_docs = d.filter(in_batch)

    out: dict = {
        "probe": f"{family}_refresh_fold_fixed_batch",
        "sf_dir": sf_dir,
        "reps": reps,
    }

    t0 = time.perf_counter()
    if family == "fuzzy":
        hist_table = (
            shingles_of(hist_docs)
            .distinct()
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_h"))
            .localCheckpoint(eager=False)
        )
    elif family == "cdc":
        hist_table = (
            cdc_chunks_of(hist_docs)
            .select("chunk_hash")
            .distinct()
            .localCheckpoint(eager=False)
        )
    else:
        raise SystemExit(f"unknown family {family!r} (fuzzy|cdc)")
    out["table_rows"] = hist_table.count()
    out["t_table"] = round(time.perf_counter() - t0, 3)

    def increment():
        if family == "fuzzy":
            return (
                shingles_of(batch_docs)
                .distinct()
                .groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df_s"))
            )
        return (
            cdc_chunks_of(batch_docs)
            .select("chunk_hash")
            .distinct()
            .join(hist_table, "chunk_hash", "left_anti")
        )

    t_inc: list[float] = []
    for _ in range(reps):
        t1 = time.perf_counter()
        out["increment_rows"] = increment().count()
        t_inc.append(round(time.perf_counter() - t1, 3))
    out["t_increment"] = t_inc

    inc = increment().localCheckpoint(eager=False)
    inc.count()  # folded below; materialized so fold reps time ONLY the merge

    def fold():
        if family == "fuzzy":
            merged = hist_table.join(inc, ["shingle"], "full_outer")
            df_total = F.coalesce("df_h", F.lit(0)) + F.coalesce("df_s", F.lit(0))
            return merged.select(
                "shingle",
                df_total.alias("df"),
                (df_total <= FUZZY_BLOCK_DF).alias("rare"),
            )
        return hist_table.select(
            "chunk_hash", F.lit("history").alias("origin")
        ).unionByName(inc.select("chunk_hash", F.lit("stream").alias("origin")))

    t_fold: list[float] = []
    for _ in range(reps):
        t1 = time.perf_counter()
        out["fold_rows"] = fold().count()
        t_fold.append(round(time.perf_counter() - t1, 3))
    out["t_fold"] = t_fold

    print(json.dumps(out))


if __name__ == "__main__":
    main()
