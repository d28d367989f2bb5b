#!/usr/bin/env python
"""SemDeDup production-knob probe (judge VERDICT r10 item 3, measured).

The default scale probe holds KMEANS_K=4 while the corpus grows, so
``dedup_semdedup``'s within-cell epsilon-ball pass is quadratic in the
growing cell width (138.5 s @128x) — by design, since production does
the opposite: SemDeDup scales the CLUSTER COUNT with the corpus (the
paper uses 50k clusters for 5B points) so cell width stays constant and
the pass is linear in corpus at fixed width.  This probe measures that
knob: K-fold replicated embeddings (scale_probe machinery), cluster
count = KMEANS_K * K (constant expected width = |sf0.1| / KMEANS_K =
500), per-cell mean centroids, and the EXACT operator kernel
(``dedup._semdedup_cell_kernel`` — one definition, no probe drift).

Cells come from a balanced modulo shard rather than re-training Lloyd
at K*KMEANS_K centroids: the quantizer is pay-once infrastructure and
the claim under test is the epsilon-ball pass's scaling at constant
width, not quantizer training cost (which is corpus-linear per
iteration regardless of K).  The centroid pull stays bounded
(cells * DIM rows: 65,536 at 256x — the catalog-pull class).

Timed region: the applyInPandas epsilon-ball pass only (assignment +
centroid means are printed separately as setup).

Usage: python tools/semdedup_width_probe.py [K ...]   (default: 8 32)
Writes one JSON line per K; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [8, 32]

    import numpy as np
    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine.llmdata.dedup import (
        _semdedup_cell_kernel,
        semdedup_out_schema,
    )
    from opensnowcat_collector_spark.engine.llmdata.similarity import KMEANS_K
    from opensnowcat_collector_spark.session import get_spark
    from scale_probe import build

    spark = get_spark(app_name="semdedup_width_probe")
    spark.sparkContext.setLogLevel("WARN")

    for k in ks:
        sf_dir = build(spark, k, tables=["embeddings"])
        cells = KMEANS_K * k
        t0 = time.perf_counter()
        e = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .withColumn("cell", F.pmod("vec_id", F.lit(cells)).cast("int"))
            .localCheckpoint()
        )
        # per-cell mean centroid: bounded cells*DIM pull (catalog class)
        cent_pd = (
            e.select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("c"))
            .toPandas()
        )
        cmap = {
            int(cid): grp.sort_values("pos")["c"].to_numpy(dtype=np.float64)
            for cid, grp in cent_pd.groupby("cell", sort=True)
        }
        setup = time.perf_counter() - t0
        t0 = time.perf_counter()
        kept = (
            e.groupBy("cell")
            .applyInPandas(_semdedup_cell_kernel(cmap), semdedup_out_schema())
            .count()
        )
        ball = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "k": k,
                    "cells": cells,
                    "rows": 2000 * k,
                    "width": 2000 * k // cells,
                    "kept": kept,
                    "setup_sec": round(setup, 2),
                    "ball_sec": round(ball, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
