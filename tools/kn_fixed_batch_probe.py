#!/usr/bin/env python
"""Fixed-batch KN serving probe (VERDICT r12 item 7).

The r12 streaming-twin probe rows scale the BATCH with the corpus, so
the O(batch)-per-epoch claim reads as a linear curve.  This probe holds
the scored batch CONSTANT (the base corpus's stream docs 100..499 — 400
documents, present unshifted in every K-fold replica because replica 0
is the identity map) while the HISTORY grows with K, and times the two
phases separately:

- train: materialize the modified-KN trigram count tables over the
  history slice (everything except the fixed batch) — the pay-once
  cost, expected ~linear in K on replicas (type tables grow linearly
  by the affine-permutation construction; Heaps-law corpora grow them
  sub-linearly).
- serve: ``_kn_score_frame`` over the FIXED 400-doc batch against the
  materialized tables, repeated REPS times — the per-epoch incremental
  cost the serving twin pays.  The claim under test: this stays ~flat
  as history grows (the batch-side explode is constant; the join
  probes touch the Zipf-small tables, whose size is the only history
  coupling).

One K per process (the probe-timing discipline: fresh JVM, idle
machine, compare ratios not points):

    python tools/kn_fixed_batch_probe.py /tmp/scale_probe_v3/x8-documents [reps]

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
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine.llmdata.text import (
        _kn_trigram_tables_for,
    )
    from opensnowcat_collector_spark.engine.streaming_queries import (
        _kn_score_frame,
    )
    from opensnowcat_collector_spark.engine.tables import table
    from opensnowcat_collector_spark.session import get_spark

    spark = get_spark(app_name="kn-fixed-batch-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d = table(spark, sf_dir, "documents")
    in_batch = (F.col("doc_id") >= BATCH_LO) & (F.col("doc_id") < BATCH_HI)
    hist_ws = d.filter(~in_batch).select(
        "doc_id", F.split(F.lower("text"), " ").alias("w")
    )
    batch = d.filter(in_batch)

    t0 = time.perf_counter()
    t = _kn_trigram_tables_for(hist_ws)
    cc = t["cc"].localCheckpoint(eager=False)
    # force every trained table so serve reps never pay training
    rows = {name: t[name].count() for name in ("tgf", "ctx2", "mid", "ctx1", "low")}
    cc.count()
    t_train = round(time.perf_counter() - t0, 3)

    serve: list[float] = []
    n_scored = 0
    for _ in range(reps):
        t1 = time.perf_counter()
        n_scored = _kn_score_frame(t, cc, batch).count()
        serve.append(round(time.perf_counter() - t1, 3))

    print(
        json.dumps(
            {
                "probe": "kn_fixed_batch",
                "sf_dir": sf_dir,
                "batch_docs": batch.count(),
                "scored_docs": n_scored,
                "train_sec": t_train,
                "serve_sec": serve,
                "type_rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
