"""Capture `.explain("formatted")` output for headline queries.

Usage: python tools/capture_plans.py <suffix> [name ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND (default r15)/<query>_<suffix>.txt
for each named query (default: the
full bench HEADLINE list).  The suffix is "before"/"after" per the
optimization-round deliverable.  Pay-once artifacts (ANN index, bucketed
layout) are built outside capture, mirroring bench.py, so the captured
plan is the recurring serving plan.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from bench import HEADLINE  # noqa: E402
from opensnowcat_collector_spark.engine import registry  # noqa: E402
from opensnowcat_collector_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO_ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from opensnowcat_collector_spark.engine.layout import build_bucketed_layout
    from opensnowcat_collector_spark.engine.llmdata.similarity import build_ann_index

    build_ann_index(spark, sf_dir)
    build_bucketed_layout(spark, sf_dir)

    queries = registry.all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"captured {name} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
