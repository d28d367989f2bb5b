"""Physical-layout toolkit for the 100 TB path: salted joins for skewed
keys, bucketed tables for shuffle-free joins, partitioned event layout
for partition pruning.

These are the three techniques AQE cannot always supply on its own:
- AQE's skew-join split only fires inside sort-merge joins at runtime —
  ``salted_join`` handles the planning-time case (a known-hot key joined
  against a dimension that must not be broadcast);
- bucketing removes the shuffle from *repeated* equi-joins on the same
  key (pay the shuffle once at write time);
- hive-style partition columns let the scan skip whole directories
  (``PartitionFilters`` in the plan), which column-level pushdown can't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a random salt in
    [0, n_salts), the dim side is replicated n_salts times (explode of a
    literal range — no driver loop), and the join key becomes
    (key, salt).  A key holding X% of the fact rows now spreads over
    n_salts tasks instead of hot-spotting one.

    Cost model: dim is replicated n_salts-fold — use for mid-size dims
    where broadcast is too big but replication is affordable; for tiny
    dims prefer broadcast(), for two huge skewed sides prefer AQE
    skew-join."""
    salted_facts = facts.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_facts.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, bucket_key: str, n_buckets: int = 32
) -> None:
    """Persist as a bucketed managed table: one shuffle now, zero
    shuffles for every future equi-join/aggregation on the bucket key
    (both sides bucketed with the same count)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .saveAsTable(table_name)
    )


def write_partitioned_by_day(
    events: DataFrame, path: str, ts_col: str = "ts"
) -> None:
    """Hive-partitioned event layout (day directories): time-bounded
    queries prune whole partitions at planning time."""
    (
        events.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def explain_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    """Presence map of plan features (test/diagnostic helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {n: n in plan for n in needles}
