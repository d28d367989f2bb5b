"""Engine front-door API (engine/api.py)."""

from __future__ import annotations

import pytest

from opensnowcat_collector_spark.engine.api import Engine


def test_engine_sql_and_table(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    n_df = eng.table("lineitem").count()
    assert n_sql == n_df > 0
    # joins across registered views plan through Catalyst as usual
    top = eng.sql(
        """
        SELECT n_name, COUNT(*) AS n FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """
    ).collect()
    assert len(top) == 3


def test_engine_run_registered_query(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    assert "q1_pricing_summary" in eng.query_names()
    df = eng.run("q1_pricing_summary")
    assert df.count() > 0
    with pytest.raises(KeyError, match="unknown query"):
        eng.run("nope")


def test_normalize_event_ts_all_physical_types(spark, sf_dir):
    """The driver-generated events.parquet has shipped as TIMESTAMP(NANOS)
    (read as long under nanosAsLong) in some rounds and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (read as TIMESTAMP_NTZ) in others; the loader
    must land both — and an already-LTZ column — on TIMESTAMP so hour
    extraction, watermarks, and session windows behave identically."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from opensnowcat_collector_spark.engine.tables import normalize_event_ts, table

    # whatever physical type the current testdata carries -> TIMESTAMP
    ev = table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)

    base = ev.select("event_id", "ts").limit(5)
    wall = [r["ts"] for r in base.orderBy("event_id").collect()]

    # long nanos-since-epoch -> same wall-clock micros
    as_nanos = base.withColumn(
        "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
    )
    got = normalize_event_ts(as_nanos)
    assert isinstance(got.schema["ts"].dataType, TimestampType)
    assert [r["ts"] for r in got.orderBy("event_id").collect()] == wall

    # TIMESTAMP_NTZ -> same wall-clock under the pinned-UTC session tz
    as_ntz = base.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = normalize_event_ts(as_ntz)
    assert isinstance(got.schema["ts"].dataType, TimestampType)
    assert [r["ts"] for r in got.orderBy("event_id").collect()] == wall

    # already-LTZ passes through unchanged
    got = normalize_event_ts(base)
    assert [r["ts"] for r in got.orderBy("event_id").collect()] == wall
