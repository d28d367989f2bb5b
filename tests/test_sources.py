"""§2.8 scan coverage beyond parquet: csv/json batch reads (schema'd,
header'd) and the streaming rate source — all producing plans identical
to the parquet path downstream."""

from __future__ import annotations

from pyspark.sql import functions as F

from opensnowcat_collector_spark.engine.tables import table


def test_csv_scan_roundtrip(spark, sf_dir, tmp_path):
    nation = table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(nation.schema).csv(path)
    assert back.count() == nation.count()
    a = {r["n_name"]: r["n_regionkey"] for r in back.collect()}
    b = {r["n_name"]: r["n_regionkey"] for r in nation.collect()}
    assert a == b


def test_json_scan_roundtrip(spark, sf_dir, tmp_path):
    region = table(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    region.write.json(path)
    back = spark.read.schema(region.schema).json(path)
    assert sorted(r["r_name"] for r in back.collect()) == sorted(
        r["r_name"] for r in region.collect()
    )


def test_csv_scan_prunes_and_pushes_down(spark, sf_dir, tmp_path):
    """Column pruning reaches the csv scan (ReadSchema shows only the
    projected columns)."""
    cust = table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_csv")
    cust.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(cust.schema).csv(path)
    plan = (
        back.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "c_custkey" in plan
    # the full 8-column customer schema must NOT be read for a 2-column query
    assert "c_comment" not in plan.split("ReadSchema")[-1]


def test_rate_source_smoke(spark, tmp_path):
    """Streaming rate source -> windowed count (the test-rig source for
    load experiments)."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .start()
    )
    q.awaitTermination(60)
    assert spark.table("rate_smoke").collect()[0]["n"] >= 0


def test_orc_scan_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC is Spark-native alongside parquet: round-trip the orders
    table and check predicate pushdown reaches the ORC scan."""
    orders = table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    orders.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[-1]
    got = back.filter(F.col("o_orderstatus") == "F").count()
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert got == want
