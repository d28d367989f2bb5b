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
