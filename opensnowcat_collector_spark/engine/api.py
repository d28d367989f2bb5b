"""Engine front door (SURVEY §7 M6): one object wrapping a SparkSession
+ data directory with the full query surface.

    eng = Engine(spark, "/root/testdata/sf0.01")
    eng.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
    eng.table("orders").filter(...)
    eng.run("q1_pricing_summary")          # any registered query
    eng.query_names()

``sql`` registers all tables as temp views on first use and then defers
entirely to Spark SQL — Catalyst owns planning; this class is wiring,
not an execution layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import registry
from .tables import TABLE_NAMES, register_views, table


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._views_registered = False

    def table(self, name: str) -> DataFrame:
        return table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    def run(self, query_name: str) -> DataFrame:
        qs = registry.all_queries()
        if query_name not in qs:
            raise KeyError(
                f"unknown query {query_name!r}; see Engine.query_names()"
            )
        return qs[query_name](self.spark, self.sf_dir)

    @staticmethod
    def query_names() -> list[str]:
        return sorted(registry.all_queries())

    @staticmethod
    def table_names() -> list[str]:
        return list(TABLE_NAMES)
