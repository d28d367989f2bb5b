"""opensnowcat_collector_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of opensnowcat/opensnowcat-collector.

The reference (/root/reference, OpenSnowcat Stream Collector 1.0.2) is an HTTP
event-collection server: its data-processing surface is a streaming dataflow
(identity resolution -> payload transforms -> serialization/splitting ->
good/bad routing -> buffered sinks).  This package re-expresses that surface
Spark-first:

- ``schema``      canonical CollectorPayload / raw-request / bad-row schemas
- ``config``      CollectorConfig dataclasses (reference: core/.../model.scala)
- ``transforms``  the per-event operators (SURVEY.md §2.2-2.4) as column exprs
- ``pipeline``    raw requests DataFrame -> (good, bad) DataFrames
- ``streaming``   Structured Streaming wiring (triggers = buffer thresholds)
- ``sinks``       foreachBatch / native sink writers (SURVEY.md §2.6)
- ``engine``      the relational + LLM-data query surface (SURVEY.md §2.8)

Everything here is plain public PySpark; no custom Catalyst rules are needed
(SURVEY.md §4.2).
"""

__version__ = "0.1.0"
