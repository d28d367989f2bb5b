"""Structured Streaming wiring (SURVEY §2.5/M4): micro-batch triggers as
buffer thresholds, foreachBatch good/bad routing, checkpointed delivery,
query-progress metrics."""
