"""Single import point that materializes the full query registry.

Importing this module imports every query-bearing module so their
``@register`` decorators populate ``relational.QUERIES`` / ``ORACLE``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import collector_queries, relational  # noqa: F401  (registration side effects)
from .llmdata import dedup, multimodal, similarity, text  # noqa: F401  (registration side effects)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(relational.QUERIES)


def all_oracle_sql() -> dict[str, str]:
    return dict(relational.ORACLE)
