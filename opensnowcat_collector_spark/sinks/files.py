"""Parquet/file sink — the landing-zone sink for downstream analytics
(the engine's §2.8 query surface reads these back)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .base import Sink


class ParquetSink(Sink):
    def __init__(self, path: str, mode: str = "append", max_bytes: int = 1000000000):
        super().__init__(max_bytes=max_bytes)
        self.path = path
        self.mode = mode

    def write(self, df: DataFrame, epoch_id: int = 0) -> None:
        df.write.mode(self.mode).parquet(self.path)
