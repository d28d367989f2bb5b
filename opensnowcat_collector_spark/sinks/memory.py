"""In-memory sink for tests (the analogue of the reference's stdout spec
fixtures).  Optionally fails the first N writes to exercise retry/failover."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .base import Sink


class MemorySink(Sink):
    def __init__(self, fail_first: int = 0, max_bytes: int = 1000000000):
        super().__init__(max_bytes=max_bytes)
        self.batches: list[list] = []
        self.fail_first = fail_first
        self.write_attempts = 0

    def write(self, df: DataFrame, epoch_id: int = 0) -> None:
        self.write_attempts += 1
        if self.write_attempts <= self.fail_first:
            raise RuntimeError(f"injected failure {self.write_attempts}")
        self.batches.append(df.collect())

    @property
    def rows(self) -> list:
        return [r for b in self.batches for r in b]
