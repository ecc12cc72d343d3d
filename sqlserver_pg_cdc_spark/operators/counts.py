"""Row counts and count comparison (reference S1, A1, A5).

``df.count()`` on a parquet/Delta source is served from footer metadata by
Catalyst when no filter is present — the same trick the reference plays
with pg_stat/sys.partitions stats counts (optimizer.py:19-66), but exact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class CountComparison:
    source_count: int
    target_count: int

    @property
    def difference(self) -> int:
        return self.target_count - self.source_count

    @property
    def match(self) -> bool:
        return self.source_count == self.target_count

    @property
    def status(self) -> str:
        return "MATCH" if self.match else "MISMATCH"

    def to_dict(self) -> dict:
        return {
            "source_count": self.source_count,
            "target_count": self.target_count,
            "difference": self.difference,
            "match": self.match,
            "status": self.status,
        }


def get_row_count(df: DataFrame) -> int:
    """Exact row count (reference counts.py:106-139, minus the retry loop —
    Spark retries failed tasks natively)."""
    return df.count()


def compare_counts(source_count: int, target_count: int) -> CountComparison:
    """Pure comparison (reference counts.py:17-61); rejects negatives."""
    if source_count < 0 or target_count < 0:
        raise ValueError("row counts must be non-negative")
    return CountComparison(source_count, target_count)
