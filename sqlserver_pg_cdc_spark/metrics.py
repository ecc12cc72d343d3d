"""Observability plane (reference O6): reconciliation counters/gauges/
histograms with the reference's metric names
(src/utils/metrics/reconciliation.py:22-200), dependency-free.

The reference binds prometheus_client at import time; here the registry
is a plain in-process structure (drivers of a Spark app often can't run
an exporter sidecar), rendered on demand as Prometheus text-exposition
format — scrape-able from any HTTP handler the deployment provides — or
exported into prometheus_client when that package is available.

Driver-side only and O(#tables x #metrics) memory: nothing here touches
the data path, so it adds zero cost at 100 TB.
"""

from __future__ import annotations

import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Iterable

_DURATION_BUCKETS = (1, 5, 10, 30, 60, 120, 300, 600, 1800, 3600)

_QUERY_TYPES = ("SELECT", "INSERT", "UPDATE", "DELETE")


def normalize_query_type(query: str) -> str:
    """F17: collapse a SQL string to one of SELECT/INSERT/UPDATE/DELETE/
    OTHER before using it as a metric label, so label cardinality stays
    bounded (reference query_optimizer/analyzer.py:28-42)."""
    query_upper = (query or "").strip().upper()
    for query_type in _QUERY_TYPES:
        if query_upper.startswith(query_type):
            return query_type
    return "OTHER"


def _lkey(labels: dict[str, str]) -> tuple[tuple[str, str], ...]:
    return tuple(sorted(labels.items()))


def _fmt_labels(key: tuple[tuple[str, str], ...], extra: dict[str, str] | None = None) -> str:
    items = dict(key)
    if extra:
        items.update(extra)
    if not items:
        return ""
    inner = ",".join(f'{k}="{v}"' for k, v in sorted(items.items()))
    return "{" + inner + "}"


@dataclass
class Counter:
    name: str
    help: str
    values: dict = field(default_factory=lambda: defaultdict(float))

    def inc(self, labels: dict[str, str] | None = None, n: float = 1.0) -> None:
        self.values[_lkey(labels or {})] += n

    def get(self, labels: dict[str, str] | None = None) -> float:
        return self.values.get(_lkey(labels or {}), 0.0)

    def render(self) -> Iterable[str]:
        yield f"# HELP {self.name} {self.help}"
        yield f"# TYPE {self.name} counter"
        for key, v in sorted(self.values.items()):
            yield f"{self.name}{_fmt_labels(key)} {v:g}"


@dataclass
class Gauge:
    name: str
    help: str
    values: dict = field(default_factory=dict)

    def set(self, value: float, labels: dict[str, str] | None = None) -> None:
        self.values[_lkey(labels or {})] = float(value)

    def get(self, labels: dict[str, str] | None = None) -> float | None:
        return self.values.get(_lkey(labels or {}))

    def render(self) -> Iterable[str]:
        yield f"# HELP {self.name} {self.help}"
        yield f"# TYPE {self.name} gauge"
        for key, v in sorted(self.values.items()):
            yield f"{self.name}{_fmt_labels(key)} {v:g}"


@dataclass
class Histogram:
    name: str
    help: str
    buckets: tuple = _DURATION_BUCKETS
    counts: dict = field(default_factory=lambda: defaultdict(lambda: defaultdict(int)))
    sums: dict = field(default_factory=lambda: defaultdict(float))
    totals: dict = field(default_factory=lambda: defaultdict(int))

    def observe(self, value: float, labels: dict[str, str] | None = None) -> None:
        key = _lkey(labels or {})
        for b in self.buckets:
            if value <= b:
                self.counts[key][b] += 1
        self.sums[key] += value
        self.totals[key] += 1

    def render(self) -> Iterable[str]:
        yield f"# HELP {self.name} {self.help}"
        yield f"# TYPE {self.name} histogram"
        for key in sorted(self.totals):
            # observe() increments every bucket the value fits in, so the
            # stored per-bucket counts are already cumulative
            for b in self.buckets:
                yield f"{self.name}_bucket{_fmt_labels(key, {'le': str(b)})} {self.counts[key].get(b, 0)}"
            yield f"{self.name}_bucket{_fmt_labels(key, {'le': '+Inf'})} {self.totals[key]}"
            yield f"{self.name}_sum{_fmt_labels(key)} {self.sums[key]:g}"
            yield f"{self.name}_count{_fmt_labels(key)} {self.totals[key]}"


class ReconciliationMetrics:
    """The reference's reconciliation metric family, name-for-name."""

    def __init__(self):
        self.runs_total = Counter(
            "reconciliation_runs_total", "Total number of reconciliation runs"
        )
        self.duration_seconds = Histogram(
            "reconciliation_duration_seconds",
            "Duration of reconciliation runs in seconds",
        )
        self.last_run_timestamp = Gauge(
            "reconciliation_last_run_timestamp", "Timestamp of last reconciliation run"
        )
        self.row_count_mismatch_total = Counter(
            "reconciliation_row_count_mismatch_total",
            "Total number of row count mismatches detected",
        )
        self.row_count_difference = Gauge(
            "reconciliation_row_count_difference",
            "Difference in row counts (source - target)",
        )
        self.checksum_mismatch_total = Counter(
            "reconciliation_checksum_mismatch_total",
            "Total number of checksum mismatches detected",
        )
        self.rows_compared_total = Counter(
            "reconciliation_rows_compared_total", "Total number of rows compared"
        )
        self.comparison_rate = Gauge(
            "reconciliation_comparison_rate_rows_per_second",
            "Rate of row comparison (rows/second)",
        )

    def _all(self) -> list:
        return [
            self.runs_total,
            self.duration_seconds,
            self.last_run_timestamp,
            self.row_count_mismatch_total,
            self.row_count_difference,
            self.checksum_mismatch_total,
            self.rows_compared_total,
            self.comparison_rate,
        ]

    def record_run(
        self,
        table: str,
        status: str,
        duration_s: float,
        result: dict[str, Any] | None = None,
    ) -> None:
        """Fold one runner TableResult into the counters (the reference's
        record_reconciliation_run + record_discrepancy combined)."""
        t = {"table_name": table}
        self.runs_total.inc({**t, "status": status})
        self.duration_seconds.observe(duration_s, t)
        self.last_run_timestamp.set(time.time(), t)
        if not result:
            return
        if "source_count" in result:
            rows = result["source_count"] + result["target_count"]
            self.rows_compared_total.inc(t, rows)
            self.row_count_difference.set(
                result["source_count"] - result["target_count"], t
            )
            if duration_s > 0:
                self.comparison_rate.set(rows / duration_s, t)
            if not result.get("match", True):
                self.row_count_mismatch_total.inc(t)
        if result.get("checksum_match") is False:
            self.checksum_mismatch_total.inc(t)

    def render_text(self) -> str:
        """Prometheus text-exposition snapshot."""
        lines: list[str] = []
        for m in self._all():
            lines.extend(m.render())
        return "\n".join(lines) + "\n"

    def to_prometheus(self, registry=None):
        """Mirror current counter/gauge state into prometheus_client
        (optional dependency; import gated like credentials.hvac)."""
        try:
            from prometheus_client import CollectorRegistry, Counter as PCounter, Gauge as PGauge
        except ImportError as e:  # pragma: no cover - env without the lib
            raise RuntimeError("prometheus_client is not installed") from e
        registry = registry or CollectorRegistry()
        for m in (self.runs_total, self.row_count_mismatch_total,
                  self.checksum_mismatch_total, self.rows_compared_total):
            if not m.values:
                continue
            names = sorted({k for key in m.values for k, _ in key})
            pc = PCounter(m.name, m.help, names, registry=registry)
            for key, v in m.values.items():
                pc.labels(**dict(key)).inc(v)
        for m in (self.last_run_timestamp, self.row_count_difference, self.comparison_rate):
            if not m.values:
                continue
            names = sorted({k for key in m.values for k, _ in key})
            pg = PGauge(m.name, m.help, names, registry=registry)
            for key, v in m.values.items():
                pg.labels(**dict(key)).set(v)
        return registry
