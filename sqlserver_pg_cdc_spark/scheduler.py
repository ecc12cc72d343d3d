"""Scheduling (reference O3, scheduler/scheduler.py: APScheduler interval
+ 5-field cron triggers) and retry with backoff (reference O4,
utils/retry.py:85-309).

No external scheduler library here: a minimal, dependency-free 5-field
cron matcher plus a blocking loop. Production deployments would hand the
same job callable to cron/Airflow — the engine-side contract is just
"call me with a SparkSession".
"""

from __future__ import annotations

import datetime as _dt
import random
import time
from dataclasses import dataclass
from typing import Callable


# ---------------------------------------------------------------------------
# 5-field cron (minute hour day-of-month month day-of-week)
# ---------------------------------------------------------------------------

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*":
            lo2, hi2 = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo2, hi2 = int(a), int(b)
        else:
            lo2 = hi2 = int(part)
        if not (lo <= lo2 <= hi2 <= hi):
            raise ValueError(f"cron field out of range: {part} not in [{lo},{hi}]")
        out.update(range(lo2, hi2 + 1, step))
    return out


@dataclass(frozen=True)
class CronSchedule:
    minute: frozenset
    hour: frozenset
    dom: frozenset
    month: frozenset
    dow: frozenset
    dom_any: bool = True  # field was '*'
    dow_any: bool = True

    @classmethod
    def parse(cls, expr: str) -> "CronSchedule":
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(f"cron needs 5 fields, got {len(fields)}: {expr!r}")
        parsed = [
            frozenset(_parse_field(f, lo, hi))
            for f, (lo, hi) in zip(fields, _FIELD_RANGES)
        ]
        return cls(*parsed, dom_any=fields[2] == "*", dow_any=fields[4] == "*")

    def matches(self, t: _dt.datetime) -> bool:
        base = (
            t.minute in self.minute
            and t.hour in self.hour
            and t.month in self.month
        )
        if not base:
            return False
        dom_ok = t.day in self.dom
        dow_ok = t.weekday() in _to_cron_dow(self.dow)
        # vixie-cron day semantics: when BOTH day fields are restricted,
        # either may match (OR); otherwise both constraints apply
        if not self.dom_any and not self.dow_any:
            return dom_ok or dow_ok
        return dom_ok and dow_ok

    def next_fire(self, after: _dt.datetime) -> _dt.datetime:
        """Next matching minute strictly after ``after`` (scans minutes;
        bounded at 4 years for degenerate specs like Feb 30)."""
        t = after.replace(second=0, microsecond=0) + _dt.timedelta(minutes=1)
        for _ in range(4 * 366 * 24 * 60):
            if self.matches(t):
                return t
            t += _dt.timedelta(minutes=1)
        raise ValueError("cron expression never fires")


def _to_cron_dow(dow: frozenset) -> set[int]:
    # cron: 0=Sunday..6=Saturday, 7=Sunday (vixie); python weekday(): 0=Mon..6=Sun
    return {((d % 7) - 1) % 7 for d in dow}


class Scheduler:
    """Blocking scheduler: interval or cron jobs, reference semantics
    (scheduler.py:32-139) without the APScheduler dependency."""

    def __init__(self) -> None:
        self._jobs: list[tuple[str, Callable[[], None], float | CronSchedule]] = []

    def add_interval_job(self, name: str, fn: Callable[[], None], seconds: float) -> None:
        self._jobs.append((name, fn, float(seconds)))

    def add_cron_job(self, name: str, fn: Callable[[], None], cron_expr: str) -> None:
        self._jobs.append((name, fn, CronSchedule.parse(cron_expr)))

    def run(self, max_fires: int | None = None, now_fn=None, sleep_fn=time.sleep) -> int:
        """Run until ``max_fires`` total job firings (None = forever).
        ``now_fn``/``sleep_fn`` injectable for tests. Jobs are tracked by
        registration index, so duplicate names cannot shadow each other."""
        now_fn = now_fn or (lambda: _dt.datetime.now())
        fires = 0
        next_at: dict[int, _dt.datetime] = {}
        for idx, (_, _, trig) in enumerate(self._jobs):
            now = now_fn()
            next_at[idx] = (
                now + _dt.timedelta(seconds=trig)
                if isinstance(trig, float)
                else trig.next_fire(now)
            )
        while max_fires is None or fires < max_fires:
            if not self._jobs:
                return fires
            idx = min(next_at, key=next_at.get)
            _, fn, trig = self._jobs[idx]
            wait = (next_at[idx] - now_fn()).total_seconds()
            if wait > 0:
                sleep_fn(wait)
            # per-fire error isolation: one failing job must not kill the
            # scheduler loop (pair with retry_with_backoff inside the job
            # for transient errors)
            try:
                fn()
            except Exception:  # noqa: BLE001
                import logging

                logging.getLogger(__name__).exception(
                    "scheduled job %r failed; continuing", self._jobs[idx][0]
                )
            fires += 1
            now = now_fn()
            next_at[idx] = (
                now + _dt.timedelta(seconds=trig)
                if isinstance(trig, float)
                else trig.next_fire(now)
            )
        return fires


# ---------------------------------------------------------------------------
# retry with backoff (reference O4)
# ---------------------------------------------------------------------------

def retry_with_backoff(
    fn: Callable,
    retries: int = 3,
    base_delay: float = 1.0,
    backoff_base: float = 2.0,
    jitter: float = 0.25,
    retryable: Callable[[Exception], bool] | None = None,
    sleep_fn=time.sleep,
    on_retry: Callable[[int, Exception], None] | None = None,
):
    """Exponential backoff (base 2) with +/-25% jitter and a
    retryable-exception classifier (reference retry.py:85-309). Spark
    retries tasks natively; this is for driver-side setup (connections,
    external calls)."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classified below
            if retryable is not None and not retryable(e):
                raise
            attempt += 1
            if attempt > retries:
                raise
            delay = base_delay * (backoff_base ** (attempt - 1))
            delay *= 1 + random.uniform(-jitter, jitter)
            if on_retry:
                on_retry(attempt, e)
            sleep_fn(max(0.0, delay))
