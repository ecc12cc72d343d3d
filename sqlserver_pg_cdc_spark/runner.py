"""Multi-table reconciliation runner (reference O2, parallel/reconciler.py
and compare/counts.py reconcile_table).

Parallelism model: WITHIN a table, Spark already parallelizes the scan/
join/agg across executors. ACROSS tables we submit independent Spark
actions from a driver thread pool, each in a FAIR scheduler pool so a big
table can't starve small ones — the Spark-native replacement for the
reference's ThreadPoolExecutor-over-DB-connections (max_workers=4,
per-table timeout, fail-fast cancellation)."""

from __future__ import annotations

import datetime as _dt
import time
from concurrent.futures import ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from sqlserver_pg_cdc_spark.operators.checksum import table_checksum
from sqlserver_pg_cdc_spark.operators.diff import diff_tables

TablePair = Callable[[], tuple[DataFrame, DataFrame]]


@dataclass
class TableResult:
    table: str
    status: str = "success"  # success | failed | timeout
    result: dict[str, Any] = field(default_factory=dict)
    error: str | None = None
    duration_s: float = 0.0


def reconcile_table(
    source: DataFrame,
    target: DataFrame,
    table: str,
    pk_cols: list[str] | None = None,
    validate_checksums: bool = False,
    row_level: bool = False,
    compare_cols: list[str] | None = None,
    change_col: str | None = None,
    since: str | None = None,
) -> dict[str, Any]:
    """One table's comparison record (input to report.generate_report).

    counts always; checksums opt-in (A3 commutative — one extra pass per
    side); row-level diff opt-in and only meaningful with pk_cols. With
    ``change_col``+``since`` the checksum runs in incremental (delta)
    mode over rows changed after the cutoff (reference A4: 10-100x on
    low-churn tables — pushdown does the pruning).
    """
    from sqlserver_pg_cdc_spark.tracing import get_tracer

    tracer = get_tracer()
    out: dict[str, Any] = {"table": table, "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat()}
    with tracer.span("reconcile_table", table=table) as root:
        with tracer.span("count_comparison", table=table):
            sc, tc = source.count(), target.count()
        out.update(
            source_count=sc,
            target_count=tc,
            difference=tc - sc,
            match=sc == tc,
            status="MATCH" if sc == tc else "MISMATCH",
        )
        if validate_checksums:
            with tracer.span("checksum_comparison", table=table):
                if change_col and since:
                    from sqlserver_pg_cdc_spark.operators.checksum import incremental_checksum

                    s_sum = incremental_checksum(source, change_col, since, compare_cols).collect()[0]
                    t_sum = incremental_checksum(target, change_col, since, compare_cols).collect()[0]
                    out["checksum_mode"] = "delta"
                    out["delta_rows"] = s_sum["row_count"]
                    s_sum, t_sum = s_sum["checksum"], t_sum["checksum"]
                else:
                    s_sum = table_checksum(source, compare_cols).collect()[0]["checksum"]
                    t_sum = table_checksum(target, compare_cols).collect()[0]["checksum"]
                    if change_col:
                        out["checksum_mode"] = "full"
            out.update(
                source_checksum=s_sum,
                target_checksum=t_sum,
                checksum_match=s_sum == t_sum,
            )
        if row_level and pk_cols:
            with tracer.span("row_level_diff", table=table):
                d = diff_tables(source, target, pk_cols, compare_cols)
                counts = {r[0]: r[1] for r in d.groupBy("diff_type").count().collect()}
            out["row_level"] = {
                "missing": counts.get("MISSING", 0),
                "extra": counts.get("EXTRA", 0),
                "modified": counts.get("MODIFIED", 0),
            }
        root.set_attribute("status", out["status"])
    return out


class ParallelReconciler:
    """Driver thread pool over Spark actions with FAIR pools, per-table
    timeout and fail-fast (reference parallel/reconciler.py:36-344)."""

    def __init__(
        self,
        spark: SparkSession,
        max_workers: int = 4,
        table_timeout_s: float = 3600.0,
        fail_fast: bool = False,
        metrics=None,
    ):
        self.spark = spark
        self.max_workers = max_workers
        self.table_timeout_s = table_timeout_s
        self.fail_fast = fail_fast
        # O6: reconciliation counters (metrics.ReconciliationMetrics);
        # recorded per table as each run finishes
        self.metrics = metrics

    def reconcile_tables(
        self,
        pairs: dict[str, TablePair],
        **reconcile_kwargs: Any,
    ) -> list[TableResult]:
        spark = self.spark
        stop = {"flag": False}

        def run_one(name: str, make: TablePair) -> TableResult:
            t0 = time.time()
            if stop["flag"]:
                return TableResult(name, status="failed", error="cancelled (fail-fast)")
            # FAIR pool per table so concurrent jobs share executors
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            try:
                src, tgt = make()
                res = reconcile_table(src, tgt, name, **reconcile_kwargs)
                out = TableResult(name, result=res, duration_s=time.time() - t0)
            except Exception as e:  # noqa: BLE001 - surfaced in the result
                if self.fail_fast:
                    stop["flag"] = True
                out = TableResult(
                    name, status="failed", error=f"{type(e).__name__}: {e}",
                    duration_s=time.time() - t0,
                )
            finally:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
            if self.metrics is not None:
                self.metrics.record_run(name, out.status, out.duration_s, out.result)
            return out

        # table_timeout_s is a RUN deadline: once it passes, undone tables
        # are reported as timeouts, queued ones are cancelled, and the
        # executor is shut down WITHOUT waiting so stragglers can't block
        # the caller past the deadline (their results are discarded).
        results: list[TableResult] = []
        pool = ThreadPoolExecutor(max_workers=self.max_workers)
        try:
            start = time.time()
            futures = {pool.submit(run_one, n, mk): n for n, mk in pairs.items()}
            # NB: run_one converts exceptions to results, so no future ever
            # completes exceptionally — fail_fast works through the stop
            # flag (queued tables cancel), not through early wait() return
            wait(futures, timeout=self.table_timeout_s)
            for fut, name in futures.items():
                if fut.done():
                    results.append(fut.result())
                else:
                    fut.cancel()
                    results.append(
                        TableResult(name, status="timeout",
                                    error=f"run deadline {self.table_timeout_s}s exceeded",
                                    duration_s=round(time.time() - start, 3))
                    )
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
        return results

    @staticmethod
    def stats(results: list[TableResult]) -> dict[str, Any]:
        return {
            "successful": sum(1 for r in results if r.status == "success"),
            "failed": sum(1 for r in results if r.status == "failed"),
            "timeout": sum(1 for r in results if r.status == "timeout"),
            "total_duration_s": round(sum(r.duration_s for r in results), 3),
        }


def estimate_optimal_workers(n_tables: int, cpus: int) -> int:
    """Reference parallel/helpers.py:65-138 heuristic, Spark-adjusted:
    actions mostly wait on the cluster, so modest driver-side concurrency
    suffices; bounded by tables and half the cores."""
    return max(1, min(n_tables, 4, max(1, cpus // 2)))
