"""Physical-plan introspection & advice (reference advisory plane,
src/utils/query_optimizer/analyzer.py + advisor.py).

The reference parses PG JSON / MSSQL text EXPLAIN output into
``ExecutionPlanMetrics`` (plan type, scan kinds, join kinds, warnings) and
recommends indexes. The Spark analog reads the formatted physical plan:
scan nodes with pushed filters, join strategies, exchanges (shuffles),
whole-stage-codegen coverage — and warns about the patterns that hurt at
scale (cartesian products, row-at-a-time Python evals, full scans with no
pushed filters, excessive shuffles). The index-advisor analog recommends
partitioning/bucketing columns instead of b-trees.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanMetrics:
    """Spark twin of the reference's ExecutionPlanMetrics
    (analyzer.py:61-80)."""

    scans: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    exchanges: int = 0
    has_cartesian: bool = False
    # true all-pairs blowup: a CartesianProduct node (both sides shuffled).
    # has_cartesian also covers BroadcastNestedLoopJoin Cross — the cheap
    # 1-row-aggregate broadcast attach pattern — so scale audits that
    # tolerate the attach but not the blowup should check this flag.
    has_shuffle_cartesian: bool = False
    python_evals: int = 0
    codegen_stages: int = 0
    pushed_filters: int = 0
    unfiltered_scans: int = 0
    warnings: list[str] = field(default_factory=list)


_JOIN_KINDS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan via the public explain() API."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def analyze_plan(df: DataFrame) -> PlanMetrics:
    """Extract metrics from the formatted physical plan string."""
    plan = formatted_plan(df)
    m = PlanMetrics()

    for line in plan.splitlines():
        s = line.strip()
        if re.match(r"^\(\d+\) Scan ", s) or "FileScan" in s:
            m.scans.append(s)
        for jk in _JOIN_KINDS:
            if jk in s and s not in m.joins:
                m.joins.append(s)
        # count only the numbered detail header — the tree summary at the
        # top of a formatted plan repeats every node and would double it
        if re.match(r"^\(\d+\) Exchange\b", s) and "Reused" not in s:
            m.exchanges += 1
        # a cross join surfaces as CartesianProduct (both sides big) or a
        # BroadcastNestedLoopJoin with "Join type: Cross" (one side small)
        if "CartesianProduct" in s or "Join type: Cross" in s:
            m.has_cartesian = True
        if "CartesianProduct" in s:
            m.has_shuffle_cartesian = True
        if "BatchEvalPython" in s or "ArrowEvalPython" in s:
            m.python_evals += 1
        # simple mode prints WholeStageCodegen nodes; formatted mode
        # annotates operators with [codegen id : N]
        if "WholeStageCodegen" in s:
            m.codegen_stages += 1

    ids = set(re.findall(r"\[codegen id : (\d+)\]", plan))
    m.codegen_stages = max(m.codegen_stages, len(ids))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    m.pushed_filters = sum(1 for p in pushed if p.strip())
    m.unfiltered_scans = sum(1 for p in pushed if not p.strip())

    if m.has_cartesian:
        m.warnings.append(
            "cartesian product in plan — add a join condition or blocking key"
        )
    if "BatchEvalPython" in plan:
        m.warnings.append(
            "row-at-a-time Python UDF in plan — convert to pandas_udf (Arrow)"
        )
    if m.exchanges > 3:
        m.warnings.append(
            f"{m.exchanges} shuffles — check for reusable partitioning or "
            "broadcastable sides"
        )
    return m


def recommend_layout(df: DataFrame, join_keys: list[str] | None = None,
                     filter_keys: list[str] | None = None) -> list[str]:
    """The index-advisor analog (advisor.py:33-234): at 100 TB the lever
    is physical layout, not b-trees."""
    recs = []
    if join_keys:
        recs.append(
            f"bucket/cluster by {join_keys} to co-locate the join and avoid "
            "its shuffle (bucketBy on write, or pre-repartition both sides)"
        )
    if filter_keys:
        recs.append(
            f"partition output files by {filter_keys} so selective reads "
            "prune partitions at the scan"
        )
    ncols = len(df.columns)
    if ncols > 20:
        recs.append(
            f"{ncols} columns — keep projections explicit so parquet column "
            "pruning holds"
        )
    return recs
