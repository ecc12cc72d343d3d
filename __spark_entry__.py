"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — name -> (spark, sf_dir) -> DataFrame, one per implemented
operator from SURVEY.md §2 (catalog in sqlserver_pg_cdc_spark/workload.py).
``oracle_sql()`` — matching DuckDB SQL per query name.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlserver_pg_cdc_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full row-level reconciliation diff of orders vs a
    deterministically perturbed target at sf0.001 (the reference's core
    capability, as one full-outer join)."""
    return workload.q_diff_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in workload.build_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in workload.build_catalog().items()
        if spec.oracle is not None
    }
