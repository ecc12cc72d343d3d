"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once warm-up-free with a count()/collect() action
(collect for small results, count for large) and timed wall-clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlserver_pg_cdc_spark import workload
from sqlserver_pg_cdc_spark.session import get_spark

# queries whose full result is small enough to collect; everything else is
# counted (forces full execution without driver materialization)
_COLLECT = {
    "counts_compare_orders",
    "diff_summary_severity",
    "checksum_customer",
    "checksum_orders",
    "checksum_lineitem",
    "checksum_events",
    "checksum_incremental_events",
    "pricing_summary",
    "shipping_priority",
    "cdc_active_rows",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    catalog = workload.build_catalog(spark)
    timings: dict[str, float] = {}
    for name, spec in catalog.items():
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        if name in _COLLECT:
            df.collect()
        else:
            df.count()
        timings[name] = round(time.time() - t0, 3)

    out = {
        "metric": "workload_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
