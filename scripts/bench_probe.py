"""Host-health probe for interpreting bench variance.

local[32] throughput collapses when the hypervisor oversubscribes
vCPUs — identical code has measured 84s..319s bench totals across a few
hours. This probe separates machine state from plan regressions:

- ``py_single``: single-core pure-python loop (normal ~0.3s) — if slow,
  everything is throttled;
- ``jvm_parallel``: 32-thread Spark range-sum (healthy < 1.5s; observed
  3.5-5.5s when the host is oversubscribed) — if slow while py_single is
  normal, the guest is not getting its vCPUs and absolute bench totals
  from that window should be discounted (compare query-RELATIVE times).

Usage: python scripts/bench_probe.py   ->  one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    t0 = time.time()
    acc = 0
    for i in range(20_000_000):
        acc += i
    py_single = round(time.time() - t0, 3)

    from sqlserver_pg_cdc_spark.session import get_spark

    spark = get_spark("bench-probe")
    spark.range(1000).count()  # session warm
    t0 = time.time()
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    jvm_parallel = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "py_single_s": py_single,
                "jvm_parallel_s": jvm_parallel,
                "healthy": py_single < 0.8 and jvm_parallel < 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
