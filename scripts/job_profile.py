"""Per-job breakdown of a single catalog query (guide §1/§7.1).

Runs one query with the Spark UI enabled, then scrapes the UI REST API
for every job: submission order, duration, description, stage count.
This answers "where do the N jobs of a fixed-overhead-dominated query
spend their time" without an interactive UI.

Usage: python scripts/job_profile.py [--sf DIR] QUERY
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlserver_pg_cdc_spark import workload
from sqlserver_pg_cdc_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true",
                    help="run the query once untimed first")
    args = ap.parse_args()

    spark = get_spark(
        "job_profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    catalog = workload.build_catalog(spark)
    spec = catalog[args.query]

    from sqlserver_pg_cdc_spark.sources.parquet import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).count()

    if args.warm:
        df = spec.fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()

    base = "http://localhost:4055/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    before = {
        j["jobId"]
        for j in json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/jobs")
        )
    }

    spark.sparkContext.setJobDescription(f"{args.query} profiled")
    t0 = time.time()
    df = spec.fn(spark, args.sf)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)

    jobs = json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/jobs")
    )
    new = sorted(
        (j for j in jobs if j["jobId"] not in before),
        key=lambda j: j["jobId"],
    )
    total_job_s = 0.0
    print(f"\n=== {args.query}: wall {wall:.2f}s, {len(new)} jobs ===")
    prev_end = None
    gap_total = 0.0
    for j in new:
        sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        # durations: completionTime - submissionTime
        try:
            st = time.mktime(sub) + float(j["submissionTime"][20:23]) / 1000
            ct = j.get("completionTime")
            et = (
                time.mktime(time.strptime(ct[:19], "%Y-%m-%dT%H:%M:%S"))
                + float(ct[20:23]) / 1000
                if ct
                else st
            )
        except Exception:
            st = et = 0.0
        dur = et - st
        total_job_s += dur
        gap = (st - prev_end) if prev_end is not None else 0.0
        if prev_end is not None:
            gap_total += max(gap, 0.0)
        prev_end = et
        desc = (j.get("name") or j.get("description") or "")[:110]
        print(
            f"job {j['jobId']:>4} {dur:7.3f}s gap {max(gap,0):6.3f}s "
            f"stages={len(j.get('stageIds', []))} tasks={j.get('numTasks')} "
            f"| {desc}"
        )
    print(
        f"=== sum(job) {total_job_s:.2f}s + gaps {gap_total:.2f}s "
        f"(driver-side) vs wall {wall:.2f}s ==="
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
