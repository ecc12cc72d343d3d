"""Optimization-round measurement harness (guide §1).

For each named query: build the DataFrame, capture .explain("formatted")
to plans/<tag>/<name>_<suffix>.txt, and time N noop-sink executions
(the computation, not the sink). Prints one JSON line per query with
all runs + best.

Usage:
  python scripts/opt_measure.py [--sf DIR] [--runs N] [--tag r12]
                                [--suffix before] [--no-plans] QUERY...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlserver_pg_cdc_spark import workload
from sqlserver_pg_cdc_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    spark = get_spark("opt_measure")
    catalog = workload.build_catalog(spark)
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(plans_dir, exist_ok=True)

    # warm the file indexes once so first-touch costs stay off query 1
    from sqlserver_pg_cdc_spark.sources.parquet import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).count()

    names = list(args.queries)
    if names == ["ALL"]:
        names = list(catalog)
    for name in names:
        spec = catalog.get(name)
        if spec is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        runs = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            df = spec.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if i == 0 and not args.no_plans:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:
                    import contextlib
                    import io

                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(
                    os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan)
        spark.catalog.clearCache()
        print(json.dumps({
            "query": name, "runs": runs, "best": min(runs),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
