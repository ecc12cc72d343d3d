"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares:

- row count
- column-name set
- order-insensitive multiset of rows (columns sorted by name, values
  stringified)
- output dtypes: any Spark DecimalType output column, or any DECIMAL /
  HUGEINT column in the oracle's result, is flagged as a failure even when
  the values match. The driver's comparator normalizes oracle values
  through float64, so Decimal('1234.50') vs '1234.5' (or HUGEINT 0 vs
  '0.0') hash-mismatches despite identical values — final outputs must be
  double/BIGINT on both engines (round-1 verdict, 11 queries).

Usage: python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from sqlserver_pg_cdc_spark.session import get_spark
from sqlserver_pg_cdc_spark.sources.parquet import TABLES


def _norm(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # mimic the driver: decimals are read back through float64
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_unsafe_duck_cols(con, sql: str) -> list[str]:
    """Column names whose DuckDB type the driver float64-normalizes."""
    bad = []
    for row in con.execute(f"DESCRIBE {sql}").fetchall():
        name, typ = row[0], row[1]
        t = typ.upper()
        if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
            bad.append(f"{name}:{typ}")
    return bad


def _hash_unsafe_spark_cols(df) -> list[str]:
    from pyspark.sql.types import DecimalType

    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
        spark_s = time.time() - t0
        # release persisted result frames between queries (cache hygiene)
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"  {name:32s} rows={len(spark_rows):7d} ({spark_s:5.1f}s)  [rows-only, no oracle]")
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
        duck_s = time.time() - t0

        problems = []
        unsafe_s = _hash_unsafe_spark_cols(df)
        if unsafe_s:
            problems.append(f"spark decimal output (driver hash-unsafe): {unsafe_s}")
        unsafe_d = _hash_unsafe_duck_cols(con, oracles[name])
        if unsafe_d:
            problems.append(f"oracle DECIMAL/HUGEINT output (driver hash-unsafe): {unsafe_d}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            sm = _rows_multiset(spark_cols, spark_rows)
            dm = _rows_multiset(duck_cols, duck_rows)
            if sm != dm:
                diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values: first diffs {diffs}")
        status = "OK " if not problems else "FAIL"
        print(
            f"  {name:32s} rows={len(spark_rows):7d} spark={spark_s:5.1f}s duck={duck_s:5.1f}s  {status}"
        )
        for p in problems:
            print(f"      {p}")
        if problems:
            failures.append(name)

    print()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
