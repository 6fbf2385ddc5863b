"""Local emulation of the driver's correctness harness.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names (sorted), and order-insensitive values
(floats compared to 9 significant digits after the in-query rounding).

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from postfix_log_parser_spark.analytics import TABLES  # noqa: E402
from postfix_log_parser_spark.session import get_spark  # noqa: E402


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"unknown query name(s): {', '.join(sorted(unknown))}")
        return 2
    failures = []
    n_run = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows={len(srows)} (no oracle, rows-only) "
                  f"[{spark_t:.1f}s]")
            if len(srows) == 0:
                failures.append(name)
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(exc).__name__}: {exc}")
            continue
        duck_t = time.time() - t1
        ok = True
        if sorted(scols) != sorted(ocols):
            ok = False
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
        elif len(srows) != len(orows):
            ok = False
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(orows)}")
        else:
            a = norm_rows(scols, srows)
            b = norm_rows(ocols, orows)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs:")
                for x, y in diff:
                    print(f"   spark: {x}")
                    print(f"   duck : {y}")
        if ok:
            print(f"PASS  {name}: rows={len(srows)} "
                  f"[spark {spark_t:.1f}s, duck {duck_t:.1f}s]")
        else:
            failures.append(name)

    print(f"\n{n_run - len(failures)}/{n_run} green")
    if failures:
        print("failures:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
