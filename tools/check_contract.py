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


# ---------------------------------------------------------------------------
# Typed comparison (documented coercion map)
#
# The driver hashes TYPED result cells, so a value-identical result can still
# hash-mismatch when the declared types drift — the q101 episode: DuckDB
# sum(INTEGER) yields HUGEINT (int128, surfaced as float64/Decimal through
# pandas) while Spark sum(int) yields bigint.  A str()-normalized compare is
# blind to that class.  We therefore canonicalize both engines' declared
# column types and FAIL on any mismatch, with exactly these sanctioned
# coercions (chosen to match what the driver demonstrably tolerates across
# 49 green rounds-5/6 rows):
#   * all signed/unsigned ints of width <= 64  -> "int"   (python int either way)
#   * HUGEINT / int128                         -> "int128" (NEVER matches "int")
#   * float32 / float64                        -> "float"
#   * timestamp with/without tz                -> "ts"
# Everything else (decimal, string, bool, date, binary, list, struct, map)
# must agree structurally.
# ---------------------------------------------------------------------------

_SPARK_CANON = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bin",
    "void": "null",
}

_DUCK_CANON = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "int128", "UHUGEINT": "int128",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
    "BLOB": "bin", '"NULL"': "null", "NULL": "null",
}


def canon_spark_type(dt: str) -> str:
    dt = dt.strip()
    if dt.startswith("decimal("):
        return "decimal" + dt[len("decimal"):]
    if dt.startswith("array<") and dt.endswith(">"):
        return f"list<{canon_spark_type(dt[6:-1])}>"
    if dt.startswith("map<"):
        return "map"
    if dt.startswith("struct<"):
        return "struct"
    return _SPARK_CANON.get(dt, dt)


def canon_duck_type(dt: str) -> str:
    dt = dt.strip()
    if dt.endswith("[]"):
        return f"list<{canon_duck_type(dt[:-2])}>"
    if dt.startswith("DECIMAL("):
        return "decimal" + dt[len("DECIMAL"):].lower()
    if dt.startswith("STRUCT"):
        return "struct"
    if dt.startswith("MAP"):
        return "map"
    return _DUCK_CANON.get(dt, dt)


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # IEEE -0.0 == 0.0 — don't let the sign bit differ
            return "0"
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}
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
            stypes = {f.name: canon_spark_type(f.dataType.simpleString())
                      for f in sdf.schema.fields}
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"pass": False, "status": "spark_error",
                             "err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows={len(srows)} (no oracle, rows-only) "
                  f"[{spark_t:.1f}s]")
            results[name] = {"pass": len(srows) > 0, "status": "rows_only",
                             "rows": len(srows)}
            if len(srows) == 0:
                failures.append(name)
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            otypes = {c: canon_duck_type(str(t))
                      for c, t in zip(rel.columns, rel.types)}
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"pass": False, "status": "duckdb_error",
                             "err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"FAIL  {name}: duckdb error {type(exc).__name__}: {exc}")
            continue
        duck_t = time.time() - t1
        ok = True
        status = "typed_match"
        type_drift = {
            c: (stypes[c], otypes[c])
            for c in stypes
            if c in otypes and stypes[c] != otypes[c]
        }
        if sorted(scols) != sorted(ocols):
            ok = False
            status = "column_mismatch"
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
        elif type_drift:
            ok = False
            status = "type_drift"
            drift = ", ".join(
                f"{c}: spark={s} duck={d}" for c, (s, d) in type_drift.items()
            )
            print(f"FAIL  {name}: TYPE drift ({drift})")
        elif len(srows) != len(orows):
            ok = False
            status = "row_count_mismatch"
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(orows)}")
        else:
            a = norm_rows(scols, srows)
            b = norm_rows(ocols, orows)
            if a != b:
                ok = False
                status = "value_mismatch"
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs:")
                for x, y in diff:
                    print(f"   spark: {x}")
                    print(f"   duck : {y}")
        results[name] = {
            "pass": ok, "status": status, "rows": len(srows),
            "spark_sec": round(spark_t, 2), "duck_sec": round(duck_t, 2),
        }
        if type_drift:
            results[name]["type_drift"] = {
                c: f"spark={s} duck={d}" for c, (s, d) in type_drift.items()
            }
        if ok:
            print(f"PASS  {name}: rows={len(srows)} "
                  f"[spark {spark_t:.1f}s, duck {duck_t:.1f}s]")
        else:
            failures.append(name)

    print(f"\n{n_run - len(failures)}/{n_run} green")
    if failures:
        print("failures:", ", ".join(failures))
    from postfix_log_parser_spark.ext.staging import clear_stages

    clear_stages()  # release staged checkpoint frames (lifecycle contract)
    if json_out:
        import json as _json
        with open(json_out, "w") as fh:
            _json.dump({"sf_dir": sf_dir, "n_run": n_run,
                        "n_green": n_run - len(failures),
                        "comparison": "typed (canonical type map + "
                                      "order-insensitive value compare)",
                        "results": results}, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
