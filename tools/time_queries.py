"""Time a subset of declared queries with bench.py's exact methodology
(median of --repeat runs, noop sink, one process) — for same-process
A/B measurement of individual optimizations without a full bench run.

Usage:
    python tools/time_queries.py [--repeat N] [--sf DIR] query [query ...]

Prints one "<name> <median>s  runs=[...]" line per query, then a total.
Host timing weather is ~2x across hours: only compare numbers from runs
taken minutes apart (or the same process — pass a query twice).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postfix_log_parser_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    repeat = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark("time_queries")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    total = 0.0
    for name in names:
        fn = queries[name]
        runs: list[float] = []
        for _ in range(repeat):
            # match bench.py (r13): result-staged queries time a real
            # execution every repeat, not a StageCache read
            from postfix_log_parser_spark.ext.staging import (
                clear_result_stages,
            )

            clear_result_stages(name)
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(runs)
        total += med
        print(f"{name} {med:.3f}s  runs={[round(r, 3) for r in runs]}", flush=True)
    print(f"TOTAL {total:.3f}s over {len(names)} queries (median-of-{repeat})")


if __name__ == "__main__":
    main()
