"""Dump .explain("formatted") for declared queries to plans/<round>/.

Usage:
    python tools/dump_plans.py <suffix> [sf_dir] [query ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default r13) for each named query (default: all
declared queries).  Suffix is typically "before" or "after".  Queries
whose result is a staged localCheckpoint show ExistingRDD — that is the
honest plan of what the bench times on repeat runs; the cold-path plans
live in the family modules' PLANS.md pins.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postfix_log_parser_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark("dump_plans")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = sys.argv[3:] or list(queries)
    round_dir = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
