"""Same-process A/B for the trailing no-data micro-batch skip.

Arm A forces the pre-change behavior (no-data batch runs) by wrapping
``logquery._run_stream_to_memory`` with ``need_nodata=True``; arm B is
HEAD behavior.  Arms alternate per repeat in ONE process so host
weather hits both equally.

Usage: python tools/ab_nodata.py [--repeat N] [--sf DIR] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postfix_log_parser_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q49_stream_hourly",
    "q50_stream_enrich",
    "q51_stream_dedup",
    "q54_stream_sessions",
    "q88_stream_interval_join",
    "q95_stream_dedup_within_watermark",
    "q150_stream_curation",
    "q169_stream_hdr_quantiles",
]


def main() -> None:
    args = sys.argv[1:]
    repeat = 5
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
    names = names or DEFAULT_QUERIES

    spark = get_spark("ab_nodata")
    import __spark_entry__ as entrymod
    from postfix_log_parser_spark import logquery

    queries = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    orig = logquery._run_stream_to_memory

    def forced_nodata(spark, df, prefix, output_mode=None, need_nodata=False):
        return orig(spark, df, prefix, output_mode, True)

    tot_a = tot_b = 0.0
    for name in names:
        fn = queries[name]
        runs: dict[str, list[float]] = {"old": [], "new": []}
        for r in range(repeat):
            for arm in ("old", "new"):
                logquery._run_stream_to_memory = (
                    forced_nodata if arm == "old" else orig
                )
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}:{r}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs[arm].append(time.time() - t0)
        logquery._run_stream_to_memory = orig
        ma = statistics.median(runs["old"])
        mb = statistics.median(runs["new"])
        tot_a += ma
        tot_b += mb
        print(
            f"{name:40s} old={ma:6.3f}s new={mb:6.3f}s "
            f"delta={mb - ma:+6.3f}s  old_runs={[round(x, 2) for x in runs['old']]}"
            f" new_runs={[round(x, 2) for x in runs['new']]}"
        )
    print(f"TOTAL old={tot_a:.2f}s new={tot_b:.2f}s delta={tot_b - tot_a:+.2f}s")


if __name__ == "__main__":
    main()
