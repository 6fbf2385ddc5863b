"""Per-query shuffle-byte audit over the driver contract.

PLANS.md and tests/test_plans.py pin plan SHAPES; this tool measures
the bytes those shapes actually move: for every ``queries()`` entry it
runs the query to completion and attributes the completed stages'
shuffle read/write and scan-input bytes to it (stage ids are
monotonic, so a per-query watermark diff is exact).  The output —
``SHUFFLE_AUDIT.json`` — ranks queries by shuffle write, the number a
100 TB capacity plan actually multiplies out, and catches "plan looks
right but moves 10x the bytes" regressions that plan-string pins
cannot.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _stages(ui: str, app_id: str) -> list[dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    return json.load(urllib.request.urlopen(url))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("shuffle-audit")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    queries = entrymod.queries()
    names = sorted(only) if only else sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    ui = spark.sparkContext.uiWebUrl
    app_id = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0][
        "id"
    ]

    out: dict[str, dict] = {}
    seen_stage = -1
    for name in names:
        t0 = time.monotonic()
        try:
            queries[name](spark, sf_dir).collect()
            err = None
        except Exception as ex:  # keep auditing the rest
            err = f"{type(ex).__name__}: {ex}"[:200]
        wall = round(time.monotonic() - t0, 3)
        stages = [
            s for s in _stages(ui, app_id) if s["stageId"] > seen_stage
        ]
        if stages:
            seen_stage = max(s["stageId"] for s in stages)
        rec = {
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes", 0) for s in stages
            ),
            "shuffle_read_bytes": sum(
                s.get("shuffleReadBytes", 0) for s in stages
            ),
            "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
            "n_stages": len(stages),
            "wall_sec": wall,
        }
        if err:
            rec["error"] = err
        out[name] = rec
        print(
            f"{name:38s} shufW={rec['shuffle_write_bytes']:>12,} "
            f"shufR={rec['shuffle_read_bytes']:>12,} "
            f"in={rec['input_bytes']:>12,} stages={rec['n_stages']:>3}"
            + (f"  ERROR {err}" if err else "")
        )

    ranked = sorted(
        out.items(), key=lambda kv: -kv[1]["shuffle_write_bytes"]
    )
    doc = {
        "sf_dir": sf_dir,
        "total_shuffle_write_bytes": sum(
            v["shuffle_write_bytes"] for v in out.values()
        ),
        "top10_by_shuffle_write": [
            {"query": k, **v} for k, v in ranked[:10]
        ],
        "queries": out,
    }
    with open("/root/repo/SHUFFLE_AUDIT.json", "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(
        f"\nwrote SHUFFLE_AUDIT.json — total shuffle write "
        f"{doc['total_shuffle_write_bytes']:,} bytes over {len(out)} queries"
    )
    errors = [k for k, v in out.items() if "error" in v]
    if errors:
        print(f"errors: {errors}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
