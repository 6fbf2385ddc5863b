"""Time-series resampling — gap-fill a sparse event stream onto a dense
per-key hourly grid with forward-fill interpolation.

The reference's analytics half leans on ClickHouse's ``WITH FILL`` /
``-If`` combinators for exactly this shape (the events MergeTree,
``lognormalizer/parse.py:27-54``, is queried by hour); here the same
semantics are native Spark: ``sequence()`` generates the per-key grid
executor-side (no driver loop, no cross join against a global calendar
table), and the forward fill is ``last(ignorenulls)`` over a
``partitionBy(key)`` window — never a global sort.

Scale notes (100 TB):

* The grid is generated per key from that key's own [min, max] span, so
  grid size is output-proportional — a key active for one day never pays
  for the corpus' full calendar.
* One shuffle for the hourly pre-aggregate (map-side partial agg), one
  for the key-partitioned window; AQE coalesces the tail.  The
  ``sequence``/``explode`` runs narrow on the aggregated (small) side.
* Keys with pathological spans are naturally bounded: grid rows per key
  = span hours, and the explode happens after aggregation, on one row
  per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.analytics import load


def q70_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample of ``events.value`` with forward fill.

    Output: one row per (user_id, hour) on the dense grid spanning that
    user's first..last active hour; ``hour_sum`` is NULL on gap hours,
    ``filled`` carries the last observed value forward, ``is_gap`` flags
    synthesized rows.
    """
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.round(F.sum("value"), 2).alias("hour_sum"))
    )
    # per-key dense grid: sequence() on the aggregated side — one row per
    # user before the explode, grid length = that user's span in hours
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "hour_sum",
        F.last("hour_sum", ignorenulls=True).over(w).alias("filled"),
        F.col("hour_sum").isNull().alias("is_gap"),
    )


_Q70_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         round(sum(value), 2) AS hour_sum
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT user_id, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM span
)
SELECT g.user_id,
       strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       hy.hour_sum,
       last_value(hy.hour_sum IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       hy.hour_sum IS NULL AS is_gap
FROM grid g LEFT JOIN hourly hy ON g.user_id = hy.user_id AND g.h = hy.h
"""


TIMESERIES_QUERIES = {
    "q70_gapfill_hourly": q70_gapfill_hourly,
}

TIMESERIES_ORACLES = {
    "q70_gapfill_hourly": _Q70_SQL,
}
