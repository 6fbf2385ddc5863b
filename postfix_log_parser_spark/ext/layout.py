"""Data-layout operators: z-order (Morton) clustering + zone-map audit.

At 100 TB the scan is the bottleneck, and the scan is only cheap if the
file layout lets the reader SKIP.  Single-column sort layouts skip well
on one predicate column and terribly on the other; interleaving the bits
of two bucketized columns (a space-filling z-curve) keeps BOTH columns'
value ranges narrow inside every file, so parquet min/max zone maps
prune multi-dimensional predicates.  This is the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here built from plain Catalyst
bit arithmetic (shiftleft/shiftright/bitwiseAND), no UDF.

``zorder_partition`` is the write-path operator (range-partition by the
z-value, sort inside each file); ``q135_zorder_layout`` is its audit: the
zone map each z-cell would publish, plus whether a representative band
predicate could prune the cell.  The audit is ONE groupBy over a
projection — the z-value is computed inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZBITS = 8            # bits per dimension -> 16-bit Morton code
ZCELL_SHIFT = 8      # cells = z >> 8 (256 max)
BAND_LO, BAND_HI = 96, 111  # representative predicate: x BETWEEN 96 AND 111


def morton16(x: Column, y: Column) -> Column:
    """Interleave the low 8 bits of ``x`` (odd positions) and ``y``
    (even positions) into a 16-bit Morton code — pure JVM-side bit
    arithmetic, whole-stage-codegen friendly."""
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_partition(df: DataFrame, x: Column, y: Column, n_files: int) -> DataFrame:
    """Write-path layout: range-partition rows by their Morton code and
    sort inside each partition, so every output file covers one compact
    z-range and its parquet footer min/max prune on BOTH dimensions."""
    keyed = df.withColumn("_z", morton16(x, y))
    return keyed.repartitionByRange(n_files, "_z").sortWithinPartitions("_z")


def _xy(ev: DataFrame) -> DataFrame:
    x = F.col("user_id").bitwiseAND(F.lit(255))
    y = (
        F.floor(F.unix_micros(F.col("ts")) / F.lit(3_600_000_000))
        .bitwiseAND(F.lit(255))
    )
    return ev.select(x.alias("x"), y.alias("y"))


def q135_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map audit of the z-ordered events layout.

    Buckets events into z-cells of the (user bucket, hour bucket) Morton
    curve and emits each cell's zone map (row count, min/max of both
    dimensions) plus ``prunable``: whether the band predicate
    ``x BETWEEN 96 AND 111`` could skip the cell entirely from footer
    stats alone.  Under z-order most cells are prunable for a narrow
    band on EITHER dimension — the property a single-column sort cannot
    give both columns at once."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = _xy(ev).withColumn("z", morton16(F.col("x"), F.col("y")))
    return (
        pts.groupBy(F.shiftright(F.col("z"), ZCELL_SHIFT).alias("zcell"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .withColumn(
            "prunable",
            (F.col("max_x") < BAND_LO) | (F.col("min_x") > BAND_HI),
        )
    )


def _duck_morton(x: str, y: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


_Q135_SQL = f"""
WITH pts AS (
  SELECT user_id & 255 AS x,
         (epoch_us(ts) // 3600000000) & 255 AS y
  FROM events
),
zz AS (SELECT x, y, {_duck_morton('x', 'y')} AS z FROM pts)
SELECT z >> {ZCELL_SHIFT} AS zcell,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y,
       (max(x) < {BAND_LO} OR min(x) > {BAND_HI}) AS prunable
FROM zz GROUP BY 1
"""


LAYOUT_QUERIES = {"q135_zorder_layout": q135_zorder_layout}
LAYOUT_ORACLES = {"q135_zorder_layout": _Q135_SQL}
