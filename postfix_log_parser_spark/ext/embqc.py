"""Embedding quality control: per-label centroid-distance outlier screen.

Before embeddings feed ANN indexing (q26/q33/q68) or semantic dedup
(q114), a corpus pipeline screens them for corrupt vectors — bad
encoder batches, truncated writes, mislabeled rows — by flagging
vectors unusually far from their group's centroid.  This is q86's
z-score screen lifted into vector space: the "value" is the squared L2
distance to the label centroid.

Scale shape (100 TB of vectors):

* centroid build — posexplode to (label, dim) and average: one hash
  exchange whose key space is n_labels × DIM, collapsed map-side by
  partial_avg, exactly the k-means update shape (``cluster._update``)
  but kept DISTRIBUTED (no collect: the centroid table stays a
  DataFrame and rides a broadcast join back onto the vectors);
* distance pass — sequential ``aggregate(zip_with(...))`` fold so the
  term order matches the oracle's ``list_sum(list_transform(...))``
  bit-for-bit, then distances are ROUNDED before the stats so both
  engines feed identical sets into avg/stddev;
* flagging — one label-keyed window fans mean/σ back without a second
  scan (the q86 shape); labels with σ = 0 produce no outliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_ROUND = 6   # distance rounding before stats (shared with the oracle)
Z_CUT = 2.0  # flag beyond 2 population sigmas


def q139_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors > 2σ from their label centroid: (vec_id, label, d2, z).

    NULL embeddings/labels are dropped at the scan (a null vector can't
    be distance-scored; a null label has no cohort)."""
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    cent = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), _ROUND).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.m,
            ).alias("cv")
        )
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        _ROUND,
    )
    scored = e.join(F.broadcast(cent), "label").select(
        "vec_id", "label", d2.alias("d2")
    )
    w = Window.partitionBy("label")
    sigma = F.stddev_pop("d2").over(w)
    z = (F.col("d2") - F.avg("d2").over(w)) / sigma
    return (
        scored.select(
            "vec_id", "label", "d2", F.when(sigma > 0, z).alias("z")
        )
        .filter(F.col("z") > Z_CUT)
        .select("vec_id", "label", "d2", F.round("z", 4).alias("z"))
    )


_Q139_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
),
u AS (
  SELECT label, pos, round(avg(x), {_ROUND}) AS m
  FROM (SELECT label, unnest(v) AS x,
               generate_subscripts(v, 1) AS pos FROM e)
  GROUP BY label, pos
),
cent AS (SELECT label, list(m ORDER BY pos) AS cv FROM u GROUP BY label),
scored AS (
  SELECT e.vec_id, e.label,
         round(list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), {_ROUND}) AS d2
  FROM e JOIN cent c USING (label)
),
zz AS (
  SELECT vec_id, label, d2,
         CASE WHEN stddev_pop(d2) OVER w > 0
              THEN (d2 - avg(d2) OVER w) / (stddev_pop(d2) OVER w)
         END AS z
  FROM scored
  WINDOW w AS (PARTITION BY label)
)
SELECT vec_id, label, d2, round(z, 4) AS z
FROM zz WHERE z > {Z_CUT}
"""


EMBQC_QUERIES = {"q139_embedding_outliers": q139_embedding_outliers}
EMBQC_ORACLES = {"q139_embedding_outliers": _Q139_SQL}
