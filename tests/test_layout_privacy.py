"""Property tests for the r7 batch-2 operators beyond the oracle
differentials: Morton-code bijectivity, the zone-map quality the
z-order WRITE path actually delivers on disk, the KMV estimate's error
bound, and containment's excerpt-subset guarantee.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_morton16_is_a_bijection(spark):
    """Every (x, y) in [0,256)^2 must map to a distinct z in [0, 65536)
    — interleaving must not lose or alias bits."""
    from postfix_log_parser_spark.ext.layout import morton16

    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
        .select(morton16(F.col("x"), F.col("y")).alias("z"))
    )
    stats = grid.agg(
        F.countDistinct("z").alias("n"),
        F.min("z").alias("lo"),
        F.max("z").alias("hi"),
    ).collect()[0]
    assert stats.n == 65536 and stats.lo == 0 and stats.hi == 65535


def test_zorder_partition_files_have_compact_zone_maps(spark, tmp_path):
    """Write events through zorder_partition and inspect the REAL
    parquet footer stats: for the band predicate x BETWEEN 96 AND 111
    the x-min/max zone maps of the written files must prune most files
    — the on-disk property the layout exists to create.  A layout that
    shuffles rows arbitrarily prunes ~0 files (every file spans the full
    x range)."""
    from postfix_log_parser_spark.ext.layout import zorder_partition

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").bitwiseAND(F.lit(255)).alias("x"),
        F.hour("ts").alias("y"),
        "event_id",
    )
    out = str(tmp_path / "zordered.parquet")
    zorder_partition(ev, F.col("x"), F.col("y"), 16).write.mode(
        "overwrite"
    ).parquet(out)

    con = duckdb.connect()
    stats = con.sql(
        f"""
        SELECT file_name,
               min(CAST(stats_min AS BIGINT)) AS min_x,
               max(CAST(stats_max AS BIGINT)) AS max_x
        FROM parquet_metadata('{out}/*.parquet')
        WHERE path_in_schema = 'x'
        GROUP BY file_name
        """
    ).fetchall()
    assert len(stats) >= 8  # the range partitioner actually fanned out
    prunable = sum(1 for _, lo, hi in stats if hi < 96 or lo > 111)
    # the 16-wide band must skip at least half the files under z-order
    assert prunable >= len(stats) // 2, (prunable, len(stats), stats)


def test_kmv_estimate_within_guarantee(spark):
    """KMV Jaccard estimates concentrate around truth: with K=64 the
    standard error is ~ sqrt(J(1-J)/K) <= 0.0625; assert every pair is
    within 5 standard errors (plus rounding) of its exact value."""
    from postfix_log_parser_spark.ext.sketches import KMV_K, q136_kmv_overlap

    rows = q136_kmv_overlap(spark, SF_DIR).collect()
    assert rows, "sf0.01 has 20 sources; pairs expected"
    bound = 5 * (0.25 / KMV_K) ** 0.5 + 1e-3
    for r in rows:
        assert abs(r.kmv_jaccard - r.exact_jaccard) <= bound, (
            r.src_a,
            r.src_b,
            r.kmv_jaccard,
            r.exact_jaccard,
        )


def test_containment_flags_every_planted_excerpt(spark):
    """Every planted excerpt (doc_id+400000, first 2/3 words of a >=6
    word parent) must be reported contained in its parent with
    containment exactly 1.0 — prefix shingles are a subset of parent
    shingles, and sizes are counted over the same capped shingle set."""
    from postfix_log_parser_spark.ext.dedup import q134_containment_dedup

    pairs = {
        (r.id_a, r.id_b): (r.containment, r.contained_id)
        for r in q134_containment_dedup(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    planted = [
        r.doc_id
        for r in docs.filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.size(F.split(F.lower("text"), "[^a-z0-9]+")).alias("n"))
        .collect()
        # excerpt needs >= 6 words AND >= 3 shingles left after the cut
        if r.n >= 8
    ]
    assert planted
    for parent in planted:
        key = (parent, parent + 400000)
        assert key in pairs, f"excerpt of doc {parent} not flagged"
        containment, contained = pairs[key]
        assert containment == pytest.approx(1.0)
        assert contained == parent + 400000  # the excerpt is the smaller side
