"""Streaming near-dup component maintenance — the materialized-view
form of dedup clustering.

q36 computes components in one batch job; q172 folds ONE ingest wave
into them; this module runs the full operational loop: a STREAM of
ingest waves maintains the component map continuously, each micro-batch
paying only wave-proportional work against three persistent state
tables —

* ``bands/``      the LSH band index (appended per batch),
* ``shingles/``   the shingle store for exact-Jaccard verification
                  (appended per batch),
* ``components/`` the component map (atomically swapped per batch via
                  the q172 merge: delta-graph label propagation +
                  broadcast relabel for merges).

These are exactly the checkpoint tables the q172 docstring names for
the 100 TB deployment; here they are parquet directories written from
``foreachBatch``, the idempotent-sink pattern q57's incremental MV uses.

Correctness is order-independent: every unordered near-dup pair is
discovered exactly when its LATER member's wave arrives (the earlier
member is already in the band index; within-wave pairs come from the
batch's self-join), so the union of per-batch pair sets equals the
batch job's pair set and the converged map must equal q36's output —
which is precisely what the DuckDB oracle recomputes from scratch.
Convergence to the batch answer is therefore PROVEN per corpus by the
typed contract, not assumed.

Scale notes (100 TB): per batch, signatures are computed for the wave
only; the band join probes the index (bucketed by band_key at scale);
the Jaccard verify joins the shingle store on candidate endpoints only;
the CC loop runs on the delta graph.  State growth is linear in the
corpus (the index IS the corpus's signatures — that is the price of
incremental dedup everywhere, cf. Lee et al. ACL'22 §5), while per-batch
compute is wave-proportional.

Reference scope: north-star extension; the streaming machinery is the
same watermark-free availableNow + foreachBatch shape as q57/q150.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.dedup import (
    _augmented,
    _jaccard_verified,
    _minhash_bands,
    _q36_sql,
    _stage_key,
    merge_pairs_into_components,
    shingles3_udf,
)
from postfix_log_parser_spark.ext.staging import StageCache

N_WAVES = 3

# the maintained view persists across queries — like q36's component map
# and q172's merged map, the stream runs once per (session, corpus) and
# readers get the converged state
_MV_STAGE = StageCache(inputs=("documents.parquet",))


def _write_wave_files(spark: SparkSession, sf_dir: str, waves_dir: str) -> None:
    """Split the augmented corpus into N_WAVES single-file parquet waves
    (doc_id mod N_WAVES) — the stream's arrival units.  Each wave is
    written by Spark (repartition(1)) and renamed to a stable name; no
    driver-side row materialization."""
    aug = _augmented(spark, sf_dir).select("doc_id", "text")
    for w in range(N_WAVES):
        stage = f"{waves_dir}.stage{w}"
        (
            aug.filter(F.col("doc_id") % N_WAVES == w)
            .repartition(1)
            .write.mode("overwrite").parquet(stage)
        )
        part = next(
            n for n in sorted(os.listdir(stage))
            if n.startswith("part-") and n.endswith(".parquet")
        )
        os.replace(f"{stage}/{part}", f"{waves_dir}/wave-{w:02d}.parquet")
        shutil.rmtree(stage)


def q173_stream_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the maintenance loop over all waves (availableNow, one wave
    file per micro-batch) and return the final component map, which the
    oracle (batch CC from scratch) must match exactly."""
    key = _stage_key(spark, sf_dir)
    staged = _MV_STAGE.get(key)
    if staged is not None:
        return staged
    work = tempfile.mkdtemp(prefix="q173_stream_components_")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, sf_dir, waves_dir)
    final = run_maintenance(spark, waves_dir, work)
    return _MV_STAGE.put(key, final)


def run_maintenance(
    spark: SparkSession, waves_dir: str, work: str
) -> DataFrame:
    """One availableNow pass of the maintenance loop over whatever wave
    files currently exist.  State (bands/shingles/components) and the
    stream checkpoint live under ``work`` and SURVIVE across calls: a
    later call with the same ``work`` resumes from the checkpoint and
    folds only the waves that arrived since — the restart-recovery
    contract pinned in test_streamcc.py."""
    bands_dir = f"{work}/bands"
    sh_dir = f"{work}/shingles"
    comp_dir = f"{work}/components"
    empty_map = spark.createDataFrame([], "doc_id long, component_id long")

    def merge_wave(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        wave_sh = (
            batch.select(
                "doc_id", shingles3_udf(F.col("text")).alias("shingles")
            )
            .filter(F.size("shingles") > 0)
            .persist()
        )
        wave_bands = _minhash_bands(wave_sh)
        have_state = os.path.exists(bands_dir)
        if have_state:
            idx = spark.read.parquet(bands_dir)
            all_b = idx.unionByName(wave_bands)
        else:
            all_b = wave_bands
        cand = (
            wave_bands.alias("x").join(
                all_b.alias("y"),
                (F.col("x.band_idx") == F.col("y.band_idx"))
                & (F.col("x.band_key") == F.col("y.band_key"))
                & (F.col("x.doc_id") != F.col("y.doc_id")),
            )
            .select(
                F.least("x.doc_id", "y.doc_id").alias("id_a"),
                F.greatest("x.doc_id", "y.doc_id").alias("id_b"),
            )
            .distinct()
        )
        if have_state:
            with_sh = spark.read.parquet(sh_dir).unionByName(
                wave_sh.select("doc_id", "shingles")
            )
        else:
            with_sh = wave_sh.select("doc_id", "shingles")
        pairs = _jaccard_verified(cand, with_sh, 0.5).select("id_a", "id_b")

        base = (
            spark.read.parquet(comp_dir)
            if os.path.exists(comp_dir) else empty_map
        )
        merged = merge_pairs_into_components(base, pairs)
        # atomic state swap: the new map reads the old map's files, so
        # write beside it and rename (the foreachBatch idempotent-sink
        # discipline — a replayed batch just recomputes the same swap)
        tmp = f"{comp_dir}.next-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(comp_dir):
            shutil.rmtree(comp_dir)
        os.replace(tmp, comp_dir)
        # append the wave to the index + shingle store AFTER the map
        # swap (the next batch's reads see a consistent trio)
        wave_bands.write.mode("append").parquet(bands_dir)
        wave_sh.select("doc_id", "shingles").write.mode("append").parquet(
            sh_dir
        )
        wave_sh.unpersist()
        batch.unpersist()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(waves_dir)
    )
    query = (
        stream.writeStream.foreachBatch(merge_wave)
        .option("checkpointLocation", f"{work}/ckpt")
        .queryName(f"q173_stream_components_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if not os.path.exists(comp_dir):  # empty corpus: no pairs anywhere
        return empty_map
    return spark.read.parquet(comp_dir).select("doc_id", "component_id")


STREAMCC_QUERIES = {
    "q173_stream_components": q173_stream_components,
}

STREAMCC_ORACLES = {
    # the converged stream state must equal batch CC from scratch
    "q173_stream_components": _q36_sql(),
}
