"""Streaming ANN index maintenance — the vector-search twin of q173's
maintained dedup state.

q68 builds the IVF-PQ index in one batch job; q157 probes a PERSISTED
index without rebuilding it; this module runs the remaining operational
piece: a STREAM of ingest waves maintains the index itself.  The state
is one table —

* ``codes/`` — the (vec_id, codes) store hash-PARTITIONED by IVF
  ``cell`` (a parquet partition directory per coarse cell).  Each
  micro-batch encodes ONLY its own wave (cell assignment + PQ codes via
  the broadcast codebook literal — one narrow map over the wave, no
  shuffle) and appends to the matching cell partitions.  Nothing ever
  re-encodes or rewrites the corpus: per-batch write I/O is
  wave-proportional, and the probe reads only ``nprobe`` of the cell
  partitions (partition pruning on the collected probe-cell list,
  bounded by the number of coarse cells).

The codebook is trained once at corpus build (the same deterministic
CW-smallest-vec_ids sample as q59/q68 — production would k-means, q58
shows that loop) and broadcast as a literal into every batch, exactly
how a trained model artifact rides a stream.

Correctness: the converged store holds exactly the rows ``ivfpq_index``
computes in one batch, so probing it with q157's query set must produce
q157's results — and the DuckDB oracle IS q157's oracle, which
recomputes the whole index from scratch.  The typed contract therefore
proves maintained index == built-from-scratch index on every corpus it
runs on.

Reference scope: north-star extension (continuous ingest composed with
the ANN family); same availableNow + foreachBatch shape as q173.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.quantize import (
    _cb_lit,
    _codebook,
    _codes_expr,
    _is_new_batch,
    _q157_sql,
    new_batch_queries,
    probe_ivfpq,
)
from postfix_log_parser_spark.ext.similarity import _cell_scores, _emb, _with_norm
from postfix_log_parser_spark.ext.staging import StageCache
from postfix_log_parser_spark.ext.statetable import StateTable

N_WAVES = 3

# explicit schema for the cell-partitioned code store: a takedown can
# legally drain every cell, leaving a partition dir with no parquet
# footers — schema inference would fail there (the r10 q173/q175
# empty-table lesson); an explicit schema reads it as a typed empty
# frame
_CODES_SCHEMA = "vec_id long, codes array<int>, cell int"


def _cb_fingerprint(cb) -> str:
    """Pin the PQ codebook the stored codes were encoded under: the
    `codes` column is meaningless (and ADC scoring silently wrong)
    against any other codebook, so the store's manifest records this
    hash and a probe under a retrained codebook REFUSES instead of
    returning wrong neighbors."""
    import hashlib

    return hashlib.md5(repr(cb).encode()).hexdigest()[:16]


def _codes_table(spark: SparkSession, work: str, cb_fp: str = "") -> StateTable:
    """The cell-partitioned code store with its layout manifest (cells
    are assigned by the fixed CENTROIDS argmax; the per-corpus PQ
    codebook rides in as the key fingerprint)."""
    return StateTable(
        spark,
        f"{work}/codes",
        _CODES_SCHEMA,
        partition_col="cell",
        n_buckets=None,
        key_desc="argmax(dot(v, CENTROIDS))",
        key_fingerprint=cb_fp,
    )

# the live code-store dir behind each staged q176 result, so q177 can
# apply the takedown to the SAME maintained store
_SA_WORK: dict = {}


def _evict_sa_work(key: tuple, _df) -> None:
    """Release the code-store work dir in lockstep with its staged entry
    (same bounded-lifecycle discipline as streamcc's _evict_mv_work)."""
    work = _SA_WORK.pop(key, None)
    if work is not None:
        shutil.rmtree(work, ignore_errors=True)
        if work in _WORK_DIRS:
            _WORK_DIRS.remove(work)


_SA_STAGE = StageCache(inputs=("embeddings.parquet",), on_evict=_evict_sa_work)
# q177's post-takedown probe results, staged the same way (no side state
# of its own — the takedown advances q176's store in place)
_SAD_STAGE = StageCache(inputs=("embeddings.parquet",))

# the takedown batch: every 9th-offset-4 vector is retracted from the
# INDEX (it stays in the embeddings table — a query for it is still
# legal; only its store entry goes away)
DELETE_MOD, DELETE_RES = 9, 4

_WORK_DIRS: list[str] = []


def _sweep_work_dirs() -> None:
    for d in _WORK_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _WORK_DIRS.clear()


atexit.register(_sweep_work_dirs)


def _write_wave_files(
    spark: SparkSession, sf_dir: str, waves_dir: str
) -> None:
    """Split the CORPUS side (everything except q157's new batch) into
    N_WAVES single-file parquet waves (vec_id mod N_WAVES) — the
    stream's arrival units."""
    emb = _emb(spark, sf_dir).filter(~_is_new_batch(F.col("vec_id")))
    for w in range(N_WAVES):
        stage = f"{waves_dir}.stage{w}"
        (
            emb.filter(F.col("vec_id") % N_WAVES == w)
            .repartition(1)
            .write.mode("overwrite").parquet(stage)
        )
        part = next(
            n for n in sorted(os.listdir(stage))
            if n.startswith("part-") and n.endswith(".parquet")
        )
        os.replace(f"{stage}/{part}", f"{waves_dir}/wave-{w:02d}.parquet")
        shutil.rmtree(stage)


def run_index_maintenance(
    spark: SparkSession, waves_dir: str, work: str, cb_lit, cb_fp: str = ""
) -> None:
    """One availableNow pass: every not-yet-consumed wave file is
    encoded (cell + PQ codes, wave-proportional) and appended to the
    cell-partitioned code store.  State and the stream checkpoint live
    under ``work`` and survive across calls — a later call folds only
    the waves that arrived since (same restart contract as q173)."""
    codes = _codes_table(spark, work, cb_fp)

    def encode_wave(batch: DataFrame, batch_id: int) -> None:
        withc = batch.withColumn("cs", _cell_scores(F.col("v")))
        cell = (
            F.array_position(F.col("cs"), F.array_max("cs")) - 1
        ).cast("int")
        # StateTable.append co-locates by cell before writing: one file
        # per touched cell per batch (a wave-proportional shuffle, never
        # of the accumulated store)
        codes.append(
            withc.select(
                "vec_id",
                cell.alias("cell"),
                _codes_expr(F.col("v"), cb_lit).alias("codes"),
            )
        )

    stream = (
        spark.readStream.schema("vec_id long, v array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(waves_dir)
    )
    query = (
        stream.writeStream.foreachBatch(encode_wave)
        .option("checkpointLocation", f"{work}/ckpt")
        .queryName(f"q176_stream_ann_index_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def maintained_index(
    spark: SparkSession, work: str, probe_cells, cb_fp: str = ""
) -> DataFrame:
    """Read the maintained code store PRUNED to the probe cells — the
    partition filter is the plan-level guarantee that a search touches
    ``nprobe`` cells of state, not the corpus.  The manifest check
    refuses a probe under a codebook the store wasn't encoded with."""
    return (
        _codes_table(spark, work, cb_fp)
        .read(probe_cells)
        .select("vec_id", "cell", "codes")
    )


def q176_stream_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the IVF-PQ index by streaming the corpus in waves, then
    run q157's probe (the new-batch query set, nprobe=2, ADC scoring,
    exact-cosine rerank) against the MAINTAINED store.  The oracle is
    q157's from-scratch SQL rebuild — maintained == rebuilt, proven per
    corpus."""
    key = _SA_STAGE.key(spark, sf_dir)
    staged = _SA_STAGE.get(key)
    if staged is not None:
        return staged
    emb = _with_norm(_emb(spark, sf_dir))
    cb = _codebook(emb)
    if not cb[0]:  # empty corpus: typed empty, and nothing to stage
        return spark.createDataFrame(
            [],
            "new_id long, rn int, neighbor_id long, adc_dot double, cosine double",
        )
    cb_lit = _cb_lit(cb)
    cb_fp = _cb_fingerprint(cb)
    work = tempfile.mkdtemp(prefix="q176_stream_ann_index_")
    _WORK_DIRS.append(work)
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, sf_dir, waves_dir)
    run_index_maintenance(spark, waves_dir, work, cb_lit, cb_fp)
    _SA_WORK[key] = work
    # bounded collect: the query batch's distinct probe cells (≤ #cells)
    probe_cells = {
        r.probe_cell
        for r in new_batch_queries(emb, cb_lit)
        .select("probe_cell").distinct().collect()
    }
    out = probe_ivfpq(
        maintained_index(spark, work, probe_cells, cb_fp), emb, cb_lit
    ).localCheckpoint(eager=True)
    return _SA_STAGE.put(key, out)


def apply_index_takedown(
    spark: SparkSession, work: str, deleted: DataFrame
) -> None:
    """Retract a batch of vectors from the maintained code store — the
    ANN twin of q175's component-map takedown, and every step
    takedown-batch-proportional:

    1. the deleted vectors' CELLS are recomputed from their embeddings
       (the same assignment expression ingest uses — batch-sized work);
    2. only those cell partitions are read (partition pruning) and
       rewritten without the deleted ids (broadcast anti-join + dynamic
       partition overwrite);
    3. a cell drained to zero rows is swept explicitly.

    Idempotent: re-applying finds no deleted id in the touched cells
    and rewrites them unchanged."""
    codes = _codes_table(spark, work)
    delv = deleted.withColumn("cs", _cell_scores(F.col("v")))
    cell = (F.array_position(F.col("cs"), F.array_max("cs")) - 1).cast("int")
    aff_cells = codes.partitions_of(delv, cell)
    if not aff_cells:
        return
    kept = (
        codes.read(aff_cells)
        .join(F.broadcast(deleted.select("vec_id")), "vec_id", "left_anti")
        .select("vec_id", "cell", "codes")
        .repartition(F.col("cell"))
        .localCheckpoint(eager=True)  # read-under-write guard, tiny
    )
    codes.overwrite_partitions(aff_cells, kept)


def q177_stream_ann_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN lifecycle's takedown stage: q176 maintains the store by
    streaming ingest waves, then a retraction batch (vec_id % 9 == 4)
    is removed from the SAME store, cell-partition-scoped; the probe
    then runs against the post-takedown store.  The oracle is q157's
    from-scratch rebuild with the deleted ids excluded from the index
    side — takedown == rebuild-without-them, proven per corpus."""
    key = _SAD_STAGE.key(spark, sf_dir)
    staged = _SAD_STAGE.get(key)
    if staged is not None:
        return staged
    emb = _with_norm(_emb(spark, sf_dir))
    cb = _codebook(emb)
    if not cb[0]:
        return spark.createDataFrame(
            [],
            "new_id long, rn int, neighbor_id long, adc_dot double, cosine double",
        )
    cb_lit = _cb_lit(cb)
    q176_stream_ann_index(spark, sf_dir)  # ensure the maintained store
    work = _SA_WORK[_SA_STAGE.key(spark, sf_dir)]
    deleted = emb.filter(
        F.col("vec_id") % DELETE_MOD == DELETE_RES
    ).select("vec_id", "v")
    apply_index_takedown(spark, work, deleted)
    probe_cells = {
        r.probe_cell
        for r in new_batch_queries(emb, cb_lit)
        .select("probe_cell").distinct().collect()
    }
    out = probe_ivfpq(
        maintained_index(spark, work, probe_cells, _cb_fingerprint(cb)),
        emb,
        cb_lit,
    ).localCheckpoint(eager=True)
    return _SAD_STAGE.put(key, out)


def _q177_sql() -> str:
    return _q157_sql(
        index_extra_where=(
            f"\n   AND c.vec_id % {DELETE_MOD} != {DELETE_RES}"
        )
    )


STREAMANN_QUERIES = {
    "q176_stream_ann_index": q176_stream_ann_index,
    "q177_stream_ann_deletes": q177_stream_ann_deletes,
}

STREAMANN_ORACLES = {
    # the maintained store must answer exactly like the from-scratch
    # index — q157's oracle rebuilds everything in SQL
    "q176_stream_ann_index": _q157_sql(),
    # takedown == rebuild-without-the-deleted (index side only)
    "q177_stream_ann_deletes": _q177_sql(),
}
