"""Streaming BM25 index maintenance — the lexical-retrieval twin of
the maintained dedup (q173) and ANN (q176) state.

q110 builds the inverted index inside one batch plan; this module runs
the operational form: a STREAM of ingest waves maintains a persistent
index that any query can probe without touching the corpus.  State:

* ``postings/``  (term, doc_id, tf, dl) hash-BUCKETED by ``term``
                 (``bucket = pmod(xxhash64(term), N)`` partition dirs).
                 Each micro-batch tokenizes ONLY its own wave and
                 appends its postings to the matching buckets; a probe
                 reads only the query terms' buckets (partition
                 pruning), so search I/O is query-proportional at any
                 corpus size.  ``dl`` rides denormalized in the posting
                 row, so scoring needs no per-doc join.
* ``docstats/``  (doc_id, dl) bucketed by ``doc_id`` — the doc-keyed
                 access path takedowns prune by.
* ``stats/``     append-only (tag, n_docs, sum_dl) increments, one row
                 per ingest batch (and one NEGATIVE row per takedown):
                 the probe reconstructs N and avgdl by summing the
                 increments — rows ∝ #batches, never ∝ corpus.

Replay safety is READ-SIDE here (cheaper than the component map's
frozen txn because postings are per-doc independent — no cross-row
merge to keep transactional): a crash-replayed batch may append
duplicate posting/docstat rows and a duplicate stats increment, and
every consumer dedups — postings by (term, doc_id) max, docstats by
doc_id, stats by tag — so the probe's answer is invariant under
replays.  ``compact_bm25_state`` (the same bounded-rewrite maintenance
op as streamcc's ``compact_state``) physically drops the duplicates
and bounds per-bucket file counts.

Correctness: per-doc postings are independent, and df/N/avgdl are
computed AT PROBE TIME from the maintained state, so the converged
index answers exactly like q110's from-scratch plan — the DuckDB
oracle IS q110's SQL (maintained == rebuilt, proven per corpus).  The
takedown oracle excludes the deleted docs from the rebuild's corpus
CTE (takedown == rebuild-without-them, the q177 pattern).

Reference scope: north-star extension (continuous ingest composed with
the retrieval family); same availableNow + foreachBatch shape as
q173/q176.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.dedup import words_of
from postfix_log_parser_spark.ext.retrieval import (
    _BM25_CTES,
    _Q110_SQL,
    _ranked_topk,
    B,
    K1,
    QUERY_TERMS,
    TOP_K,
)
from postfix_log_parser_spark.ext.staging import StageCache

N_WAVES = 3
N_TERM_BUCKETS = 16

# explicit schemas: every state dir can legally be empty (the r10
# empty-table lesson — schema inference fails on footerless dirs)
_POSTINGS_SCHEMA = "term string, doc_id long, tf long, dl int, bucket int"
_DOCSTATS_SCHEMA = "doc_id long, dl int, bucket int"
_STATS_SCHEMA = "tag string, n_docs long, sum_dl long"

# the takedown batch: every 7th-offset-2 doc is retracted from the
# index (the doc stays in the corpus table; only its index entries go)
DELETE_MOD, DELETE_RES = 7, 2

_BM_WORK: dict = {}
_WORK_DIRS: list[str] = []


def _evict_bm_work(key: tuple, _df) -> None:
    """Release the index work dir in lockstep with its staged entry
    (the r10 bounded-lifecycle discipline, cf. streamcc/_evict_mv_work)."""
    work = _BM_WORK.pop(key, None)
    if work is not None:
        shutil.rmtree(work, ignore_errors=True)
        if work in _WORK_DIRS:
            _WORK_DIRS.remove(work)


_BM_STAGE = StageCache(inputs=("documents.parquet",), on_evict=_evict_bm_work)
_BMD_STAGE = StageCache(inputs=("documents.parquet",))


def _sweep_work_dirs() -> None:
    for d in _WORK_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _WORK_DIRS.clear()


atexit.register(_sweep_work_dirs)


def _term_bucket(col) -> "F.Column":
    return F.pmod(F.xxhash64(col), F.lit(N_TERM_BUCKETS)).cast("int")


def _doc_bucket(col) -> "F.Column":
    return F.pmod(F.xxhash64(col), F.lit(N_TERM_BUCKETS)).cast("int")


def _tokenized(batch: DataFrame) -> DataFrame:
    """(doc_id, words, dl) for a wave — q110's tokenize, wave-scoped."""
    return (
        batch.filter(F.col("text").isNotNull())
        .select("doc_id", words_of(F.col("text")).alias("words"))
        .withColumn("dl", F.size("words").cast("int"))
    )


def _write_wave_files(
    spark: SparkSession, sf_dir: str, waves_dir: str
) -> None:
    """Split the corpus into N_WAVES single-file parquet waves (doc_id
    mod N_WAVES) — the stream's arrival units."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    for w in range(N_WAVES):
        stage = f"{waves_dir}.stage{w}"
        (
            docs.filter(F.col("doc_id") % N_WAVES == w)
            .repartition(1)
            .write.mode("overwrite").parquet(stage)
        )
        part = next(
            n for n in sorted(os.listdir(stage))
            if n.startswith("part-") and n.endswith(".parquet")
        )
        os.replace(f"{stage}/{part}", f"{waves_dir}/wave-{w:02d}.parquet")
        shutil.rmtree(stage)


def _append_stats(spark: SparkSession, work: str, tag: str, inc: DataFrame) -> None:
    """One (tag, n_docs, sum_dl) increment row — the probe dedups by tag,
    so a replayed append is invisible."""
    (
        inc.select(F.lit(tag).alias("tag"), "n_docs", "sum_dl")
        .repartition(1)
        .write.mode("append").parquet(f"{work}/stats")
    )


def ingest_wave(spark: SparkSession, work: str, batch: DataFrame, tag: str) -> None:
    """Fold one wave into the index: tokenize the wave only, append its
    postings to their term buckets, its doc lengths to the doc-bucketed
    stats, and one corpus-stats increment row.  Every write is
    wave-proportional; nothing accumulated is ever read."""
    toks = _tokenized(batch).persist()
    postings = (
        toks.select("doc_id", "dl", F.explode("words").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", _term_bucket(F.col("term")))
    )
    (
        postings.select("term", "doc_id", "tf", "dl", "bucket")
        .repartition(N_TERM_BUCKETS, F.col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(f"{work}/postings")
    )
    (
        toks.select(
            "doc_id", "dl", _doc_bucket(F.col("doc_id")).alias("bucket")
        )
        .repartition(N_TERM_BUCKETS, F.col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(f"{work}/docstats")
    )
    _append_stats(
        spark, work, tag,
        toks.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        ),
    )
    toks.unpersist()


def run_bm25_maintenance(
    spark: SparkSession, waves_dir: str, work: str
) -> None:
    """One availableNow pass over whatever wave files exist; state and
    the checkpoint live under ``work`` and survive across calls (a later
    call folds only new waves — the q173/q176 restart contract)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        ingest_wave(spark, work, batch, tag=f"batch-{batch_id:08d}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(waves_dir)
    )
    query = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{work}/ckpt")
        .queryName(f"q180_stream_bm25_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def probe_bm25(
    spark: SparkSession, work: str, terms: list = QUERY_TERMS, k: int = TOP_K
) -> DataFrame:
    """q110's query against the MAINTAINED index: the postings scan is
    PRUNED to the query terms' buckets (≤|Q| of N partition dirs), df
    and corpus stats are reconstructed from the pruned read and the
    increment log, and the scoring expression is q110's verbatim — so
    the result must equal the from-scratch plan's.  Dedup-by-key makes
    the answer invariant under crash-replayed appends."""
    empty = spark.createDataFrame([], "rnk int, doc_id long, bm25 double")
    if not os.path.exists(f"{work}/postings"):
        return empty
    terms_df = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = sorted({
        r.b for r in terms_df.select(_term_bucket(F.col("term")).alias("b"))
        .distinct().collect()
    })
    postings = (
        spark.read.schema(_POSTINGS_SCHEMA).parquet(f"{work}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        # replay dedup: identical rows collapse (tf is a per-(term,doc)
        # constant, so max == the value)
        .groupBy("term", "doc_id", "dl")
        .agg(F.max("tf").alias("tf"))
    )
    stats = (
        spark.read.schema(_STATS_SCHEMA).parquet(f"{work}/stats")
        .groupBy("tag")  # replay dedup: one increment per tag
        .agg(F.max("n_docs").alias("n_docs"), F.max("sum_dl").alias("sum_dl"))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").alias("sum_dl"),
        )
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats), how="cross")
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log1p(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "tf_part",
            F.col("tf") * (K1 + 1)
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("idf") * F.col("tf_part")), 4).alias("bm25"))
    )
    return _ranked_topk(scored, "bm25", k).select("rnk", "doc_id", "bm25")


def apply_bm25_takedown(
    spark: SparkSession, work: str, deleted: DataFrame
) -> None:
    """Retract docs from the maintained index, every step
    takedown-batch-proportional:

    1. the deleted docs' TERMS are recomputed from their text (the
       same tokenize ingest uses — the q177 recompute-the-key pattern),
       giving the term buckets to touch;
    2. only those posting buckets are read and rewritten without the
       deleted ids (broadcast anti-join + dynamic partition overwrite,
       drained buckets swept); docstats likewise by doc bucket;
    3. one NEGATIVE stats increment (sized from the docstats rows the
       deleted ids actually had — so re-applying, which finds none, is
       a no-op)."""
    dd = _tokenized(deleted).persist()
    # what the index actually holds for these ids (idempotency gate)
    doc_buckets = sorted({
        r.b for r in dd.select(_doc_bucket(F.col("doc_id")).alias("b"))
        .distinct().collect()
    })
    if not doc_buckets or not os.path.exists(f"{work}/docstats"):
        dd.unpersist()
        return
    present = (
        spark.read.schema(_DOCSTATS_SCHEMA).parquet(f"{work}/docstats")
        .filter(F.col("bucket").isin(doc_buckets))
        .join(F.broadcast(dd.select("doc_id")), "doc_id")
        .groupBy("doc_id")  # replay dedup
        .agg(F.max("dl").alias("dl"))
        .localCheckpoint(eager=True)
    )
    if present.isEmpty():  # nothing indexed — re-applied takedown
        dd.unpersist()
        return
    del_ids = F.broadcast(present.select("doc_id"))
    term_buckets = sorted({
        r.b
        for r in dd.select(F.explode("words").alias("term"))
        .select(_term_bucket(F.col("term")).alias("b")).distinct().collect()
    })
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(conf_key, "static")
    for table, schema, touched in (
        ("postings", _POSTINGS_SCHEMA, term_buckets),
        ("docstats", _DOCSTATS_SCHEMA, doc_buckets),
    ):
        table_dir = f"{work}/{table}"
        kept = (
            spark.read.schema(schema).parquet(table_dir)
            .filter(F.col("bucket").isin(touched))
            .join(del_ids, "doc_id", "left_anti")
            .repartition(N_TERM_BUCKETS, F.col("bucket"))
            .localCheckpoint(eager=True)  # read-under-write guard
        )
        spark.conf.set(conf_key, "dynamic")
        try:
            kept.write.mode("overwrite").partitionBy("bucket").parquet(table_dir)
        finally:
            spark.conf.set(conf_key, old)
        written = {r.bucket for r in kept.select("bucket").distinct().collect()}
        for b in set(touched) - written:  # bucket drained by the takedown
            shutil.rmtree(f"{table_dir}/bucket={b}", ignore_errors=True)
    _append_stats(
        spark, work, f"takedown-{uuid.uuid4().hex[:8]}",
        present.agg(
            (-F.count(F.lit(1))).alias("n_docs"),
            (-F.sum("dl")).cast("long").alias("sum_dl"),
        ),
    )
    dd.unpersist()


def compact_bm25_state(
    spark: SparkSession, work: str, max_files: int = 4
) -> dict:
    """Bounded small-files + duplicate-row maintenance: rewrite buckets
    whose file count exceeds ``max_files``, collapsing replay duplicates
    physically (the read-side dedup keys) — streamcc.compact_state's
    twin for the index tables."""
    out: dict = {}
    for table, schema, keys in (
        ("postings", _POSTINGS_SCHEMA, ["term", "doc_id", "dl"]),
        ("docstats", _DOCSTATS_SCHEMA, ["doc_id"]),
    ):
        table_dir = f"{work}/{table}"
        out[table] = 0
        if not os.path.isdir(table_dir):
            continue
        row_schema = schema.replace(", bucket int", "")
        agg_col = "tf" if table == "postings" else "dl"
        for name in sorted(os.listdir(table_dir)):
            if not name.startswith("bucket="):
                continue
            bdir = f"{table_dir}/{name}"
            parts = [p for p in os.listdir(bdir) if p.endswith(".parquet")]
            if len(parts) <= max_files:
                continue
            staged = f"{table_dir}/.compact-{name}"
            (
                spark.read.schema(row_schema).parquet(bdir)
                .groupBy(*[k for k in keys if k != agg_col])
                .agg(F.max(agg_col).alias(agg_col))
                .select(*row_schema.replace(" string", "").replace(" long", "")
                        .replace(" int", "").split(", "))
                .repartition(1)
                .write.mode("overwrite").parquet(staged)
            )
            retired = f"{table_dir}/.old-{name}"
            os.rename(bdir, retired)
            os.rename(staged, bdir)
            shutil.rmtree(retired, ignore_errors=True)
            out[table] += 1
    return out


def q180_stream_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the BM25 inverted index by streaming the corpus in
    waves, then run q110's 5-term query against the MAINTAINED store.
    The oracle is q110's from-scratch SQL — maintained == rebuilt,
    proven per corpus."""
    key = _BM_STAGE.key(spark, sf_dir)
    staged = _BM_STAGE.get(key)
    if staged is not None:
        return staged
    work = tempfile.mkdtemp(prefix="q180_stream_bm25_")
    _WORK_DIRS.append(work)
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    _write_wave_files(spark, sf_dir, waves_dir)
    run_bm25_maintenance(spark, waves_dir, work)
    _BM_WORK[key] = work
    out = probe_bm25(spark, work).localCheckpoint(eager=True)
    return _BM_STAGE.put(key, out)


def q181_bm25_index_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval lifecycle's takedown stage: q180 maintains the
    index, a retraction batch (doc_id % 7 == 2) is removed from the
    SAME store term-bucket-scoped, and the probe runs against the
    post-takedown index.  The oracle rebuilds q110 from scratch with
    the deleted docs excluded — takedown == rebuild-without-them."""
    key = _BMD_STAGE.key(spark, sf_dir)
    staged = _BMD_STAGE.get(key)
    if staged is not None:
        return staged
    q180_stream_bm25_index(spark, sf_dir)  # ensure the maintained index
    bm_key = _BM_STAGE.key(spark, sf_dir)
    if bm_key not in _BM_WORK:  # empty corpus: q180 staged an empty probe
        return spark.createDataFrame([], "rnk int, doc_id long, bm25 double")
    work = _BM_WORK[bm_key]
    deleted = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % DELETE_MOD == DELETE_RES)
    )
    apply_bm25_takedown(spark, work, deleted)
    out = probe_bm25(spark, work).localCheckpoint(eager=True)
    return _BMD_STAGE.put(key, out)


def _q181_sql() -> str:
    ctes = _BM25_CTES.replace(
        "FROM documents WHERE text IS NOT NULL",
        "FROM documents WHERE text IS NOT NULL"
        f" AND doc_id % {DELETE_MOD} != {DELETE_RES}",
    )
    assert ctes != _BM25_CTES, "q181 oracle surgery failed"
    return _Q110_SQL.replace(_BM25_CTES, ctes)


STREAMBM25_QUERIES = {
    "q180_stream_bm25_index": q180_stream_bm25_index,
    "q181_bm25_index_takedown": q181_bm25_index_takedown,
}

STREAMBM25_ORACLES = {
    # the maintained index must answer exactly like q110's one-shot plan
    "q180_stream_bm25_index": _Q110_SQL,
    # takedown == rebuild excluding the deleted docs
    "q181_bm25_index_takedown": _q181_sql(),
}
