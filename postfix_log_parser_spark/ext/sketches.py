"""Sketch-based approximate aggregation — count-min sketch heavy hitters.

The reference's ClickHouse half exposes approximate aggregation through
combinators (``uniq``/``topK`` over the events MergeTree,
``lognormalizer/parse.py:27-54``); q15 already covers the distinct-count
sketch (HLL via ``approx_count_distinct``).  This module adds the
frequency sketch: a count-min sketch (Cormode & Muthukrishnan 2005)
built entirely with Catalyst aggregates.

Scale notes (100 TB):

* The sketch build explodes each row into ``d`` (row, bucket) pairs and
  hash-aggregates on (row, bucket).  Cardinality of the agg key space is
  ``d × w`` (4 × 512 = 2048), so map-side partial aggregation collapses
  every input partition to ≤2048 rows before the exchange — shuffle
  volume is O(d·w·partitions), independent of input rows or key
  cardinality.  That is the entire point of the sketch on a cluster:
  counters travel, keys don't.
* The finished sketch (≤2048 rows) is broadcast back to score candidate
  keys — no second big-side shuffle.
* The query is self-verifying the same way q15 is: it carries the exact
  count next to the estimate and a ``within_bound`` flag for the CMS
  guarantee est ≤ exact + ⌈e·N/w⌉ (the md5-derived hashes are shared
  bit-for-bit with the DuckDB oracle, so estimates match exactly).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.analytics import load

CMS_DEPTH = 4
CMS_WIDTH = 512
TOP_K = 20
# e/w error factor: est <= exact + ceil(E * N / CMS_WIDTH) w.p. 1 - e^-d
_E = 2.718281828459045


def _bucket(i: int, key) -> F.Column:
    """Portable md5-derived CMS bucket, shared with the DuckDB oracle."""
    s = F.concat(F.lit(f"{i}|"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % CMS_WIDTH
    )


def q71_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by count-min-sketch estimate over ``events``.

    Output: (user_id, est_count, exact_count, within_bound) — exact is
    carried for verification only; on a real corpus where per-key exact
    counts are unaffordable, the sketch columns are the product.
    """
    ev = load(spark, sf_dir, "events").select("user_id")
    pairs = ev.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _bucket(i, F.col("user_id")).alias("bucket"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("user_id", "p.i", "p.bucket")
    # ≤ d×w rows after the map-side partial agg collapses each partition
    counters = pairs.groupBy("i", "bucket").agg(F.count("*").alias("c"))
    total = ev.agg(F.count("*").alias("n"))

    keys = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    key_buckets = keys.select(
        "user_id",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _bucket(i, F.col("user_id")).alias("bucket"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_count", "p.i", "p.bucket")
    est = (
        key_buckets.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )
    # limit-first so Spark plans TakeOrderedAndProject (per-partition
    # heaps, no single-partition global Window) over the |distinct users|
    # estimate table; row_number then ranks only the TOP_K survivors.
    topk = est.orderBy(F.desc("est_count"), F.asc("user_id")).limit(TOP_K)
    ranked = topk.join(F.broadcast(total)).withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.desc("est_count"), F.asc("user_id"))
        ),
    )
    return (
        ranked.filter(F.col("rn") <= TOP_K)
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (
                F.col("est_count")
                <= F.col("exact_count")
                + F.ceil(F.lit(_E) * F.col("n") / F.lit(CMS_WIDTH))
            ).alias("within_bound"),
        )
    )


_Q71_SQL = f"""
WITH ev AS (SELECT user_id FROM events),
tot AS (SELECT count(*) AS n FROM ev),
rows_i AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS i),
pairs AS (
  SELECT user_id, i,
         CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' ||
               CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {CMS_WIDTH} AS bucket
  FROM ev CROSS JOIN rows_i
),
counters AS (SELECT i, bucket, count(*) AS c FROM pairs GROUP BY 1, 2),
keys AS (SELECT user_id, count(*) AS exact_count FROM ev GROUP BY 1),
key_buckets AS (
  SELECT user_id, exact_count, i,
         CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' ||
               CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {CMS_WIDTH} AS bucket
  FROM keys CROSS JOIN rows_i
),
est AS (
  SELECT kb.user_id, kb.exact_count, min(c.c) AS est_count
  FROM key_buckets kb JOIN counters c USING (i, bucket)
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY est_count DESC, user_id) AS rn
  FROM est
)
SELECT user_id, est_count, exact_count,
       est_count <= exact_count
         + CAST(ceil({_E} * (SELECT n FROM tot) / {CMS_WIDTH}) AS BIGINT)
         AS within_bound
FROM ranked WHERE rn <= {TOP_K}
"""


def q94_hll_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-day HLL sketch table → union-merged distinct users.

    THE pre-aggregation pattern for distinct counts at 100 TB: a nightly
    job reduces each day-partition to one fixed-size Datasketches HLL
    sketch (``hll_sketch_agg``, lgK=12 → ≤4 KB); any date-range distinct
    count is then ``hll_union_agg`` over the matching sketch rows — the
    fact table is never rescanned, and sketch merge is associative so
    the union runs as a tiny two-phase aggregate.  (A plain
    ``approx_count_distinct`` — q15 — cannot be incrementally maintained
    across runs; the sketch table can: new days append, ranges merge.)

    Self-verifying like q15: the engine-specific estimate is never
    hashed; the query returns the day count, the exact distinct count,
    and a ``within_bound`` flag for 3x the lgK=12 relative standard
    error (3 x 1.04 / sqrt(2^12) ~ 4.9%) that the oracle asserts TRUE.
    """
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    daily = ev.groupBy("d").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    rse3 = 3 * 1.04 / (2 ** 6)  # 3 x 1.04/sqrt(2^12)
    return merged.join(F.broadcast(exact)).select(
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.greatest(
                F.ceil(F.lit(rse3) * F.col("exact_users")), F.lit(1)
            )
        ).alias("within_bound"),
    )


_Q94_SQL = """
SELECT count(DISTINCT date_trunc('day', ts)) AS n_days,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events
"""


# ---------------------------------------------------------------------------
# q136 — KMV (bottom-k) sketches: pairwise corpus overlap without pair joins
# ---------------------------------------------------------------------------

KMV_K = 64  # bottom-k sketch size per source


def q136_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shingle-set Jaccard between sources, estimated from
    KMV (bottom-k) sketches [Bar-Yossef et al. RANDOM'02; Beyer et al.
    SIGMOD'07] — plus the exact value for self-verification.

    Why this matters at 100 TB: "how much does source A overlap source
    B?" drives dedup planning and mix design, but the exact answer
    joins the full shingle inventories of every source pair.  A KMV
    sketch reduces each source to its K smallest distinct md5 hashes —
    mergeable, fixed-size, buildable in one pass — and estimates any
    pair's Jaccard from 2K longs: among the k smallest hashes of the
    merged pair, the fraction present in both sketches.  The sketch
    build is a TWO-PHASE bottom-k (``ext.topk.partial_topk``): each map
    partition pre-trims to its local K smallest per source before the
    exchange, so the per-source rank sorts K × partitions rows instead
    of a hot source's entire distinct-shingle inventory; the pair stage
    touches only the n_sources×K sketch table, never the corpus.

    The md5-derived hashes are shared bit-for-bit with the DuckDB
    oracle, so the ESTIMATES match exactly across engines — estimation
    error shows up only against ``exact_jaccard``, carried per pair.
    """
    from postfix_log_parser_spark.ext.dedup import shingles3_udf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "text"
    )
    # UDF projection persisted BEFORE the explode (guide §4.4 fence via
    # the cache boundary — deterministic, so the CacheManager dedupes
    # the entry across repeated invocations; see dedup.shingled)
    from postfix_log_parser_spark.ext.staging import track_persist

    arrs = track_persist(docs.select(
        "source", shingles3_udf(F.col("text")).alias("sh_arr")
    ).persist(StorageLevel.MEMORY_AND_DISK))
    sh = (
        arrs.select("source", F.explode("sh_arr").alias("s"))
        .select(
            "source",
            (
                F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10)
                .cast("long")
            ).alias("h"),
        )
        .distinct()
        # four consumers (sizes, sketch trim, both exact-join sides):
        # materialize the deduped hash set once instead of re-running the
        # shingle UDF + distinct exchange per consumer (r12; the plan had
        # SIX ArrowEvalPython corpus passes and zero cached subtrees)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    track_persist(sh)
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    # two-phase bottom-K (ext.topk.partial_topk): each partition's local
    # K smallest hashes per source are trimmed BEFORE the exchange, so
    # the per-source sort ranks K × partitions rows, not the source's
    # full distinct-shingle inventory — the skew-robust sketch build
    from postfix_log_parser_spark.ext.topk import partial_topk

    trimmed = partial_topk(sh, "source", "h", None, KMV_K, ascending=True)
    rk = F.row_number().over(Window.partitionBy("source").orderBy("h"))
    sk = (
        trimmed.withColumn("r", rk)
        .filter(F.col("r") <= KMV_K)
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("h")).alias("sk"))
    )
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    a = sk.alias("a")
    b = sk.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.sk").alias("ska"),
        F.col("b.sk").alias("skb"),
    )
    u = F.array_sort(F.array_distinct(F.concat(F.col("ska"), F.col("skb"))))
    k = F.least(F.lit(KMV_K), F.size(u))
    thr = F.get(u, k - 1)
    matches = F.size(
        F.filter(
            F.array_intersect(F.col("ska"), F.col("skb")),
            lambda x: x <= thr,
        )
    )
    est = pairs.select(
        "src_a",
        "src_b",
        F.round(matches / k, 4).alias("kmv_jaccard"),
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    exact = F.round(
        F.coalesce(F.col("n_inter"), F.lit(0))
        / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
        4,
    )
    return (
        est.join(inter, ["src_a", "src_b"], "left")
        .join(sa, "src_a")
        .join(sb, "src_b")
        .select("src_a", "src_b", "kmv_jaccard", exact.alias("exact_jaccard"))
    )


def _q136_sql() -> str:
    from postfix_log_parser_spark.ext.dedup import (
        _DUCK_SHINGLES,
        _DUCK_WORDS,
        _duck_md5_long,
    )

    return f"""
WITH tok AS (
  SELECT source, {_DUCK_SHINGLES.replace('words', _DUCK_WORDS)} AS shingles
  FROM documents
),
sh AS (
  SELECT DISTINCT source, {_duck_md5_long('s')} AS h
  FROM (SELECT source, unnest(shingles) AS s FROM tok)
),
sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
rk AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS r
  FROM sh
),
sk AS (
  SELECT source, list_sort(list(h)) AS sk
  FROM rk WHERE r <= {KMV_K} GROUP BY source
),
inter AS (
  SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_inter
  FROM sh x JOIN sh y ON x.h = y.h AND x.source < y.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, a.sk AS ska, b.sk AS skb,
         list_sort(list_distinct(a.sk || b.sk)) AS u,
         least({KMV_K}, len(list_distinct(a.sk || b.sk))) AS k
  FROM sk a JOIN sk b ON a.source < b.source
)
SELECT p.src_a, p.src_b,
       round(len(list_filter(list_intersect(p.ska, p.skb),
                             x -> x <= p.u[p.k]))::DOUBLE / p.k, 4)
         AS kmv_jaccard,
       round(coalesce(i.n_inter, 0)::DOUBLE
             / (sa.n + sb.n - coalesce(i.n_inter, 0)), 4) AS exact_jaccard
FROM pairs p
LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
JOIN sizes sa ON sa.source = p.src_a
JOIN sizes sb ON sb.source = p.src_b
"""


# ---------------------------------------------------------------------------
# q165 — Bloom-filter decontamination (q47's probabilistic 100 TB twin)
# ---------------------------------------------------------------------------

BLOOM_M = 16384  # filter bits
BLOOM_K = 3  # hash probes per gram
_BLOOM_WORD_BITS = 62  # keep shifts off the sign bit: both engines agree


def q165_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47's decontamination with the eval gram set compressed into a
    BLOOM FILTER: K=3 md5-derived probes over an M=16384-bit array
    stored as ≤265 (word, mask) rows of 62 bits each.  q47 broadcasts
    the raw eval gram SET — fine while eval is small, but a 100 TB
    decontamination sweep against a large benchmark suite broadcasts
    gigabytes of strings; the Bloom table is fixed-size (2 KB here,
    a few MB at any scale) regardless of gram count, at the price of a
    measured false-positive rate.

    Output per training doc: ``n_flagged`` (grams the filter accuses —
    the superset), ``n_shared`` (exact ground truth, same join as q47),
    and ``no_false_negatives`` — the Bloom guarantee, TRUE by
    construction and recomputed by the oracle, so a broken hash or mask
    goes red on every corpus.  n_flagged − n_shared is the measured FP
    mass; tune M/K against it, exactly the q132/q159 audit discipline.

    Scale shape: the eval side collapses to the tiny bloom table before
    any join; the training side is ONE exploded-gram pass probed via a
    broadcast hash join on the word index — no shuffle of the corpus.
    """
    from postfix_log_parser_spark.ext.textstats import gram5_arrays

    # ONE cached gram-array projection feeds both sides (shared with q47
    # — same canonical plan, same CacheManager entry); the doc_id slices
    # and explodes run above the cache boundary, so the UDF is evaluated
    # exactly once per corpus instead of twice per side (guide §4.4)
    g = gram5_arrays(spark, sf_dir)
    ev = (
        g.filter(F.col("doc_id") % 53 == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    tr = g.filter(F.col("doc_id") % 53 != 0).select(
        "doc_id", F.explode("grams").alias("gram")
    )

    def pos(i: int) -> F.Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("gram"))), 1, 15),
            16, 10,
        ).cast("long")
        return h % BLOOM_M

    probe_arr = F.array(*[pos(i) for i in range(BLOOM_K)])
    bloom = (
        ev.select(F.explode(probe_arr).alias("pos"))
        .select(
            (F.col("pos") / _BLOOM_WORD_BITS).cast("long").alias("word"),
            (F.col("pos") % _BLOOM_WORD_BITS).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            # F.shiftleft takes a literal count — expr for a column count
            F.bit_or(F.expr("shiftleft(cast(1 as bigint), bit)")).alias("mask")
        )
        # materialize the <=265-row filter ONCE: it feeds K broadcast
        # joins, and without this each join replans the whole eval
        # subtree (scan + gram UDF + distinct) — 3 extra corpus scans
        .localCheckpoint(eager=True)
    )
    # K probes as COLUMNS (not an explode): K broadcast hash joins on the
    # word index, so the training gram stream is never shuffled — the only
    # exchange in the whole query is the final doc_id aggregate
    trp = tr
    for i in range(BLOOM_K):
        trp = trp.withColumn(f"_p{i}", pos(i))
        trp = trp.withColumn(
            f"_w{i}", (F.col(f"_p{i}") / _BLOOM_WORD_BITS).cast("long")
        ).withColumn(
            f"_b{i}", (F.col(f"_p{i}") % _BLOOM_WORD_BITS).cast("int")
        )
    for i in range(BLOOM_K):
        trp = trp.join(
            F.broadcast(
                bloom.select(
                    F.col("word").alias(f"_w{i}"),
                    F.col("mask").alias(f"_m{i}"),
                )
            ),
            f"_w{i}", "left",
        )
    hits = [
        F.coalesce(
            F.col(f"_m{i}").bitwiseAND(
                F.expr(f"shiftleft(cast(1 as bigint), _b{i})")
            ) != 0,
            F.lit(False),
        )
        for i in range(BLOOM_K)
    ]
    flagged = hits[0]
    for h in hits[1:]:
        flagged = flagged & h
    per_gram = (
        trp.withColumn("flagged", flagged)
        .join(
            F.broadcast(ev.withColumn("is_exact", F.lit(True))),
            "gram", "left",
        )
        .withColumn("is_exact", F.coalesce(F.col("is_exact"), F.lit(False)))
    )
    return (
        per_gram.filter(F.col("flagged") | F.col("is_exact"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("flagged"), 1).otherwise(0))
            .cast("long").alias("n_flagged"),
            F.sum(F.when(F.col("is_exact"), 1).otherwise(0))
            .cast("long").alias("n_shared"),
            F.bool_and(F.col("flagged") | ~F.col("is_exact"))
            .alias("no_false_negatives"),
        )
    )


def _q165_sql() -> str:
    from postfix_log_parser_spark.ext.dedup import _DUCK_WORDS, _duck_md5_long

    probes = " UNION ALL ".join(
        f"SELECT doc_id, gram, "
        f"{_duck_md5_long(f'''CAST({i} AS VARCHAR) || '|' || gram''')} "
        f"% {BLOOM_M} AS pos FROM {{side}}"
        for i in range(BLOOM_K)
    )
    return f"""
WITH d AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
g AS (SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 3),
                           i -> array_to_string(words[i:i+4], ' '))) AS grams
      FROM d WHERE len(words) >= 5),
ev AS (SELECT DISTINCT unnest(grams) AS gram, CAST(0 AS BIGINT) AS doc_id
       FROM g WHERE doc_id % 53 = 0),
tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 53 <> 0),
evp AS ({probes.format(side='ev')}),
bloom AS (
  SELECT pos // {_BLOOM_WORD_BITS} AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD_BITS} AS INTEGER)) AS mask
  FROM evp GROUP BY 1
),
trp AS ({probes.format(side='tr')}),
hits AS (
  SELECT t.doc_id, t.gram,
         sum(CASE WHEN (b.mask & (CAST(1 AS BIGINT)
                 << CAST(t.pos % {_BLOOM_WORD_BITS} AS INTEGER))) <> 0
             THEN 1 ELSE 0 END) AS nh
  FROM trp t LEFT JOIN bloom b ON t.pos // {_BLOOM_WORD_BITS} = b.word
  GROUP BY 1, 2
),
per_gram AS (
  SELECT h.doc_id, h.gram, h.nh = {BLOOM_K} AS flagged,
         (e.gram IS NOT NULL) AS is_exact
  FROM hits h LEFT JOIN (SELECT DISTINCT gram FROM ev) e ON h.gram = e.gram
)
SELECT doc_id,
       CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(sum(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       bool_and(flagged OR NOT is_exact) AS no_false_negatives
FROM per_gram
WHERE flagged OR is_exact
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q168 — HDR log-linear quantile sketch (mergeable, integer-exact buckets)
# ---------------------------------------------------------------------------
#
# The missing member of the sketch family next to CMS (frequency), HLL
# (cardinality), and KMV (overlap): a MERGEABLE quantile sketch.  The
# design is HdrHistogram's log-linear bucketing (public design, Gene
# Tene's HdrHistogram; same family as DDSketch's log buckets, Masson et
# al. VLDB'19) with M=5 mantissa bits, done in pure INTEGER arithmetic
# so both engines agree bit-for-bit — no log()/pow() whose libm last-ulp
# differences would flip boundary buckets (the r8 round-tie lesson):
#
#   v < 32        -> idx = v                     (exact region)
#   v >= 32       -> b = floor(log2 v) = length(bin(v)) - 1
#                    idx = (b-4)*32 + (v >> (b-5)) - 32
#
# Bucket width is 2^(b-5), so the midpoint representative is within
# 1/64 of any value in the bucket — a guaranteed relative error of
# 1.5625%, checked per key against the EXACT same-rank percentile
# (64*|est-exact| <= exact, integers only).
#
# Scale (100 TB): the sketch is the (key, idx, cnt) table — at most a
# few hundred buckets per key regardless of input rows, so map-side
# partial aggregation collapses every partition before the one
# exchange; counters travel, values don't.  Buckets merge by adding
# counts (test_sketches pins merge-equals-rebuild).  The exact-rank
# audit column deliberately pays one value-sorted window — the same
# measured-not-assumed pattern as q132/q159.

_HDR_IDX = (
    "CASE WHEN {v} < 32 THEN {v} "
    "ELSE (length(bin({v})) - 5) * 32 "
    "     + shiftright({v}, length(bin({v})) - 6) - 32 END"
)
# idx -> integer midpoint of the bucket: lo + (width-1) div 2.
# The shiftleft bases MUST be BIGINT: Spark's shiftleft on an INT base
# wraps at 32 bits (v >= 2^36 would corrupt silently).
_HDR_REP = (
    "CASE WHEN {i} < 32 THEN CAST({i} AS BIGINT) "
    "ELSE shiftleft(CAST(32 + {i} % 32 AS BIGINT), {i} div 32 - 1) "
    "     + (shiftleft(CAST(1 AS BIGINT), {i} div 32 - 1) - 1) div 2 END"
)


def hdr_sketch(values: DataFrame, key: str, v: str) -> DataFrame:
    """(key, idx, cnt): the mergeable sketch table — merge = sum(cnt)."""
    return (
        values.withColumn("idx", F.expr(_HDR_IDX.format(v=v)))
        .groupBy(key, "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantiles(sketch: DataFrame, key: str, qs: list) -> DataFrame:
    """Per-key quantile estimates from a sketch table: rank r=ceil(n*q)
    selected with the integer predicate 100*cum >= n*q_pct."""
    wk = Window.partitionBy(key)
    wo = (
        Window.partitionBy(key)
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = sketch.withColumn("n", F.sum("cnt").over(wk)).withColumn(
        "cum", F.sum("cnt").over(wo)
    )
    aggs = [F.first("n").alias("n")]
    for q in qs:
        i = F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * q, F.col("idx"))
        )
        aggs.append(i.alias(f"i{q}"))
    est = s.groupBy(key).agg(*aggs)
    for q in qs:
        est = est.withColumn(
            f"est_p{q}", F.expr(_HDR_REP.format(i=f"i{q}")).cast("long")
        ).drop(f"i{q}")
    return est


def hdr_audit_report(est: DataFrame, raw: DataFrame, qs: list) -> DataFrame:
    """Join sketch estimates with the exact same-rank percentiles from
    the raw (key, v) values and flag the integer 1/64 error guarantee:
    r = ceil(n*q/100) <=> 100r >= nq AND 100r < nq+100."""
    wk = Window.partitionBy("key")
    wv = Window.partitionBy("key").orderBy("v")
    ranked = raw.withColumn("rn", F.row_number().over(wv)).withColumn(
        "nn", F.count(F.lit(1)).over(wk)
    )
    exact_aggs = []
    for q in qs:
        cond = (F.col("rn") * 100 >= F.col("nn") * q) & (
            F.col("rn") * 100 < F.col("nn") * q + 100
        )
        exact_aggs.append(F.max(F.when(cond, F.col("v"))).alias(f"exact_p{q}"))
    exact = ranked.groupBy("key").agg(*exact_aggs)
    out = est.join(exact, "key")
    for q in qs:
        out = out.withColumn(
            f"ok{q}",
            F.abs(F.col(f"est_p{q}") - F.col(f"exact_p{q}")) * 64
            <= F.col(f"exact_p{q}"),
        )
    return out.select(
        "key", "n",
        *[c for q in qs for c in (f"est_p{q}", f"exact_p{q}", f"ok{q}")],
    )


def q168_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-value p50/p95/p99 from the mergeable HDR
    sketch, each estimate audited against the exact same-rank percentile
    with the integer 1/64 relative-error guarantee."""
    orders = load(spark, sf_dir, "orders")
    raw = orders.select(
        F.col("o_orderpriority").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    qs = [50, 95, 99]
    est = hdr_quantiles(hdr_sketch(raw, "key", "v"), "key", qs)
    return hdr_audit_report(est, raw, qs)


def hdr_sql(raw_sql: str) -> str:
    """The full sketch+audit pipeline as ANSI SQL over any ``raw_sql``
    producing (key, v) — shared by q168 (orders) and q169 (events)."""
    idx = _HDR_IDX.format(v="v").replace("div", "//").replace(
        "shiftright(v, length(bin(v)) - 6)", "(v >> (length(bin(v)) - 6))"
    )
    rep = (
        "CASE WHEN {i} < 32 THEN CAST({i} AS BIGINT) "
        "ELSE (CAST(32 + {i} % 32 AS BIGINT) << ({i} // 32 - 1)) "
        "     + ((1::BIGINT << ({i} // 32 - 1)) - 1) // 2 END"
    )
    qs = [50, 95, 99]
    est_cols = ", ".join(
        f"CAST({rep.format(i=f'i{q}')} AS BIGINT) AS est_p{q}" for q in qs
    )
    i_cols = ", ".join(
        f"min(CASE WHEN cum * 100 >= n * {q} THEN idx END) AS i{q}"
        for q in qs
    )
    exact_cols = ", ".join(
        f"max(CASE WHEN rn * 100 >= nn * {q} AND rn * 100 < nn * {q} + 100 "
        f"THEN v END) AS exact_p{q}"
        for q in qs
    )
    ok_cols = ", ".join(
        f"abs(est_p{q} - exact_p{q}) * 64 <= exact_p{q} AS ok{q}" for q in qs
    )
    out_cols = ", ".join(
        f"est_p{q}, exact_p{q}, ok{q}" for q in qs
    )
    return f"""
WITH raw AS (
  {raw_sql}
),
sketch AS (
  SELECT key, {idx} AS idx, count(*) AS cnt
  FROM raw GROUP BY key, 2
),
cums AS (
  SELECT key, idx, cnt,
         sum(cnt) OVER (PARTITION BY key) AS n,
         sum(cnt) OVER (PARTITION BY key ORDER BY idx
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM sketch
),
est0 AS (
  SELECT key, CAST(max(n) AS BIGINT) AS n, {i_cols}
  FROM cums GROUP BY key
),
est AS (
  SELECT key, n, {est_cols} FROM est0
),
ranked AS (
  SELECT key, v,
         row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY key) AS nn
  FROM raw
),
exact AS (
  SELECT key, {exact_cols} FROM ranked GROUP BY key
),
joined AS (
  SELECT est.key AS key, n,
         {", ".join(f"est_p{q}, exact_p{q}" for q in qs)}
  FROM est JOIN exact ON est.key = exact.key
)
SELECT key, n, {out_cols}
FROM (SELECT *, {ok_cols} FROM joined)
"""


SKETCHES_QUERIES = {
    "q71_heavy_hitters_cms": q71_heavy_hitters_cms,
    "q94_hll_sketch_table": q94_hll_sketch_table,
    "q136_kmv_overlap": q136_kmv_overlap,
    "q165_bloom_decontamination": q165_bloom_decontamination,
    "q168_hdr_quantiles": q168_hdr_quantiles,
}

SKETCHES_ORACLES = {
    "q71_heavy_hitters_cms": _Q71_SQL,
    "q94_hll_sketch_table": _Q94_SQL,
    "q136_kmv_overlap": _q136_sql(),
    "q165_bloom_decontamination": _q165_sql(),
    "q168_hdr_quantiles": hdr_sql(
        "SELECT o_orderpriority AS key, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders"
    ),
}
