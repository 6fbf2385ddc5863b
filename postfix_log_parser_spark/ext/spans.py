"""Exact duplicated-substring span detection (q119).

The document-level dedup family (q20-q24, q36, q74) removes whole
documents or fixed chunks; training corpora ALSO carry long verbatim
passages embedded inside otherwise-distinct documents (boilerplate,
licenses, quoted posts).  The published remedy is exact substring
deduplication (Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL 2022): find every maximal character span of length
>= K that occurs verbatim in more than one document.

Spark-first shape (vs the paper's single-node suffix array):

1. fingerprint every K-char window — a narrow per-row ``transform`` over
   ``sequence(1, len-K+1)`` producing ``md5(substr(text, p, K))``, then
   ``posexplode``.  One scan, no shuffle carries the text; only the
   (doc_id, pos, 16-byte hash) triples move.
2. duplicated grams = hash group-by keyed on the fingerprint HAVING
   >= 2 distinct docs — one hash-partitioned shuffle with map-side
   partial aggregation, linear in corpus bytes.
3. join the gram stream back on the fingerprint (output-proportional:
   only duplicated grams survive) and merge adjacent positions per doc
   into maximal spans with the classic gaps-and-islands window —
   partitioned by doc_id, so state is bounded by a single document.

At 100 TB the stride-1 window blowup is the knob: run with stride S > 1
for candidate spans (guaranteed to hit any duplicated span of length
>= K + S - 1), then re-verify candidate regions at stride 1 — same
plan, two passes.  Here stride = 1, which is exact at K.

Portability: md5 is bit-identical in Spark and DuckDB and both engines'
``substr`` is character-based, so the oracle replays the computation
exactly.  All outputs are integer arithmetic — no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.ext.dedup import _AUG_SQL, _augmented

SPAN_K = 40  # minimum duplicated-span length in characters


def duplicated_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Maximal cross-document duplicated spans of length >= ``k`` over any
    (doc_id, text) frame.  Returns (doc_id, span_start, span_len,
    n_windows) with 1-based character offsets."""
    eligible = docs.select("doc_id", "text").filter(F.length("text") >= k)
    # per-doc fingerprint array, exploded to (doc_id, p, h); the text
    # column dies inside this projection — nothing downstream carries it
    hashes = F.transform(
        F.sequence(F.lit(1), F.length("text") - k + 1),
        lambda i: F.md5(F.col("text").substr(i, F.lit(k))),
    )
    grams = eligible.select(
        "doc_id", F.posexplode(hashes).alias("pos0", "h")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("p"), "h")
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = grams.join(dup, "h").select("doc_id", "p")
    by_doc = Window.partitionBy("doc_id").orderBy("p")
    prev = F.lag("p").over(by_doc)
    island = F.sum(
        F.when(prev.isNull() | (F.col("p") - prev > 1), 1).otherwise(0)
    ).over(by_doc)
    return (
        hits.withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") - F.min("p") + k).alias("span_len"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_len", "n_windows")
    )


def q119_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated spans over the augmented corpus (the
    perturbed near-copies guarantee long shared spans exist)."""
    return duplicated_spans(_augmented(spark, sf_dir))


_Q119_SQL = f"""
WITH all_docs AS ({_AUG_SQL}),
d AS (
  SELECT doc_id, text FROM all_docs WHERE length(text) >= {SPAN_K}
),
pos AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) - {SPAN_K} + 2)) AS p
  FROM d
),
g AS (
  SELECT doc_id, p, md5(substr(text, CAST(p AS INTEGER), {SPAN_K})) AS h
  FROM pos
),
dup AS (
  SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
hit AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (h)),
lagged AS (
  SELECT doc_id, p,
         lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
  FROM hit
),
isl AS (
  SELECT doc_id, p,
         sum(CASE WHEN prev IS NULL OR p - prev > 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p) AS island
  FROM lagged
)
SELECT doc_id,
       min(p) AS span_start,
       max(p) - min(p) + {SPAN_K} AS span_len,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl
GROUP BY doc_id, island
"""

SPANS_QUERIES = {
    "q119_substring_dedup": q119_substring_dedup,
}
SPANS_ORACLES = {
    "q119_substring_dedup": _Q119_SQL,
}
