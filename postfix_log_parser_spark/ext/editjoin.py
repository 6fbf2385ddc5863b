"""Exact edit-distance similarity self-join via PassJoin segment blocking.

The missing member of the exact-recall join family: q107 proves exact
set-similarity (AllPairs prefix filter), q164 proves exact Hamming
(banded fingerprints) — this module proves exact EDIT DISTANCE, the
metric entity/record dedup actually wants, without ever going all-pairs.

Technique (public: Li, Deng, Feng, "PASS-JOIN: A Partition-based Method
for Similarity Joins", VLDB 2011): partition each normalized key into
``D+1`` segments.  By pigeonhole, any pair within edit distance ``D``
leaves at least one segment of the smaller-id key untouched, and an
untouched segment reappears in the other key shifted by at most ``D``
positions (each insertion/deletion before it shifts it by one, and
there are at most ``D`` of them).  So the candidate set from the
(segment_index, segment_string) equi-join against the other side's
±D-shifted windows has ZERO false negatives at the threshold — the
DuckDB oracle recomputes the brute-force all-pairs answer, making every
typed contract run a recall proof (the q107/q164 differential pattern).

Contrast with q76 (``ext/entity.py``): q76's last-3-chars block is a
heuristic tuned to its synthesized typos; PassJoin is exact for ANY
input at the declared threshold.

Scale notes (100 TB):

* Index side emits ``D+1`` rows per key, probe side at most
  ``(D+1)·(2D+1)`` windows — both linear in the corpus.  The join is a
  hash-partitioned equi-join on an 8-char segment key; only candidates
  pay the (JVM codegen) ``levenshtein`` verify, and the fingerprint keys
  ride through the join so no re-join with the corpus is needed.
* Candidate volume is sum-of-squares over segment-key frequencies —
  output-proportional unless a segment key is hot.  A hot key (e.g. a
  boilerplate prefix) is the q19/q97 salting situation: split the hot
  key's index rows across salts and replicate the probe rows, or simply
  drop keys whose frequency exceeds a cap into a quarantined exact pass.
  AQE skew-join handles the moderate version of this at runtime.
* Keys here are fixed-length normalized prefixes (rpad to KEY_LEN), so
  segment positions are static and the window enumeration constant-folds
  into the projection — no per-row length dispatch.  Variable-length
  PassJoin adds a length-band join key (len bucket) in front; the
  fixed-length form keeps the demonstration plan minimal.

Reference scope: the reference engine has no similarity join at all
(``parse.py`` is a log normalizer); this is north-star extension
surface, same family as q20-q36.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.analytics import load

KEY_LEN = 24
MAX_ED = 2
N_SEG = MAX_ED + 1          # pigeonhole: D+1 segments
SEG_LEN = KEY_LEN // N_SEG  # 8
_SEG_STARTS = [i * SEG_LEN for i in range(N_SEG)]  # 0-based: 0, 8, 16


def _keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus + planted typo twins, reduced to normalized fixed-length keys.

    Every 20th doc gets a head-perturbed copy (two in-place character
    substitutions at raw positions 3 and 11), landing within edit
    distance ≤ 2 of its original in key space, so the threshold band is
    demonstrably populated.  The key is the whitespace-collapsed,
    lowercased 24-char prefix, right-padded so all keys share one
    length (see module docstring on fixed- vs variable-length PassJoin).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    typo_text = F.concat(
        F.substring("text", 1, 2), F.lit("q"),
        F.substring("text", 4, 7), F.lit("z"),
        F.expr("substring(text, 12)"),
    )
    twins = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), typo_text.alias("text")
    )
    all_docs = docs.unionAll(twins)
    key = F.rpad(
        F.substring(
            F.lower(F.regexp_replace("text", r"\s+", " ")), 1, KEY_LEN
        ),
        KEY_LEN, " ",
    )
    return all_docs.select("doc_id", key.alias("key"))


def q170_passjoin_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All doc pairs whose normalized 24-char prefix keys are within
    edit distance ≤ 2, found via PassJoin segment blocking (exact —
    the oracle brute-forces all pairs, so the typed compare proves
    recall on every corpus it runs on)."""
    keyed = _keyed(spark, sf_dir)

    # Index side: the D+1 aligned segments of each key.
    seg_arr = F.array(*[
        F.substring("key", p + 1, SEG_LEN) for p in _SEG_STARTS
    ])
    index = keyed.select(
        F.col("doc_id"), F.col("key"),
        F.posexplode(seg_arr).alias("seg_idx", "seg"),
    )

    # Probe side: for segment i, every window of SEG_LEN chars starting
    # within ±D of the segment's home position (clipped to the key).
    windows = []
    for i, p in enumerate(_SEG_STARTS):
        for start in range(max(0, p - MAX_ED),
                           min(KEY_LEN - SEG_LEN, p + MAX_ED) + 1):
            windows.append(F.struct(
                F.lit(i).alias("seg_idx"),
                F.substring("key", start + 1, SEG_LEN).alias("win"),
            ))
    probe = keyed.select(
        F.col("doc_id"), F.col("key"),
        F.explode(F.array(*windows)).alias("w"),
    ).select(
        "doc_id", "key",
        F.col("w.seg_idx").alias("seg_idx"),
        F.col("w.win").alias("win"),
    )

    x = index.alias("x")
    y = probe.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.seg_idx") == F.col("y.seg_idx"))
            & (F.col("x.seg") == F.col("y.win"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.key").alias("key_a"),
            F.col("y.key").alias("key_b"),
        )
        .distinct()
    )
    dist = F.levenshtein("key_a", "key_b")
    return (
        cand.withColumn("dist", dist.cast("int"))
        .filter(F.col("dist") <= MAX_ED)
        .select("id_a", "id_b", "dist")
    )


_Q170_SQL = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000,
         substr(text, 1, 2) || 'q' || substr(text, 4, 7) || 'z'
           || substr(text, 12)
  FROM documents WHERE doc_id % 20 = 0
),
k AS (
  SELECT doc_id,
         rpad(substr(lower(regexp_replace(text, '\\s+', ' ', 'g')),
                     1, {KEY_LEN}), {KEY_LEN}, ' ') AS key
  FROM all_docs
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE levenshtein(a.key, b.key) <= {MAX_ED}
"""


EDITJOIN_QUERIES = {
    "q170_passjoin_editdist": q170_passjoin_editdist,
}

EDITJOIN_ORACLES = {
    "q170_passjoin_editdist": _Q170_SQL,
}
