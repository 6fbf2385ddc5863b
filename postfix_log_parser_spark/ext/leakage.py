"""Dedup-aware split leakage audit (q154).

A hash split (q83) is uniform over DOCUMENTS, but evaluation honesty
needs it uniform over CONTENT: when two near-duplicates land on
opposite sides of the train/test line, the test set leaks — the model
has effectively seen the answer.  The audit joins the near-dup
component map (q36) against the split assignment and counts components
that STRADDLE splits, plus the val/test members whose component also
contains a train document (the actually-contaminated eval rows a
pipeline must re-assign; the standard fix is splitting BY COMPONENT —
hash the component id, not the doc id).

Scale shape (100 TB): the component map is output-proportional (only
docs with near-dup edges appear); the split label is a constant-folded
hash of doc_id computed inside the join projection — no second corpus
scan, no window.  One component-keyed aggregate and a 1-row summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postfix_log_parser_spark.ext.corpus import SPLIT_TRAIN, SPLIT_VAL
from postfix_log_parser_spark.ext.dedup import _q36_sql, q36_dedup_components


def _split_of(doc_id) -> "F.Column":
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"), doc_id.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return (
        F.when(draw < SPLIT_TRAIN, F.lit("train"))
        .when(draw < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def q154_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit: (n_components, n_straddling, straddle_rate,
    n_docs_in_straddling, n_leaky_eval_docs) — leaky eval docs are
    val/test members of a component that also holds a train member."""
    comps = q36_dedup_components(spark, sf_dir)
    labeled = comps.select(
        "component_id", "doc_id", _split_of(F.col("doc_id")).alias("split")
    )
    per_comp = labeled.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct("split").alias("n_splits"),
        F.max((F.col("split") == "train").cast("int")).alias("has_train"),
        F.sum((F.col("split") != "train").cast("int")).alias("n_eval_members"),
    )
    straddle = F.col("n_splits") > 1
    return per_comp.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum(straddle.cast("int")).cast("long").alias("n_straddling"),
        F.round(
            F.sum(straddle.cast("int")).cast("double") / F.count(F.lit(1)), 4
        ).alias("straddle_rate"),
        F.sum(F.when(straddle, F.col("n_members")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_docs_in_straddling"),
        F.sum(
            F.when(
                straddle & (F.col("has_train") == 1), F.col("n_eval_members")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_leaky_eval_docs"),
    )


def _q154_sql() -> str:
    split = f"""CASE
      WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
           < {SPLIT_TRAIN} THEN 'train'
      WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
           < {SPLIT_VAL} THEN 'val'
      ELSE 'test' END"""
    return f"""
WITH comps AS ({_q36_sql()}),
labeled AS (
  SELECT component_id, doc_id, {split} AS split FROM comps
),
per_comp AS (
  SELECT component_id,
         count(*) AS n_members,
         count(DISTINCT split) AS n_splits,
         max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train,
         sum(CASE WHEN split != 'train' THEN 1 ELSE 0 END) AS n_eval_members
  FROM labeled GROUP BY component_id
)
SELECT CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddling,
       round(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS straddle_rate,
       CAST(sum(CASE WHEN n_splits > 1 THEN n_members ELSE 0 END) AS BIGINT)
         AS n_docs_in_straddling,
       CAST(sum(CASE WHEN n_splits > 1 AND has_train = 1
                     THEN n_eval_members ELSE 0 END) AS BIGINT)
         AS n_leaky_eval_docs
FROM per_comp
"""


LEAKAGE_QUERIES = {"q154_split_leakage": q154_split_leakage}
LEAKAGE_ORACLES = {"q154_split_leakage": _q154_sql()}


# ---------------------------------------------------------------------------
# q160 — dedup-aware split REPAIR: assign splits by component, not doc
# ---------------------------------------------------------------------------

def q160_component_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIX for the leakage q154 measures: hash the COMPONENT id (the
    near-dup cluster's canonical doc_id), not the doc id, so every member
    of a cluster lands on the same side of the train/val/test line by
    construction — zero straddling components, zero leaky eval docs.
    Singleton docs (no near-dup edge) keep the plain doc-id hash, so the
    repair perturbs only the contaminated sliver of the q83 split.

    Output: one row per split — (split, n_docs, n_dup_members,
    n_components) over the augmented corpus.  The no-straddle property
    is pinned in pytest (every component's members share one split).

    Scale shape (100 TB): the component map is output-proportional and
    STAGED (one LSH+CC execution per session); the corpus left-joins it
    on doc_id — one hash exchange against a small side (broadcastable at
    any scale where dup clusters are rare) — and the split label is a
    constant-folded md5 of the coalesced key.  One keyed aggregate."""
    from postfix_log_parser_spark.ext.dedup import _augmented, q36_dedup_components

    comps = q36_dedup_components(spark, sf_dir)
    docs = _augmented(spark, sf_dir).select("doc_id")
    j = docs.join(F.broadcast(comps), "doc_id", "left")
    key = F.coalesce(F.col("component_id"), F.col("doc_id"))
    labeled = j.select(
        "doc_id",
        "component_id",
        _split_of(key).alias("split"),
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("component_id").isNotNull().cast("int"))
            .cast("long")
            .alias("n_dup_members"),
            F.count_distinct("component_id").cast("long").alias("n_components"),
        )
    )


def _q160_sql() -> str:
    from postfix_log_parser_spark.ext.dedup import _AUG_SQL

    split = f"""CASE
      WHEN CAST(('0x' || substr(md5('split|' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
           < {SPLIT_TRAIN} THEN 'train'
      WHEN CAST(('0x' || substr(md5('split|' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
           < {SPLIT_VAL} THEN 'val'
      ELSE 'test' END"""
    return f"""
WITH comps AS MATERIALIZED ({_q36_sql()}),
all_docs AS ({_AUG_SQL}),
j AS (
  SELECT d.doc_id, c.component_id,
         coalesce(c.component_id, d.doc_id) AS k
  FROM all_docs d LEFT JOIN comps c USING (doc_id)
),
labeled AS (SELECT doc_id, component_id, {split} AS split FROM j)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN component_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_members,
       CAST(count(DISTINCT component_id) AS BIGINT) AS n_components
FROM labeled GROUP BY split
"""


LEAKAGE_QUERIES["q160_component_split"] = q160_component_split
LEAKAGE_ORACLES["q160_component_split"] = _q160_sql()
