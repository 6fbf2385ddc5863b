"""Conversation-turn assembly — building ordered dialog examples from
an event stream, the SFT-data shape of sessionization.

q10/q54 count session islands; training-data prep needs the step after
that: for each session, the ORDERED sequence of turns, assembled
deterministically so two runs (or two engines) produce bit-identical
examples.  The output row is one dialog per (user, session island):
turn count, start time, distinct-action vocabulary, and an md5 over the
'|'-joined ordered turn sequence — the content hash a downstream
packing/dedup stage (q52, q20) would key on.

Determinism is the point: the turn order is (ts, event_id) — event_id
breaks timestamp ties — expressed as ``array_sort`` over
``collect_list(struct(ts, event_id, event_type))`` on the Spark side
(struct ordering compares fields left-to-right) and
``string_agg(... ORDER BY ts, event_id)`` in the DuckDB oracle, so the
typed contract proves the two engines assemble byte-identical dialogs.

Scale notes (100 TB):

* One window exchange on ``user_id`` marks session starts (the q10
  plan), then one aggregation on ``(user_id, sid)``.  The second
  exchange carries partial aggregates only — map-side combine applies
  because collect_list partials merge associatively; its width is the
  dialog text itself, which is the OUTPUT of this operator, so the
  shuffle is output-proportional by construction.
* Per-group state is one session's turns.  Sessions are bounded by the
  30-minute gap rule; a pathological never-idle key would need the
  chunked fold (q43's state worker) — noted, not needed for dialog
  assembly where the gap rule IS the spec.
* No Python anywhere: array_sort/transform/concat_ws/md5 are all JVM
  codegen expressions.

Reference scope: north-star extension (the reference has no analog);
the session-island definition matches q10 exactly (30-min gap,
(ts, event_id) order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postfix_log_parser_spark.analytics import load

GAP_US = 1_800_000_000  # 30 min, the q10 session gap


def q171_dialog_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (user, session island): deterministic ordered-turn
    dialog hash + shape stats, ready for packing/dedup downstream."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > GAP_US), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = ev.withColumn("sid", F.sum(is_new).over(wsum))

    turns = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    dialog = F.concat_ws(
        "|", F.transform(turns, lambda t: t["event_type"])
    )
    return (
        tagged.groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("session_start"),
            F.countDistinct("event_type").alias("n_distinct_types"),
            F.md5(dialog).alias("dialog_hash"),
        )
        .select(
            "user_id", "sid", "n_turns", "session_start",
            "n_distinct_types", "dialog_hash",
        )
    )


_Q171_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM marked
)
SELECT user_id, sid, count(*) AS n_turns,
       min(ts) AS session_start,
       count(DISTINCT event_type) AS n_distinct_types,
       md5(string_agg(event_type, '|' ORDER BY ts, event_id)) AS dialog_hash
FROM sess GROUP BY user_id, sid
"""


DIALOGS_QUERIES = {
    "q171_dialog_assembly": q171_dialog_assembly,
}

DIALOGS_ORACLES = {
    "q171_dialog_assembly": _Q171_SQL,
}
