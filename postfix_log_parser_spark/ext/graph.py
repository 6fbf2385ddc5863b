"""Graph analytics — PageRank over the event-type transition graph.

Builds a weighted directed graph from consecutive events per user
(src event_type → next event_type, weight = transition count) and runs
a fixed-iteration weighted PageRank.  Complements q36's connected
components (the other standard iterative-graph shape in this engine).

Scale notes (100 TB):

* Edge extraction is one key-partitioned window (``partitionBy(user_id)``
  — never a global sort) followed by one hash aggregate; both get
  map-side partial work.
* Each PageRank iteration is the canonical distributed step: one
  (edges ⋈ ranks) shuffle keyed on src + one sum-aggregate keyed on dst.
  Ranks never leave the cluster; the driver holds only the loop counter.
  With billions of nodes the join is shuffle-hash on the node id; here
  the rank side is tiny so AQE broadcasts it — both are the same logical
  plan.
* Iterations are FIXED (3), not converged-by-driver-count, so the whole
  query is a single declarative plan Catalyst can pipeline — and the
  DuckDB oracle can unroll it exactly.
* Dangling mass (nodes with no out-edges) is dropped, the simplified
  textbook variant; both engines drop it identically, so results match
  bit-for-bit after the in-query rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.analytics import load

DAMPING = 0.85
ITERATIONS = 3


def q73_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 iterations, d=0.85) over event-type
    transitions.  Output: (event_type, pagerank) rounded to 9 places."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count("*").alias("wgt"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # node-type cardinality: tiny, loop constant
    if n_nodes == 0:
        # empty-input totality: no edges → empty ranks with the schema
        return nodes.select(
            F.col("node").alias("event_type"),
            F.lit(0.0).alias("pagerank"),
        )
    out_w = edges.groupBy("src").agg(F.sum("wgt").alias("outw"))
    edges_n = edges.join(out_w, "src").select(
        "src", "dst", (F.col("wgt") / F.col("outw")).alias("frac")
    )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(ITERATIONS):
        contrib = (
            edges_n.join(ranks, edges_n["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("frac")).alias("mass"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1.0 - DAMPING) / n_nodes)
                + F.lit(DAMPING) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks.select(
        F.col("node").alias("event_type"), F.round("pr", 9).alias("pagerank")
    )


def _iter_sql(prev: str, idx: int) -> str:
    return f"""
r{idx} AS (
  SELECT n.node,
         (1.0 - {DAMPING}) / (SELECT cnt FROM n_nodes)
           + {DAMPING} * coalesce(m.mass, 0.0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(p.pr * e.frac) AS mass
    FROM edges_n e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
  ) m ON n.node = m.dst
)"""


_Q73_SQL = (
    """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
edges AS (
  SELECT src, dst, count(*) AS wgt FROM seq
  WHERE dst IS NOT NULL GROUP BY 1, 2
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
  )
),
n_nodes AS (SELECT count(*) AS cnt FROM nodes),
edges_n AS (
  SELECT e.src, e.dst, e.wgt * 1.0 / o.outw AS frac
  FROM edges e JOIN (
    SELECT src, sum(wgt) AS outw FROM edges GROUP BY 1
  ) o ON e.src = o.src
),
r0 AS (
  SELECT node, 1.0 / (SELECT cnt FROM n_nodes) AS pr FROM nodes
),"""
    + ",".join(_iter_sql(f"r{i}", i + 1) for i in range(ITERATIONS))
    + f"""
SELECT node AS event_type, round(pr, 9) AS pagerank FROM r{ITERATIONS}
"""
)


GRAPH_QUERIES = {
    "q73_pagerank_transitions": q73_pagerank_transitions,
}

GRAPH_ORACLES = {
    "q73_pagerank_transitions": _Q73_SQL,
}
