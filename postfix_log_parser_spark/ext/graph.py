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
from pyspark.storagelevel import StorageLevel

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


# ---------------------------------------------------------------------------
# q106 — triangle counting (degree-ordered compact-forward enumeration)
# ---------------------------------------------------------------------------

def q106_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the strong-transition graph.

    Graph: undirected event-type edges whose transition count exceeds the
    median edge weight (the weight filter keeps only *strong* transitions,
    so the graph has actual structure instead of being complete).

    Scale shape — the canonical distributed triangle count:

    * Edges are oriented low→high by ``(degree, node)`` before wedge
      generation (the "compact-forward" trick): every wedge is enumerated
      at its lowest-degree apex, so a hub with degree d contributes
      O(d·avg_deg) wedges instead of O(d²) — THE difference between a
      tractable and an intractable count on power-law graphs.
    * Wedge generation is a self-equi-join on the apex node; closing the
      wedge is one more equi-join against the oriented edge set.  Three
      hash shuffles total, all key-partitioned, no all-pairs step.
    * Each triangle is produced exactly once (at its apex), then exploded
      to its three corners for the per-node aggregate.

    The median edge weight is computed distributively (``quantile_cont``
    twin of q87's rank shape would also work; the edge table is tiny here
    and at 100 TB it is |V²| bounded, far below the event count).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weighted = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("event_type")))
        .groupBy(
            F.least("event_type", "dst").alias("u"),
            F.greatest("event_type", "dst").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("wgt"))
    )
    # strictly-above-median weight filter; exact interpolated median of the
    # (bounded, |V|² at most) edge-weight list
    med = weighted.agg(F.expr("percentile(wgt, 0.5)").alias("med"))
    # ≤|V|²-row edge table fans out into degree + orientation subtrees
    # (including the du/dv broadcast jobs, which run BEFORE downstream
    # caching could help) — persist so the event-table window runs once
    und = (
        weighted.join(F.broadcast(med), F.col("wgt") > F.col("med"))
        .select("u", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # materialize the cache before the degree/orientation broadcast jobs
    # fan out (q73's nodes.count() pattern); also the empty-graph early-out
    if und.count() == 0:
        return und.select(
            F.col("u").alias("event_type"), F.lit(0).cast("long").alias("n_triangles")
        )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient each edge from the (deg, name)-smaller endpoint to the larger
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # the oriented edge list feeds three plan subtrees (both wedge sides +
    # the closing join); persist the (≤|V|²-row, tiny vs the event count)
    # table so the lead-window + aggregate upstream runs once, not thrice
    oriented = (
        und.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    x = oriented.alias("x")
    y = oriented.alias("y")
    e3 = oriented.select(F.col("a").alias("b3"), F.col("b").alias("c3"))
    wedge_order = (F.col("x.db") < F.col("y.db")) | (
        (F.col("x.db") == F.col("y.db")) & (F.col("x.b") < F.col("y.b"))
    )
    tri = (
        x.join(y, (F.col("x.a") == F.col("y.a")) & wedge_order)
        .join(
            e3,
            (F.col("x.b") == F.col("b3")) & (F.col("y.b") == F.col("c3")),
        )
        .select(
            F.col("x.a").alias("ta"), F.col("x.b").alias("tb"), F.col("y.b").alias("tc")
        )
    )
    return (
        tri.select(
            F.explode(F.array("ta", "tb", "tc")).alias("event_type")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


_Q106_SQL = """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
ew AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v, count(*) AS wgt
  FROM seq WHERE dst IS NOT NULL AND dst <> src GROUP BY 1, 2
),
m AS (SELECT quantile_cont(wgt, 0.5) AS med FROM ew),
ed AS (SELECT u, v FROM ew, m WHERE wgt > med),
tri AS (
  -- naive id-ordered enumeration (a<b<c once each); the Spark side's
  -- degree ordering changes only WHERE a triangle is found, not the count
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ed e1 JOIN ed e2 ON e2.u = e1.v
  JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node AS event_type, count(*) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS node FROM tri)
GROUP BY 1
"""


GRAPH_QUERIES = {
    "q73_pagerank_transitions": q73_pagerank_transitions,
    "q106_triangle_counts": q106_triangle_counts,
}

GRAPH_ORACLES = {
    "q73_pagerank_transitions": _Q73_SQL,
    "q106_triangle_counts": _Q106_SQL,
}
