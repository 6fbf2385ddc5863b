"""Lexical retrieval over the documents corpus — Okapi BM25 top-k.

The missing third leg next to embedding ANN (ext/similarity.py) and
set-similarity dedup (ext/dedup.py): keyword search with the ranking
function production retrieval stacks still run (Robertson & Walker's
Okapi BM25; the +1 idf variant Lucene uses, which keeps idf positive for
terms in more than half the corpus — exactly the regime of this
synthetic vocabulary).

Scale shape (the inverted-index join, relationally):

* One explode→(doc, term) count with map-side combine builds the posting
  lists restricted to the query terms — the ``isin`` filter lands BEFORE
  the aggregate, so the shuffle carries only query-term postings (|Q| ≪
  vocab), not the full index.
* Corpus stats (N, avgdl) are one tiny aggregate broadcast back; per-term
  document frequencies are a |Q|-row broadcast.  Nothing driver-side.
* Final top-k is a single global window over the scored postings — at
  100 TB swap for a per-partition top-k + merge (``RDD.takeOrdered``
  shape) or keep k in a bounded ``limit`` after the sort, which AQE
  already executes as a TakeOrderedAndProject.

Reference: the reference engine has no retrieval surface; this extends
SURVEY.md §2's extension set.  Okapi BM25 constants k1=1.2, b=0.75 (the
standard defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from postfix_log_parser_spark.ext.dedup import _DUCK_WORDS, words_of

K1 = 1.2
B = 0.75
QUERY_TERMS = ["spark", "hash", "window", "stream", "vector"]
TOP_K = 20


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥1 query term.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Lucene's BM25+1 form)
    tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score = Σ_terms idf * tf_part, rounded to 4 for cross-engine rank
    stability (q32's established pattern); ties break on doc_id.
    """
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", words_of(F.col("text")).alias("words"))
        .select("doc_id", "words", F.size("words").alias("dl"))
    )
    # corpus stats: one 1-row aggregate, broadcast into the scorer
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    # persist: postings feeds BOTH the scorer and dfreq — without the pin
    # each consumer re-runs the full tokenize scan.  The cached relation
    # is |docs matching a query term| x |Q| rows (tf/dl/term only, no
    # text), the small end of the pipeline even at 100 TB.
    postings = (
        docs.select("doc_id", "dl", F.explode("words").alias("term"))
        .filter(F.col("term").isin(QUERY_TERMS))  # prune BEFORE the agg
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )  # |Q| rows
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
            F.col("tf")
            * (K1 + 1)
            / (
                F.col("tf")
                + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("idf") * F.col("tf_part")), 4).alias("bm25"))
    )
    return scored


def _ranked_topk(df: DataFrame, score_col: str, k: int) -> DataFrame:
    """Distributed top-k with dense 1..k ranks: sort+limit plans as
    TakeOrderedAndProject (per-partition heap + driver merge of k rows) —
    never the global single-partition sort an unpartitioned row_number
    window would force; the rank window then runs on the k survivors
    only."""
    top = df.orderBy(F.col(score_col).desc(), F.col("doc_id")).limit(k)
    rnk = F.row_number().over(
        Window.orderBy(F.col(score_col).desc(), F.col("doc_id"))
    )
    return top.withColumn("rnk", rnk)


def q110_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 score for a 5-term query (see
    ``_bm25_scored`` for the ranking function and scale shape)."""
    scored = _bm25_scored(spark, sf_dir)
    return _ranked_topk(scored, "bm25", TOP_K).select("rnk", "doc_id", "bm25")


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# the BM25 scoring CTE chain, shared by the q110 and q115 oracles
_BM25_CTES = f"""d AS (
  SELECT doc_id, {_DUCK_WORDS} AS words
  FROM documents WHERE text IS NOT NULL
),
docs AS (SELECT doc_id, words, len(words) AS dl FROM d),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM docs
),
postings AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(words) AS term FROM docs)
  WHERE term IN ({_TERMS_SQL})
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.doc_id,
         round(sum(
           ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * p.tf * ({K1} + 1)
           / (p.tf + {K1} * (1 - {B} + {B} * p.dl
                             / (s.sum_dl / CAST(s.n_docs AS DOUBLE))))
         ), 4) AS bm25
  FROM postings p JOIN dfreq f USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)"""

_Q110_SQL = f"""
WITH {_BM25_CTES}
SELECT rnk, doc_id, bm25 FROM (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# q115 — hybrid retrieval: BM25 ∪ ANN fused by reciprocal-rank fusion
# ---------------------------------------------------------------------------

ARM_K = 50  # depth of each retriever arm
RRF_C = 60  # the standard RRF constant (Cormack et al., SIGIR 2009)
HYBRID_K = 10
PROBE_ID = 0  # the semantic probe vector (doc 0's embedding)


def q115_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the production RAG retrieval shape: a lexical arm
    (q110's BM25 posting join) and a semantic arm (exact cosine against
    one probe embedding — swap in q26's LSH buckets at scale) each
    produce a top-50, then reciprocal-rank fusion
    ``score = Σ_arms 1/(60 + rank)`` merges them (Cormack, Clarke &
    Büttcher, SIGIR 2009 — rank-based, so the arms' incomparable score
    scales never need calibration).

    Scale shape: each arm is already distributed (posting join /
    broadcast probe + TakeOrdered); fusion itself touches only 2·K
    ranked rows — a full-outer join on doc_id over two k-row frames.
    RRF scores are exact: integer ranks through one fixed-order double
    expression, bit-identical cross-engine."""
    from postfix_log_parser_spark.ext.similarity import _dot, _emb, _with_norm

    lex = (
        _ranked_topk(_bm25_scored(spark, sf_dir), "bm25", ARM_K)
        .select("doc_id", F.col("rnk").alias("lex_rank"))
    )
    emb = _with_norm(_emb(spark, sf_dir))
    probe = emb.filter(F.col("vec_id") == PROBE_ID).select(
        F.col("v").alias("pv"), F.col("nrm").alias("pn")
    )
    sem_scored = (
        emb.filter(F.col("vec_id") != PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                _dot(F.col("pv"), F.col("v")) / (F.col("pn") * F.col("nrm")), 4
            ).alias("cos"),
        )
    )
    sem = _ranked_topk(sem_scored, "cos", ARM_K).select(
        "doc_id", F.col("rnk").alias("sem_rank")
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (RRF_C + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_C + F.col("sem_rank")), F.lit(0.0)),
        )
    )
    top = fused.orderBy(F.col("rrf").desc(), F.col("doc_id")).limit(HYBRID_K)
    rnk = F.row_number().over(Window.orderBy(F.col("rrf").desc(), F.col("doc_id")))
    return top.withColumn("rnk", rnk).select(
        "rnk", "doc_id", F.round("rrf", 6).alias("rrf"), "lex_rank", "sem_rank"
    )


_Q115_SQL = f"""
WITH {_BM25_CTES},
lex AS (
  SELECT doc_id, rnk AS lex_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
    FROM scored
  ) WHERE rnk <= {ARM_K}
),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
n AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS nrm
  FROM e
),
probe AS (SELECT v AS pv, nrm AS pn FROM n WHERE vec_id = {PROBE_ID}),
sem_scored AS (
  SELECT n.vec_id AS doc_id,
         round(list_sum(list_transform(range(1, len(p.pv) + 1),
                                       i -> p.pv[i] * n.v[i]))
               / (p.pn * n.nrm), 4) AS cos
  FROM n CROSS JOIN probe p WHERE n.vec_id <> {PROBE_ID}
),
sem AS (
  SELECT doc_id, rnk AS sem_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rnk
    FROM sem_scored
  ) WHERE rnk <= {ARM_K}
),
fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         lex.lex_rank, sem.sem_rank,
         coalesce(1.0 / ({RRF_C} + lex.lex_rank), 0.0)
           + coalesce(1.0 / ({RRF_C} + sem.sem_rank), 0.0) AS rrf
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT rnk, doc_id, round(rrf, 6) AS rrf, lex_rank, sem_rank FROM (
  SELECT doc_id, rrf, lex_rank, sem_rank,
         row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk
  FROM fused
) WHERE rnk <= {HYBRID_K}
"""

RETRIEVAL_QUERIES = {
    "q110_bm25_topk": q110_bm25_topk,
    "q115_hybrid_rrf": q115_hybrid_rrf,
}
RETRIEVAL_ORACLES = {
    "q110_bm25_topk": _Q110_SQL,
    "q115_hybrid_rrf": _Q115_SQL,
}
