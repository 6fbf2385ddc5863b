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


def q110_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 score for a 5-term query.

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
    # distributed top-k: sort+limit plans as TakeOrderedAndProject
    # (per-partition heap + driver merge of k rows) — never the global
    # single-partition sort an unpartitioned row_number window would force
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(TOP_K)
    rnk = F.row_number().over(
        Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    )  # window runs on the k surviving rows only
    return top.withColumn("rnk", rnk).select("rnk", "doc_id", "bm25")


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_Q110_SQL = f"""
WITH d AS (
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
)
SELECT rnk, doc_id, bm25 FROM (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""

RETRIEVAL_QUERIES = {"q110_bm25_topk": q110_bm25_topk}
RETRIEVAL_ORACLES = {"q110_bm25_topk": _Q110_SQL}
