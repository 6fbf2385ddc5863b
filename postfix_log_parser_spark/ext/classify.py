"""Count-based text classification trained as pure aggregation (q122).

Multinomial Naive Bayes is the one classical text classifier whose
TRAINING is exactly a pair of hash aggregations — per-class token
totals and per-(class, word) counts — which makes it a natural fit for
a declarative engine: the "model" is just two small DataFrames, and
scoring is a word-keyed join plus a per-document aggregate.  Training
corpora use exactly this shape for fast source/domain/language tagging
before the expensive model-based filters.

Task here: predict a held-out document's ``source`` from its words
(train = even doc_ids, test = odd), report the confusion matrix.

Numerics contract — the argmax must be bit-identical across engines, so
no floating-point accumulates across rows: every log-probability is
quantized ONCE to an integer microlog ``round(1e6 * ln(p))`` (BIGINT),
and per-document scores are integer sums of those constants.  Integer
addition is order-independent, so partitioning, shuffle order, and
aggregation order cannot flip a prediction.  (Same trick as q112's
integer-sqrt weights; a raw ``sum(double)`` score would be
nondeterministic in the last ulps and could flip near-ties.)

Unseen-word handling: Laplace add-one smoothing over the TRAIN vocab V;
a test word absent from class c's counts contributes
``default_c = round(1e6 * ln(1 / (tokens_c + V)))``.  Scoring therefore
needs only the (word, class) entries that EXIST plus a per-class count
of how many word instances were covered:

    score(d, c) = prior_c + sum_covered q(w, c)
                + (n_words_d - n_covered(d, c)) * default_c

Scale shape: training is two hash aggs over exploded train tokens; the
model is |V×C| rows — joined to the exploded test stream keyed on the
word (broadcast when it fits, shuffle otherwise; Catalyst/AQE decides).
The per-(doc, class) aggregate and the argmax window are both keyed on
doc_id — bounded state, one exchange.  The |C|-row class-constant
frame is broadcast.  Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postfix_log_parser_spark.ext.dedup import _DUCK_WORDS, words_of


def _microlog(col) -> F.Column:
    """round(1e6 * ln(x)) as BIGINT — the shared quantization."""
    return F.round(F.lit(1000000.0) * F.log(col)).cast("long")


def q122_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", words_of(F.col("text")).alias("words"))
        .filter(F.size("words") > 0)
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)

    tr_words = train.select("source", F.explode("words").alias("w"))
    vocab_n = tr_words.agg(F.count_distinct("w").alias("v"))
    cls = (
        train.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("words")).alias("n_tokens"),
        )
        .join(F.broadcast(train.agg(F.count(F.lit(1)).alias("n_total"))), how="cross")
        .join(F.broadcast(vocab_n), how="cross")
    )
    # per-class integer constants: prior and unseen-word penalty
    cls_consts = cls.select(
        F.col("source").alias("c"),
        _microlog(F.col("n_docs") / F.col("n_total")).alias("prior_q"),
        _microlog(F.lit(1.0) / (F.col("n_tokens") + F.col("v"))).alias("default_q"),
    )
    # model: quantized log P(w|c) for every SEEN (word, class)
    model = (
        tr_words.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(cls.select("source", "n_tokens", "v")), "source")
        .select(
            F.col("w"),
            F.col("source").alias("c"),
            _microlog((F.col("cnt") + 1) / (F.col("n_tokens") + F.col("v"))).alias("q"),
        )
    )

    te = test.select(
        "doc_id",
        F.col("source").alias("true_source"),
        F.size("words").alias("n_words"),
        "words",
    )
    tw = te.select("doc_id", F.explode("words").alias("w"))
    covered = (
        tw.join(model, "w")
        .groupBy("doc_id", "c")
        .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n_cov"))
    )
    scored = (
        te.select("doc_id", "true_source", "n_words")
        .join(F.broadcast(cls_consts), how="cross")
        .join(covered, ["doc_id", "c"], "left")
        .select(
            "doc_id",
            "true_source",
            "c",
            (
                F.col("prior_q")
                + F.coalesce(F.col("sq"), F.lit(0))
                + (F.col("n_words") - F.coalesce(F.col("n_cov"), F.lit(0)))
                * F.col("default_q")
            ).alias("score"),
        )
    )
    by_doc = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("c"))
    return (
        scored.withColumn("rk", F.row_number().over(by_doc))
        .filter(F.col("rk") == 1)
        .groupBy("true_source", F.col("c").alias("predicted_source"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_Q122_SQL = f"""
WITH docs AS (
  SELECT doc_id, source, {_DUCK_WORDS} AS words
  FROM documents WHERE text IS NOT NULL
),
nonempty AS (SELECT * FROM docs WHERE len(words) > 0),
train AS (SELECT * FROM nonempty WHERE doc_id % 2 = 0),
test AS (SELECT * FROM nonempty WHERE doc_id % 2 = 1),
tr_words AS (SELECT source, unnest(words) AS w FROM train),
vocab AS (SELECT count(DISTINCT w) AS v FROM tr_words),
cls AS (
  SELECT source, count(*) AS n_docs, CAST(sum(len(words)) AS BIGINT) AS n_tokens,
         (SELECT count(*) FROM train) AS n_total, (SELECT v FROM vocab) AS v
  FROM train GROUP BY source
),
cls_consts AS (
  SELECT source AS c,
         CAST(round(1000000.0 * ln(n_docs::DOUBLE / n_total)) AS BIGINT) AS prior_q,
         CAST(round(1000000.0 * ln(1.0 / (n_tokens + v))) AS BIGINT) AS default_q
  FROM cls
),
model AS (
  SELECT t.w, t.source AS c,
         CAST(round(1000000.0 * ln((t.cnt + 1)::DOUBLE / (cls.n_tokens + cls.v)))
           AS BIGINT) AS q
  FROM (SELECT source, w, count(*) AS cnt FROM tr_words GROUP BY source, w) t
  JOIN cls USING (source)
),
te AS (
  SELECT doc_id, source AS true_source, len(words) AS n_words, words FROM test
),
tw AS (SELECT doc_id, unnest(words) AS w FROM te),
covered AS (
  SELECT tw.doc_id, m.c, CAST(sum(m.q) AS BIGINT) AS sq, count(*) AS n_cov
  FROM tw JOIN model m USING (w)
  GROUP BY tw.doc_id, m.c
),
scored AS (
  SELECT te.doc_id, te.true_source, k.c,
         k.prior_q + coalesce(cv.sq, 0)
           + (te.n_words - coalesce(cv.n_cov, 0)) * k.default_q AS score
  FROM te CROSS JOIN cls_consts k
  LEFT JOIN covered cv ON cv.doc_id = te.doc_id AND cv.c = k.c
),
pred AS (
  SELECT true_source, c AS predicted_source,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rk
  FROM scored
)
SELECT true_source, predicted_source, count(*) AS n_docs
FROM pred WHERE rk = 1
GROUP BY true_source, predicted_source
"""

CLASSIFY_QUERIES = {
    "q122_nb_source_classifier": q122_nb_source_classifier,
}
CLASSIFY_ORACLES = {
    "q122_nb_source_classifier": _Q122_SQL,
}
