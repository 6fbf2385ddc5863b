"""Python UDTF extension point — user-defined table functions.

The engine's sanctioned Python extensibility tiers are (fastest first):
built-in Catalyst expressions, pandas UDFs / applyInPandas, and — for
logic that is ROW-EXPANDING with per-row fan-out unknown to the planner
— Spark 4's Python user-defined table functions.  A UDTF is the
lateral-join shape: each input row yields zero or more output rows with
a declared schema, Arrow-batched (``useArrow=True``) so the Python
boundary ships columnar batches, not pickled rows.

q103 demonstrates the API with a window segmenter (non-overlapping
32-token windows — q84's chunker is the pure-Catalyst overlapping twin;
the UDTF variant is where a user would drop in logic Catalyst cannot
express, e.g. a real sentence segmenter or layout-aware splitter).
Scale notes: a UDTF is a narrow map — no shuffle, parallel over input
partitions; the cost is the Arrow boundary, so the engine keeps it out
of hot paths unless the logic genuinely needs Python.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from postfix_log_parser_spark.analytics import load

WIN = 32


@udtf(returnType="win_idx: int, n_tok: int, win_hash: string", useArrow=True)
class _WindowSegments:
    """Yield non-overlapping WIN-token windows of a whitespace-tokenized
    text: (window index, token count, md5 of the window's tokens)."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        if text is None:
            return
        toks = text.split()
        for i in range(0, max(len(toks), 0), WIN):
            win = toks[i : i + WIN]
            if not win:
                continue
            digest = hashlib.md5(" ".join(win).encode("utf-8")).hexdigest()
            yield i // WIN, len(win), digest


def q103_udtf_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → lateral Python UDTF window segmentation.

    Output: one row per window (doc_id, win_idx, n_tok, win_hash).
    """
    spark.udtf.register("plps_window_segments", _WindowSegments)
    load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.length(F.trim("text")) > 0
    ).createOrReplaceTempView("plps_docs_for_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.win_idx, s.n_tok, s.win_hash "
        "FROM plps_docs_for_udtf d, LATERAL plps_window_segments(d.text) s"
    )


_Q103_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) > 0
),
wins AS (
  SELECT doc_id,
         unnest(generate_series(0,
           CAST(ceil(n / {WIN}.0) AS BIGINT) - 1)) AS win_idx,
         toks, n
  FROM sized
)
SELECT doc_id, win_idx,
       len(list_slice(toks, win_idx * {WIN} + 1,
                      least((win_idx + 1) * {WIN}, n))) AS n_tok,
       md5(array_to_string(list_slice(toks, win_idx * {WIN} + 1,
                      least((win_idx + 1) * {WIN}, n)), ' ')) AS win_hash
FROM wins
"""


UDTF_QUERIES = {
    "q103_udtf_segments": q103_udtf_segments,
}

UDTF_ORACLES = {
    "q103_udtf_segments": _Q103_SQL,
}
