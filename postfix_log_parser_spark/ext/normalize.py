"""Unicode text canonicalization (q143): NFC + zero-width strip.

Web-scale corpora arrive with the same grapheme spelled multiple ways
(precomposed U+00E9 vs 'e'+COMBINING ACUTE), plus zero-width
characters (ZWSP/ZWNJ/ZWJ/BOM) that break tokenizers and make
byte-identical dedup (q20) miss true duplicates.  The canonical first
pass is: Unicode NFC, then strip zero-width code points.  Every
downstream stage — hashing, shingling, token counting — keys off the
canonical form.

The synthetic corpus is pure ASCII, so the query injects a
deterministic decomposed prefix / combining suffix / ZWSP by doc_id
residue (same make-the-operator-bite augmentation idiom as
``dedup._augmented``) — both engines build the identical pre-canonical
text, so the oracle checks real NFC folding, not a no-op.

Scale shape (100 TB): embarrassingly parallel single scan, no shuffle.
NFC itself has no Catalyst builtin, so it is the one scoped Python
stage: an Arrow-batched pandas UDF over ``unicodedata.normalize``
(C-implemented, ~10⁶ rows/s/core); the zero-width strip and all
length/hash accounting stay JVM-side.  The md5 emitted per doc is the
canonical content key q20-style exact dedup would group on.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# injected markers (decomposed on purpose; NFC composes the first two)
_DECOMP_E = "e\u0301"   # e + COMBINING ACUTE -> U+00E9
_DECOMP_A = "A\u030A"   # A + COMBINING RING  -> U+00C5
_ZWSP = "\u200b"
_ZERO_WIDTH_RE = "[\u200b\u200c\u200d\ufeff]"


@F.pandas_udf(StringType())
def _nfc(s: pd.Series) -> pd.Series:
    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def _augment(text: Column, doc_id: Column) -> Column:
    """Deterministic pre-canonical noise: decomposed prefix (id%3==0),
    combining suffix (id%5==0), embedded ZWSP (id%7==0)."""
    t = F.when(doc_id % 3 == 0, F.concat(F.lit(_DECOMP_E + " "), text)).otherwise(
        text
    )
    t = F.when(doc_id % 5 == 0, F.concat(t, F.lit(" " + _DECOMP_A))).otherwise(t)
    return F.when(doc_id % 7 == 0, F.concat(F.lit(_ZWSP), t)).otherwise(t)


def q143_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization audit: (doc_id, n_raw, n_norm, changed,
    norm_md5) — lengths in code points before/after, the canonical
    content hash, and whether normalization altered the document."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", _augment(F.col("text"), F.col("doc_id")).alias("raw"))
    )
    norm = F.regexp_replace(_nfc(F.col("raw")), _ZERO_WIDTH_RE, "")
    return docs.select(
        "doc_id",
        F.length("raw").alias("n_raw"),
        F.length(norm).alias("n_norm"),
        (norm != F.col("raw")).alias("changed"),
        F.md5(norm.cast("binary")).alias("norm_md5"),
    )


_Q143_SQL = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN chr(8203) ELSE '' END ||
         CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769) || ' ' ELSE '' END ||
         text ||
         CASE WHEN doc_id % 5 = 0 THEN ' A' || chr(778) ELSE '' END AS raw
  FROM documents WHERE text IS NOT NULL
),
n AS (
  SELECT doc_id, raw,
         regexp_replace(nfc_normalize(raw),
                        '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]',
                        '', 'g') AS norm
  FROM aug
)
SELECT doc_id,
       length(raw) AS n_raw,
       length(norm) AS n_norm,
       norm != raw AS changed,
       md5(norm) AS norm_md5
FROM n
"""


NORMALIZE_QUERIES = {"q143_unicode_normalize": q143_unicode_normalize}
NORMALIZE_ORACLES = {"q143_unicode_normalize": _Q143_SQL}
