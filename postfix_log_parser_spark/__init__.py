"""postfix_log_parser_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference postfix log
sessionizer (``/root/reference/lognormalizer/parse.py``), re-expressed
Spark-first.

Pipeline (batch):

    raw text lines ──parse_lines()──► parsed-line DataFrame (typed, tagged)
        ──sessionize()──► (events DataFrame, faults DataFrame, state DataFrame)
        ──analytics / sinks──► SQL over the 22-column ``events`` schema

plus a streaming variant (Structured Streaming + applyInPandasWithState)
and a 100-TB-scale extension layer (dedup / similarity / text analysis /
multimodal) under ``ext/``.
"""

from postfix_log_parser_spark.session import get_spark
from postfix_log_parser_spark.operators.parse import (
    dovecot_dim_from_raw,
    parse_lines,
    parse_lines_arrow,
)
from postfix_log_parser_spark.operators.sessionize import sessionize
from postfix_log_parser_spark.sources.text import lines_df, read_text

__all__ = [
    "get_spark",
    "parse_lines",
    "parse_lines_arrow",
    "dovecot_dim_from_raw",
    "sessionize",
    "read_text",
    "lines_df",
]
