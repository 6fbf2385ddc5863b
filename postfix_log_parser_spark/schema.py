"""Schemas for the engine.

``EVENTS_SCHEMA`` mirrors the reference's output contract — the ClickHouse
DDL at ``lognormalizer/parse.py:27-54`` and the ``PostfixEvent`` annotations
at ``lognormalizer/parse.py:104-127`` — column-for-column (22 columns).
Numeric-looking fields (delay, size, nrcpt, ...) are deliberately kept as
strings, matching the reference.

``PARSED_SCHEMA`` is the intermediate per-line record emitted by the parse
stage: dynamic-schema ``k=v`` payload survives in a map column
(``lognormalizer/parse.py:286-303``) so unknown keys reach the sessionizer,
exactly like the reference's dict-based state.
"""

from __future__ import annotations

from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("queue_id", T.StringType(), False),
        T.StructField("domain_from", T.StringType(), False),
        T.StructField("domains_to", T.ArrayType(T.StringType()), False),
        T.StructField("message_from", T.StringType(), False),
        T.StructField("message_to", T.ArrayType(T.StringType()), False),
        T.StructField("message_id", T.StringType(), False),
        T.StructField("message_subject", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        # Nullable here: the reference leaves the attribute unset when no
        # "ddd d.d.d" pair exists (quirk Q5); the sink then faults.  We emit
        # NULL and let the sink projection route those rows to faults.
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("status_postfix_code", T.StringType(), True),
        T.StructField("status_description", T.StringType(), False),
        T.StructField("client", T.StringType(), True),
        T.StructField("orig_to", T.StringType(), True),
        T.StructField("dovecot_fileinto_action", T.StringType(), True),
        T.StructField("delay", T.StringType(), True),
        T.StructField("delays", T.StringType(), True),
        T.StructField("dsn", T.StringType(), True),
        T.StructField("nrcpt", T.StringType(), True),
        T.StructField("relay", T.StringType(), True),
        T.StructField("size", T.StringType(), True),
        T.StructField("raw_log", T.ArrayType(T.StringType()), False),
    ]
)

# Per-line parse output (stage 1).  `kind` is one of:
#   field    — ordinary admitted line; fields/to_list/status_description_set
#   removed  — session completion marker (lognormalizer/parse.py:351)
#   subject  — warning: header Subject: line (lognormalizer/parse.py:319-335)
#   dovecot  — sieve fileinto correlation line (lognormalizer/parse.py:362-378)
#   dropped  — failed an admission gate F1-F3; kept only for accounting
#   fault    — line that would raise in the reference (quirk Q12)
PARSED_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("line", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("queue_id", T.StringType(), True),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("to_list", T.ArrayType(T.StringType()), True),
        T.StructField("status_description", T.StringType(), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("dovecot_msgid", T.StringType(), True),
        T.StructField("dovecot_action", T.StringType(), True),
        T.StructField("fault_reason", T.StringType(), True),
    ]
)

FAULTS_SCHEMA = T.StructType(
    [
        T.StructField("line", T.StringType(), True),
        T.StructField("fault_reason", T.StringType(), False),
        T.StructField("queue_id", T.StringType(), True),
    ]
)

EVENT_COLUMNS = [f.name for f in EVENTS_SCHEMA.fields]
