from postfix_log_parser_spark.functions.columns import (
    angle_trim,
    char_lstrip,
    char_rstrip,
    domain_of,
    ordered_distinct,
    status_code_pair,
)

__all__ = [
    "angle_trim",
    "char_lstrip",
    "char_rstrip",
    "domain_of",
    "ordered_distinct",
    "status_code_pair",
]
