"""Unit tests for the typed-comparison layer of tools/check_contract.py.

The local harness is the only pre-driver gate for the q101 class of bug
(value-identical, type-drifted results); these tests pin its canonical
type map so a harness regression can't silently reopen the blind spot.
"""

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "check_contract",
    pathlib.Path(__file__).resolve().parent.parent / "tools" / "check_contract.py",
)
cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cc)


def test_int128_never_coerces_to_int():
    assert cc.canon_duck_type("HUGEINT") == "int128"
    assert cc.canon_duck_type("UHUGEINT") == "int128"
    assert cc.canon_spark_type("bigint") == "int"
    assert cc.canon_duck_type("HUGEINT") != cc.canon_spark_type("bigint")


def test_sanctioned_integer_width_coercions():
    for d in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UINTEGER"):
        assert cc.canon_duck_type(d) == "int"
    for s in ("tinyint", "smallint", "int", "bigint"):
        assert cc.canon_spark_type(s) == "int"


def test_float_and_timestamp_coercions():
    assert cc.canon_duck_type("FLOAT") == cc.canon_spark_type("double") == "float"
    assert cc.canon_duck_type("TIMESTAMP WITH TIME ZONE") == "ts"
    assert cc.canon_spark_type("timestamp_ntz") == "ts"


def test_structural_types():
    assert cc.canon_duck_type("VARCHAR[]") == "list<str>"
    assert cc.canon_spark_type("array<string>") == "list<str>"
    assert cc.canon_duck_type("BIGINT[]") == cc.canon_spark_type("array<bigint>")
    # a list of HUGEINTs is still a drift
    assert cc.canon_duck_type("HUGEINT[]") == "list<int128>"
    assert cc.canon_duck_type("DECIMAL(10,2)") == "decimal(10,2)"
    # decimal vs float is NOT sanctioned (stringified cells differ: 1.20 vs 1.2)
    assert cc.canon_duck_type("DECIMAL(10,2)") != cc.canon_spark_type("double")


def test_typed_gate_catches_prefix_q101_oracle():
    """Regression: DuckDB sum(INTEGER) → HUGEINT must read as drift
    against Spark's bigint (the exact r6 q101 failure)."""
    import duckdb

    rel = duckdb.sql("SELECT sum(x) AS s FROM (SELECT 1 AS x)")
    duck = {c: cc.canon_duck_type(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert duck["s"] == "int128"
    assert duck["s"] != cc.canon_spark_type("bigint")
