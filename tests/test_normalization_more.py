"""Nested-container normalization corners + default_setter resolution
(VERDICT r1 items 5 & 8; reference: validator.py:769-885, 965-1005,
871-874)."""

import pytest
from pyspark.sql import functions as F

from cerberus_spark import SparkValidator
from cerberus_spark.oracle import load_reference

cerberus = load_reference()


def _norm_rows(spark, schema, rows, ddl, **kw):
    df = spark.createDataFrame(rows, ddl)
    v = SparkValidator(schema, allow_unknown=True, **kw)
    return v.annotate(df).collect()


def test_map_fixed_key_normalization(spark):
    """Fixed-key subschema over a dynamic map: coerce declared keys,
    insert defaults for missing ones, keep undeclared entries."""
    schema = {"payload": {"type": "dict", "schema": {
        "a": {"coerce": "strip"},
        "b": {"default": "x"},
    }}}
    rows = [
        ({"a": "  hi  ", "z": "keep"},),
        ({"b": "own"},),
        ({},),
        (None,),
    ]
    got = _norm_rows(spark, schema, rows, "payload map<string,string>")
    payloads = [r["payload"] for r in got]
    assert payloads[0] == {"a": "hi", "z": "keep", "b": "x"}
    assert payloads[1] == {"b": "own"}
    assert payloads[2] == {"b": "x"}
    assert payloads[3] is None

    if cerberus is not None:
        v = cerberus.Validator(
            {"payload": {"type": "dict", "schema": {
                "a": {"coerce": str.strip}, "b": {"default": "x"}}}},
            allow_unknown=True)
        docs = [{"payload": {"a": "  hi  ", "z": "keep"}},
                {"payload": {"b": "own"}}, {"payload": {}}, {}]
        ref = [v.normalized(d).get("payload") if v.normalized(d) else None
               for d in docs]
        assert payloads[:3] == ref[:3]


def test_items_normalization_with_length_mismatch_skip(spark):
    """Per-index coercion fires only when the array length matches
    len(items) (reference: validator.py:871-874)."""
    schema = {"pair": {"type": "list", "items": [
        {"coerce": "strip"}, {"coerce": "upper"},
    ]}}
    rows = [(["  a  ", "b"],), (["x", "y", "z"],), (None,)]
    got = _norm_rows(spark, schema, rows, "pair array<string>")
    assert got[0]["pair"] == ["a", "B"]
    assert got[1]["pair"] == ["x", "y", "z"]  # length mismatch: untouched
    assert got[2]["pair"] is None
    # the mismatch still yields the ITEMS_LENGTH validation error
    codes0 = [v["code"] for v in got[0]["violations"]]
    codes1 = [v["code"] for v in got[1]["violations"]]
    assert 0x26 not in codes0 and 0x26 in codes1


def test_keysrules_key_coercion(spark):
    schema = {"tags": {"type": "dict", "keysrules": {"coerce": "lower"}}}
    rows = [({"Topic": "spark", "LANG": "en"},)]
    got = _norm_rows(spark, schema, rows, "tags map<string,string>")
    assert got[0]["tags"] == {"topic": "spark", "lang": "en"}


def test_default_setter_scope_and_order(spark):
    """A 2-arg setter sees the NORMALIZED values of its declared deps
    (reference: setters receive the partially-normalized document,
    validator.py:965-988)."""
    def total(F_, scope):
        return scope["a"] + scope["b"]
    total.depends = ("a", "b")

    schema = {
        "a": {"type": "integer", "default": 10},
        "b": {"type": "integer"},
        "t": {"type": "integer", "default_setter": total},
    }
    rows = [(None, 5, None), (1, 2, None), (1, 2, 99)]
    got = _norm_rows(spark, schema, rows, "a int, b int, t int")
    assert [r["t"] for r in got] == [15, 3, 99]  # a's default feeds the setter


def test_default_setter_cycle_detection(spark):
    """Circular setters → SETTING_DEFAULT_FAILED (0x64) per unresolved
    field (reference: validator.py:994-1005)."""
    def sa(F_, scope):
        return scope["b"]
    sa.depends = ("b",)

    def sb(F_, scope):
        return scope["a"]
    sb.depends = ("a",)

    schema = {"a": {"default_setter": sa}, "b": {"default_setter": sb}}
    rows = [(None, None), (1, None)]
    got = _norm_rows(spark, schema, rows, "a int, b int")
    codes0 = sorted(v["code"] for v in got[0]["violations"])
    assert codes0 == [0x64, 0x64]
    # non-null fields don't error; their value is kept
    codes1 = [v["code"] for v in got[1]["violations"]]
    assert codes1 == [0x64]  # only b (null) fails
    assert got[1]["a"] == 1


def test_map_value_type_change_rejected(spark):
    from cerberus_spark.dsl import SchemaError
    schema = {"payload": {"type": "dict", "schema": {"a": {"coerce": "to_int"}}}}
    df = spark.createDataFrame([({"a": "1"},)], "payload map<string,string>")
    with pytest.raises(SchemaError, match="share one type"):
        SparkValidator(schema, allow_unknown=True).annotate(df)
