"""Wider rule coverage: forbidden/contains/readonly/check_with/
allow_unknown/update/registries/array-allowed/min-max dialects —
differential where the reference semantics apply, unit where the
engine's vectorized surface diverges by design."""

import pytest
from pyspark.sql import functions as F

from cerberus_spark import Registry, SparkValidator, rules_set_registry, schema_registry
from cerberus_spark.oracle import compare_per_row, load_reference, row_to_doc

cerberus = load_reference()


def _run(spark, df, schema, **kw):
    v = SparkValidator(schema, **kw)
    rows = v.annotate(df).collect()
    docs = [
        row_to_doc({k: r.asDict(recursive=True)[k] for k in df.columns}, schema)
        for r in rows
    ]
    return rows, docs


def _assert_parity(spark, rows, docs, schema, **kw):
    mismatches = compare_per_row(rows, docs, schema, **kw)
    assert mismatches == [], mismatches


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_forbidden_scalar_and_list(spark):
    schema = {
        "name": {"type": "string", "forbidden": ["root", "admin"]},
        "tags": {"type": "list", "forbidden": ["x", "y"]},
    }
    rows = [("root", ["a", "x"]), ("alice", ["b"]), ("admin", ["x", "y", "x"]), (None, None)]
    df = spark.createDataFrame(rows, "name string, tags array<string>")
    a, d = _run(spark, df, schema)
    _assert_parity(spark, a, d, schema)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_contains(spark):
    schema = {"opts": {"type": "list", "contains": ["a", "b"]}}
    rows = [(["a", "b", "c"],), (["a"],), (["z"],), (None,)]
    df = spark.createDataFrame(rows, "opts array<string>")
    a, d = _run(spark, df, schema)
    _assert_parity(spark, a, d, schema)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_allowed_on_arrays(spark):
    schema = {"roles": {"type": "list", "allowed": ["r", "w", "x"]}}
    rows = [(["r", "w"],), (["r", "q", "p"],), ([],), (None,)]
    df = spark.createDataFrame(rows, "roles array<string>")
    a, d = _run(spark, df, schema)
    _assert_parity(spark, a, d, schema)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_readonly(spark):
    schema = {"locked": {"type": "string", "readonly": True},
              "free": {"type": "string"}}
    rows = [("set", "ok"), (None, "ok")]
    df = spark.createDataFrame(rows, "locked string, free string")
    a, d = _run(spark, df, schema)
    _assert_parity(spark, a, d, schema, normalize=False)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_minmax_on_strings_and_ts(spark):
    import datetime as dt

    schema = {
        "code": {"type": "string", "min": "b", "max": "m"},
        "ts": {"type": "datetime", "min": dt.datetime(2024, 1, 1)},
    }
    rows = [("a", dt.datetime(2023, 1, 1)), ("z", dt.datetime(2024, 6, 1)), ("f", None)]
    df = spark.createDataFrame(rows, "code string, ts timestamp")
    a, d = _run(spark, df, schema)
    _assert_parity(spark, a, d, schema)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_unknown_fields(spark):
    schema = {"known": {"type": "integer"}}
    rows = [(1, "stray"), (2, None)]
    df = spark.createDataFrame(rows, "known int, extra string")
    a, d = _run(spark, df, schema, allow_unknown=False)
    _assert_parity(spark, a, d, schema, allow_unknown=False)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_allow_unknown_rules_set(spark):
    schema = {"known": {"type": "integer"}}
    bulk = {"type": "string", "maxlength": 3}
    rows = [(1, "okay-too-long"), (2, "ok"), (3, None)]
    df = spark.createDataFrame(rows, "known int, extra string")
    a, d = _run(spark, df, schema, allow_unknown=bulk)
    _assert_parity(spark, a, d, schema, allow_unknown=bulk)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_update_mode_skips_required(spark):
    schema = {"a": {"type": "integer", "required": True},
              "b": {"type": "string", "required": True}}
    rows = [(None, "x"), (1, None)]
    df = spark.createDataFrame(rows, "a int, b string")
    v = SparkValidator(schema, update=True)
    assert v.validate(df).violations.count() == 0


def test_check_with_column_checker(spark):
    def is_even(col, dtype):
        return col % 2 == 0

    schema = {"n": {"type": "integer", "check_with": "is_even"}}
    v = SparkValidator(schema, check_with={"is_even": is_even})
    df = spark.createDataFrame([(2,), (3,), (None,)], "n int")
    viol = v.validate(df).violations.collect()
    assert len(viol) == 1
    assert viol[0].code == 0x00 and viol[0].rule == "check_with"
    assert viol[0].value == "3"


def test_registries(spark):
    schema_registry.add("sub", {"x": {"type": "integer", "min": 0}})
    rules_set_registry.add("posint", {"type": "integer", "min": 0})
    try:
        v = SparkValidator({"a": "posint", "nested": {"type": "dict", "schema": "sub"}})
        df = spark.createDataFrame(
            [(-1, (5,)), (2, (-3,))], "a int, nested struct<x:int>"
        )
        got = sorted(
            (tuple(r.document_path), r.rule) for r in v.validate(df).violations.collect()
        )
        assert got == [(("a",), "min"), (("nested", "x"), "min")]
    finally:
        schema_registry.remove("sub")
        rules_set_registry.remove("posint")


def test_error_tree_formatting(spark):
    from cerberus_spark.errors import error_tree, format_message

    v = SparkValidator({"role": {"type": "string", "allowed": ["a", "b"]},
                        "n": {"type": "integer", "min": 0}})
    df = spark.createDataFrame([("z", -1)], "role string, n int")
    rows = [r.asDict() for r in v.validate(df).violations.collect()]
    tree = error_tree(rows)
    assert "unallowed value z" in tree["role"]
    assert "min value is 0" in tree["n"]
    assert format_message(0x02) == "required field"


def test_oneof_shortcut_expansion(spark):
    # anyof_regex shortcut (reference: schema.py:135-156)
    v = SparkValidator({"s": {"type": "string", "anyof_regex": ["a+", "b+"]}})
    df = spark.createDataFrame([("aaa",), ("bb",), ("cc",)], "s string")
    viol = v.validate(df).violations.collect()
    assert len(viol) == 1 and viol[0].rule == "anyof"


def test_purge_unknown(spark):
    v = SparkValidator({"keep": {"type": "integer"}}, purge_unknown=True)
    df = spark.createDataFrame([(1, "drop-me")], "keep int, junk string")
    out = v.normalized(df)
    assert out.columns == ["keep"]


def test_rename(spark):
    v = SparkValidator({"new_name": {"type": "integer", "min": 0},
                        "old_name": {"rename": "new_name"}})
    df = spark.createDataFrame([(-5,)], "old_name int")
    out = v.validate(df)
    assert out.annotated.columns[0] == "new_name"
    viol = out.violations.collect()
    assert [tuple(r.document_path) for r in viol] == [("new_name",)]


def test_default_setter(spark):
    v = SparkValidator(
        {"total": {"type": "integer", "default_setter": "sum_ab"},
         "a": {"type": "integer"}, "b": {"type": "integer"}},
        setters={"sum_ab": lambda F_: F_.col("a") + F_.col("b")},
    )
    df = spark.createDataFrame([(None, 2, 3), (10, 1, 1)], "total int, a int, b int")
    got = [r.total for r in v.normalized(df).collect()]
    assert got == [5, 10]


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_nested_normalization_default(spark):
    """FIXTURES.md §4: default inside a nested dict schema."""
    schema = {
        "meta": {"type": "dict", "schema": {
            "lang": {"type": "string", "allowed": ["en", "de", "fr"], "default": "en"},
            "score": {"type": "float", "coerce": "to_float"},
        }},
    }
    rows = [((None, "3.5"),), (("de", None),), (None,)]
    df = spark.createDataFrame(rows, "meta struct<lang:string, score:string>")
    v = SparkValidator(schema)
    got = [r.asDict(recursive=True) for r in v.normalized(df).collect()]
    assert got[0]["meta"] == {"lang": "en", "score": 3.5}
    assert got[1]["meta"] == {"lang": "de", "score": None}
    assert got[2]["meta"] is None

    # differential: reference normalized() agrees on the nested defaults
    ref_schema = {
        "meta": {"type": "dict", "schema": {
            "lang": {"type": "string", "allowed": ["en", "de", "fr"], "default": "en"},
            "score": {"type": "float", "coerce": float},
        }},
    }
    from cerberus_spark.oracle import reference_validate
    docs = [{"meta": {"score": "3.5"}}, {"meta": {"lang": "de"}}, {}]
    _, ref_norm = reference_validate(docs, ref_schema)
    assert ref_norm[0]["meta"] == {"lang": "en", "score": 3.5}
    assert ref_norm[1]["meta"] == {"lang": "de"}  # reference leaves score absent


def test_rename_handler_and_purge_readonly(spark):
    v = SparkValidator(
        {"keep": {"type": "integer"}, "secret": {"type": "string", "readonly": True}},
        purge_readonly=True,
        rename_handler=lambda n: n.upper(),
        allow_unknown=True,
    )
    df = spark.createDataFrame([(1, "x", "s")], "keep int, stray string, secret string")
    out = v.normalized(df)
    assert sorted(out.columns) == ["STRAY", "keep"]


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_dependencies_sequence_and_dotpath(spark):
    schema = {
        "b": {"type": "integer", "dependencies": ["a"]},
        "c": {"type": "integer", "dependencies": ["nested.x", "a"]},
        "a": {"type": "integer"},
        "nested": {"type": "dict", "schema": {"x": {"type": "integer"}}},
    }
    rows = [
        (1, 2, 3, (7,)),
        (None, 2, 3, (7,)),      # b,c dep on a -> missing
        (1, 2, 3, None),         # c dep on nested.x -> missing
        (1, None, None, (None,)),
    ]
    df = spark.createDataFrame(rows, "a int, b int, c int, nested struct<x:int>")
    a, d = _run(spark, df, schema)
    _assert_parity(spark, a, d, schema)


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_require_all(spark):
    schema = {"a": {"type": "integer"}, "b": {"type": "string"}}
    rows = [(1, "x"), (None, "y"), (2, None)]
    df = spark.createDataFrame(rows, "a int, b string")
    a, d = _run(spark, df, schema, require_all=True)
    _assert_parity(spark, a, d, schema, require_all=True)


def test_map_valuesrules_coercion(spark):
    v = SparkValidator(
        {"tags": {"type": "dict",
                  "valuesrules": {"type": "string", "coerce": "strip"}}}
    )
    df = spark.createDataFrame(
        [({"a": "  x  ", "b": "y"},)], "tags map<string,string>"
    )
    got = v.normalized(df).first().tags
    assert got == {"a": "x", "b": "y"}


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_error_tree_matches_reference_handler(spark):
    """error_tree() output vs the reference BasicErrorHandler dict for
    message-bearing leaf errors."""
    schema = {
        "role": {"type": "string", "allowed": ["a", "b"]},
        "n": {"type": "integer", "min": 0, "max": 10},
        "s": {"type": "string", "minlength": 2},
    }
    row = {"role": "z", "n": -1, "s": "x"}
    df = spark.createDataFrame([tuple(row.values())], "role string, n int, s string")
    from cerberus_spark.errors import error_tree

    v_rows = [r.asDict() for r in
              SparkValidator(schema).validate(df).violations.collect()]
    got = error_tree(v_rows)

    ref = cerberus.Validator(schema, allow_unknown=True)
    ref.validate(dict(row))
    expected = ref.errors
    assert set(got) == set(expected)
    for field in expected:
        assert got[field] == expected[field], (field, got[field], expected[field])


def test_array_element_coercion(spark):
    v = SparkValidator(
        {"xs": {"type": "list", "schema": {"type": "string", "coerce": "strip"}}}
    )
    df = spark.createDataFrame([([" a ", "b "],)], "xs array<string>")
    assert v.normalized(df).first().xs == ["a", "b"]


@pytest.mark.skipif(cerberus is None, reason="reference not importable")
def test_decimal_constants_numeric_equality(spark):
    """decimal.Decimal constants compare under the reference's Python
    equality (Decimal('1') == 1 == 1.0) — allowed/forbidden with
    Decimal constants must not drop them as never-equal on numeric or
    boolean columns (r3 ADVICE item 4)."""
    from decimal import Decimal

    schema = {
        "n": {"allowed": [Decimal("1"), Decimal("2.5")]},
        "m": {"forbidden": [Decimal("3")]},
        "b": {"allowed": [Decimal(1)]},
    }
    rows = [(1, 3, True), (2, 4, False), (None, None, None)]
    df = spark.createDataFrame(rows, "n int, m int, b boolean")
    a, d = _run(spark, df, schema)
    _assert_parity(spark, a, d, schema)
    # row 0: n=1 allowed (Decimal('1')==1), m=3 forbidden, b=True allowed
    codes0 = sorted(v["code"] for v in a[0]["violations"])
    assert codes0 == [0x46]  # only the forbidden hit
    # row 1: n=2 not in allowed, m=4 fine, b=False not allowed
    codes1 = sorted(v["code"] for v in a[1]["violations"])
    assert codes1 == [0x44, 0x44]

    # float column matches the fractional Decimal
    schema_f = {"x": {"allowed": [Decimal("2.5")]}}
    dff = spark.createDataFrame([(2.5,), (2.4,)], "x double")
    af, df_docs = _run(spark, dff, schema_f)
    _assert_parity(spark, af, df_docs, schema_f)
    assert af[0]["violations"] == [] and len(af[1]["violations"]) == 1
