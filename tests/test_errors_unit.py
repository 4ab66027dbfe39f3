"""Error-contract unit tests — pure Python, verifies verbatim parity of
codes and message strings against the reference package."""

import sys

import pytest

from cerberus_spark import errors as E

sys.path.insert(0, "/root/reference")
try:
    from cerberus import errors as ref_errors
except Exception:  # pragma: no cover
    ref_errors = None

pytestmark = pytest.mark.skipif(ref_errors is None, reason="reference not importable")


REF_DEFS = [
    "CUSTOM", "REQUIRED_FIELD", "UNKNOWN_FIELD", "DEPENDENCIES_FIELD",
    "DEPENDENCIES_FIELD_VALUE", "EXCLUDES_FIELD", "EMPTY_NOT_ALLOWED",
    "NOT_NULLABLE", "BAD_TYPE", "BAD_TYPE_FOR_SCHEMA", "ITEMS_LENGTH",
    "MIN_LENGTH", "MAX_LENGTH", "REGEX_MISMATCH", "MIN_VALUE", "MAX_VALUE",
    "UNALLOWED_VALUE", "UNALLOWED_VALUES", "FORBIDDEN_VALUE",
    "FORBIDDEN_VALUES", "MISSING_MEMBERS", "NORMALIZATION", "COERCION_FAILED",
    "RENAMING_FAILED", "READONLY_FIELD", "SETTING_DEFAULT_FAILED",
    "ERROR_GROUP", "MAPPING_SCHEMA", "SEQUENCE_SCHEMA", "KEYSRULES",
    "VALUESRULES", "BAD_ITEMS", "LOGICAL", "NONEOF", "ONEOF", "ANYOF", "ALLOF",
]


def test_codes_match_reference_bit_for_bit():
    for name in REF_DEFS:
        ours = getattr(E, name)
        theirs = getattr(ref_errors, name)
        assert ours.code == theirs.code, name
        assert ours.rule == theirs.rule, name


def test_message_table_verbatim():
    ref_msgs = ref_errors.BasicErrorHandler.messages
    for code, msg in ref_msgs.items():
        assert E.MESSAGES.get(code) == msg, hex(code)


def test_group_and_logic_flags():
    import datetime as _dt

    assert E.MAPPING_SCHEMA.is_group_error
    assert E.BAD_ITEMS.is_group_error
    assert not E.MIN_VALUE.is_group_error
    assert E.ANYOF.is_logic_error and E.ANYOF.is_group_error  # both bits set
    # parity with a live reference error object
    v = ref_errors.ValidationError((), (), E.ANYOF.code, "anyof", None, None, ([],))
    assert E.ANYOF.is_group_error == v.is_group_error
    assert E.ANYOF.is_logic_error == v.is_logic_error


def test_format_message_placeholders():
    assert E.format_message(0x02) == "required field"
    assert E.format_message(0x42, constraint=5) == "min value is 5"
    assert E.format_message(0x44, value="z") == "unallowed value z"
    assert E.format_message(0x26, info=(2, 3)) == "length of list should be 2, it is 3"


def test_error_tree_anyof_children_match_reference(spark):
    """With logical_child_errors on, the formatted tree for an anyof
    failure matches the reference's validator.errors output verbatim
    (errors.py:618-650 '*of definition %d' path rewriting)."""
    from cerberus_spark import SparkValidator
    from cerberus_spark.errors import error_tree
    from cerberus_spark.oracle import load_reference

    schema = {"x": {"type": "integer",
                    "anyof": [{"min": 0, "max": 9}, {"min": 100}]}}
    df = spark.createDataFrame([(50,)], "x int")
    v = SparkValidator(schema, allow_unknown=True, logical_child_errors=True)
    rows = [r.asDict(recursive=True)
            for r in v.validate(df).violations.collect()]
    got = error_tree(rows)

    cerberus = load_reference()
    if cerberus is not None:
        ref = cerberus.Validator(schema)
        ref.validate({"x": 50})
        assert got == ref.errors
    else:
        assert got == {"x": ["no definitions validate",
                             {"anyof definition 0": ["max value is 9"],
                              "anyof definition 1": ["min value is 100"]}]}


def test_document_error_tree_queries(spark):
    from cerberus_spark import SparkValidator
    from cerberus_spark.errors import DocumentErrorTree, SchemaErrorTree

    schema = {"meta": {"type": "dict", "schema": {
        "lang": {"type": "string", "allowed": ["en"]},
    }}, "n": {"type": "integer", "min": 0}}
    df = spark.createDataFrame([(("xx",), -1)],
                               "meta struct<lang:string>, n int")
    v = SparkValidator(schema, allow_unknown=True)
    rows = [r.asDict(recursive=True)
            for r in v.validate(df).violations.collect()]
    dt = DocumentErrorTree(rows)
    assert "meta" in dt and "n" in dt
    assert [hex(e["code"]) for e in dt.fetch_errors_from(("meta", "lang"))] == ["0x44"]
    # prefix query collects descendants (reference ErrorTree semantics)
    assert len(dt.fetch_errors_from(("meta",))) == 1
    assert dt.fetch_node_from(("nope",)) is None
    st = SchemaErrorTree(rows)
    assert [hex(e["code"]) for e in st.fetch_errors_from(("n", "min"))] == ["0x42"]


# ---------------------------------------------------------------------------
# pluggable error handler (reference validator.py:96-102,177-207;
# errors.py:358-446,461-560)
# ---------------------------------------------------------------------------


def _vrow(doc_path, schema_path, code, rule, constraint, value, info=None):
    return {"document_path": list(doc_path), "schema_path": list(schema_path),
            "code": code, "rule": rule, "constraint": constraint,
            "value": value, "info": info}


def test_basic_error_handler_ported():
    """Port of the reference's test_basic_error_handler
    (tests/test_errors.py:298-330) over violation rows: the same
    incremental error sequence renders the same trees."""
    handler = E.BasicErrorHandler()
    rows, ref = [], {}

    rows.append(_vrow(["foo"], ["foo"], 0x63, "readonly", "true", None))
    ref.update({"foo": [handler.messages[0x63]]})
    assert handler(rows) == ref

    rows.append(_vrow(["bar"], ["foo"], 0x42, "min", "1", "2"))
    ref.update({"bar": [handler.messages[0x42].format(constraint="1")]})
    assert handler(rows) == ref

    rows.append(_vrow(["zap", "foo"], ["zap", "schema", "foo"],
                      0x24, "type", "string", "true"))
    ref.update({"zap": [{"foo": [handler.messages[0x24]
                                 .format(constraint="string")]}]})
    assert handler(rows) == ref

    rows.append(_vrow(["zap", "foo"], ["zap", "schema", "foo"],
                      0x41, "regex", "^p[äe]ng$", "boom"))
    ref["zap"][0]["foo"].append(
        handler.messages[0x41].format(constraint="^p[äe]ng$"))
    assert handler(rows) == ref


def test_init_error_handler_accepted_shapes():
    assert isinstance(E.init_error_handler(E.BasicErrorHandler),
                      E.BasicErrorHandler)
    inst = E.BasicErrorHandler()
    assert E.init_error_handler(inst) is inst
    got = E.init_error_handler((E.BasicErrorHandler, {"tree": {"x": []}}))
    assert got.tree == {"x": []}
    with pytest.raises(RuntimeError, match="Invalid error_handler"):
        E.init_error_handler(object())
    with pytest.raises(RuntimeError, match="Invalid error_handler"):
        E.init_error_handler(dict)


def test_toy_error_handler_never_renders():
    with pytest.raises(RuntimeError, match="not supposed to happen"):
        E.ToyErrorHandler()([])


def test_custom_handler_drives_result_errors(spark):
    """SparkValidator(error_handler=...) injects the formatter that
    ValidationResult.errors() renders through — and the default
    BasicErrorHandler renders the SAME tree the reference's does on a
    shared fixture."""
    from cerberus_spark import SparkValidator

    schema = {
        "role": {"type": "string", "allowed": ["a", "b"]},
        "n": {"type": "integer", "min": 0},
    }
    row = {"role": "z", "n": -1}
    df = spark.createDataFrame([tuple(row.values())], "role string, n int")

    # default handler == reference BasicErrorHandler tree
    got = SparkValidator(schema).validate(df).errors()
    sys.path.insert(0, "/root/reference")
    import cerberus

    ref = cerberus.Validator(schema, allow_unknown=True)
    ref.validate(dict(row))
    assert got == ref.errors

    # a custom handler (class shape + config tuple shape)
    class FlatHandler(E.BaseErrorHandler):
        def __init__(self, sep=": "):
            self.sep = sep
            self.rows = []

        def add(self, row):
            self.rows.append(row)

        def __call__(self, rows):
            self.rows = []
            self.extend(rows)
            return [
                ".".join(r["document_path"]) + self.sep
                + E.format_message(r["code"], constraint=r["constraint"],
                                   value=r["value"],
                                   field=r["document_path"][-1])
                for r in self.rows
            ]

    flat = SparkValidator(schema, error_handler=FlatHandler).validate(df)
    assert flat.errors() == ["n: min value is 0", "role: unallowed value z"]
    cfg = SparkValidator(schema,
                         error_handler=(FlatHandler, {"sep": " -> "}))
    assert cfg.validate(df).errors() == [
        "n -> min value is 0", "role -> unallowed value z"]
