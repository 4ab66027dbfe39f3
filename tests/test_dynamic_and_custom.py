"""Differential tests: dynamic payload type checks, check_with Python
callables, dependencies dot-paths, require_all — all vs the reference.

Reference test families covered (VERDICT r1 items 4-6):
* dynamic type quirks       cerberus/tests/test_validation.py:196-231,540-576
* check_with callables      cerberus/validator.py:1138-1164
* dependencies + dot paths  cerberus/validator.py:395-423,1182-1223
* require_all               cerberus/validator.py:457-467
"""

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from cerberus_spark import SparkValidator
from cerberus_spark.oracle import compare_per_row, load_reference

cerberus = load_reference()
pytestmark = pytest.mark.skipif(cerberus is None, reason="reference not importable")

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_FLOAT_RE = re.compile(r"^[+-]?([0-9]+[.][0-9]*|[.]?[0-9]+)([eE][+-]?[0-9]+)?$")
_DATE_RE = re.compile(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$")


def _parse_back(s):
    """The dynamic-payload literal convention (compile.dynamic_type_ok):
    map<string,string> values denote typed Python values."""
    if s is None:
        return None
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    if _INT_RE.match(s):
        return int(s)
    if _FLOAT_RE.match(s):
        return float(s)
    if _DATE_RE.match(s):
        try:
            return dt.date.fromisoformat(s)
        except ValueError:
            return s
    try:
        return dt.datetime.fromisoformat(s)
    except ValueError:
        return s


def _run(spark, rows, ddl, schema, docs, **kw):
    df = spark.createDataFrame(rows, ddl)
    v = SparkValidator(schema, dynamic_types=True,
                       allow_unknown=kw.pop("allow_unknown", True), **kw)
    annotated = v.annotate(df).collect()
    return compare_per_row(annotated, docs, schema,
                           allow_unknown=True, **kw)


DYN_ROWS = [
    ({"a": "5", "b": "x", "c": "2.5", "d": "true", "e": "-7"},),
    ({"a": "99", "b": "1e3", "c": "0", "d": "false"},),
    ({"a": "hello world", "b": ".5", "c": "-0.0", "d": "TRUE"},),
    ({},),
    (None,),
]
DYN_DDL = "payload map<string,string>"


def _dyn_docs():
    return [
        {"payload": {k: _parse_back(v) for k, v in r[0].items()}}
        if r[0] is not None else {}
        for r in DYN_ROWS
    ]


def test_dynamic_valuesrules_type_integer(spark):
    """Runtime per-value type check over a mixed-typed map payload —
    quirks: bool passes integer, floats don't (validator.py:118-131)."""
    schema = {"payload": {"type": "dict",
                          "valuesrules": {"type": "integer"}}}
    assert _run(spark, DYN_ROWS, DYN_DDL, schema, _dyn_docs()) == []


def test_dynamic_valuesrules_type_float_includes_bool(spark):
    """ADVICE r2: TypeDefinition('float', (float, _int_types), ()) with
    bool ⊂ int means a bool literal PASSES 'float' in the reference."""
    schema = {"payload": {"type": "dict",
                          "valuesrules": {"type": "float"}}}
    assert _run(spark, DYN_ROWS, DYN_DDL, schema, _dyn_docs()) == []


def test_dynamic_valuesrules_type_number_excludes_bool(spark):
    schema = {"payload": {"type": "dict",
                          "valuesrules": {"type": "number"}}}
    assert _run(spark, DYN_ROWS, DYN_DDL, schema, _dyn_docs()) == []


def test_dynamic_valuesrules_type_string(spark):
    schema = {"payload": {"type": "dict",
                          "valuesrules": {"type": "string"}}}
    assert _run(spark, DYN_ROWS, DYN_DDL, schema, _dyn_docs()) == []


def test_dynamic_min_max_and_suppression(spark):
    """min/max over dynamic literals: numeric compare via try_cast,
    bool as 1/0, TypeError-pass for strings; a type failure suppresses
    the min rule (validator.py:1110-1115)."""
    schema = {"payload": {"type": "dict",
                          "valuesrules": {"type": "integer", "min": 3}}}
    assert _run(spark, DYN_ROWS, DYN_DDL, schema, _dyn_docs()) == []


def test_dynamic_regex_only_on_strings(spark):
    schema = {"payload": {"type": "dict",
                          "valuesrules": {"regex": "[a-z ]+"}}}
    assert _run(spark, DYN_ROWS, DYN_DDL, schema, _dyn_docs()) == []


def test_dynamic_length_rules_skip_non_strings(spark):
    schema = {"payload": {"type": "dict",
                          "valuesrules": {"minlength": 2, "maxlength": 8}}}
    assert _run(spark, DYN_ROWS, DYN_DDL, schema, _dyn_docs()) == []


# ---------------------------------------------------------------------------
# check_with Python callables (reference signature f(field, value, error))
# ---------------------------------------------------------------------------


# NOTE: checker callables are defined INSIDE each test — functions at
# test-module top level pickle by module reference, and the test module
# is not importable on Spark's Python workers; closures pickle by value.


def _make_checkers():
    def oddity(field, value, error):
        if value % 2 == 0:
            error(field, "must be odd")

    def positive(field, value, error):
        if value <= 0:
            error(field, "must be positive")

    return oddity, positive


def test_check_with_reference_callable(spark):
    oddity, _ = _make_checkers()
    rows = [(1,), (2,), (-3,), (0,), (None,)]
    docs = [{"n": r[0]} if r[0] is not None else {} for r in rows]
    schema = {"n": {"type": "integer", "check_with": oddity}}
    df = spark.createDataFrame(rows, "n int")
    annotated = SparkValidator(schema, allow_unknown=True).annotate(df).collect()
    assert compare_per_row(annotated, docs, schema) == []


def test_check_with_chained_callables(spark):
    oddity, positive = _make_checkers()
    rows = [(1,), (2,), (-3,), (0,)]
    docs = [{"n": r[0]} for r in rows]
    schema = {"n": {"check_with": [oddity, positive]}}
    df = spark.createDataFrame(rows, "n int")
    annotated = SparkValidator(schema, allow_unknown=True).annotate(df).collect()
    assert compare_per_row(annotated, docs, schema) == []


def test_check_with_plain_predicate(spark):
    """Engine extension: a 1-arity f(value)->bool predicate is wrapped
    in a vectorized pandas UDF (no reference analog for the shape, but
    the emitted violation matches the error()-style crumb)."""
    rows = [("abc",), ("xyz",), (None,)]
    df = spark.createDataFrame(rows, "s string")
    schema = {"s": {"check_with": (lambda value: value.startswith("a"))}}
    v = SparkValidator(schema, allow_unknown=True)
    got = v.annotate(df).select(F.col("s"), F.size("violations").alias("nv")).collect()
    by_s = {r["s"]: r["nv"] for r in got}
    assert by_s == {"abc": 0, "xyz": 1, None: 0}


# ---------------------------------------------------------------------------
# dependencies: sequence form, dot-paths, ^-root, suppression
# ---------------------------------------------------------------------------

DEP_SCHEMA = {
    "a": {"type": "dict", "schema": {
        "b": {"type": "string"},
        "c": {"type": "string", "dependencies": ["b", "^top"],
              "allowed": ["y", "z"]},
    }},
    "top": {"type": "string"},
}
DEP_DDL = "a struct<b:string, c:string>, top string"
DEP_ROWS = [
    (("x", "y"), "t"),      # all deps met
    ((None, "y"), "t"),     # sibling dep missing
    (("x", "y"), None),     # root dep missing
    ((None, "q"), None),    # both missing + allowed would fail → suppressed
    ((None, None), None),   # c absent: dependencies never fire
]


def _dep_docs():
    docs = []
    for (b, c), top in DEP_ROWS:
        d = {"a": {}}
        if b is not None:
            d["a"]["b"] = b
        if c is not None:
            d["a"]["c"] = c
        if top is not None:
            d["top"] = top
        docs.append(d)
    return docs


def test_dependencies_dot_path_and_root_parity(spark):
    df = spark.createDataFrame(DEP_ROWS, DEP_DDL)
    annotated = SparkValidator(DEP_SCHEMA, allow_unknown=True).annotate(df).collect()
    assert compare_per_row(annotated, _dep_docs(), DEP_SCHEMA) == []


def test_dependencies_dotted_target(spark):
    """Dot-path dependency from a TOP-LEVEL field into a subdocument
    (reference _lookup_field descends mappings, validator.py:395-423)."""
    schema = {
        "a": {"type": "dict", "schema": {"b": {"type": "string"}}},
        "flag": {"type": "string", "dependencies": ["a.b"]},
    }
    rows = [(("x",), "on"), ((None,), "on"), ((None,), None)]
    df = spark.createDataFrame(rows, "a struct<b:string>, flag string")
    docs = []
    for (b,), flag in rows:
        d = {}
        if b is not None:
            d["a"] = {"b": b}
        else:
            d["a"] = {}
        if flag is not None:
            d["flag"] = flag
        docs.append(d)
    annotated = SparkValidator(schema, allow_unknown=True).annotate(df).collect()
    assert compare_per_row(annotated, docs, schema) == []


# ---------------------------------------------------------------------------
# require_all
# ---------------------------------------------------------------------------


def test_require_all_parity(spark):
    schema = {"x": {"type": "string"}, "y": {"type": "integer"},
              "z": {"type": "string", "required": False}}
    rows = [("a", 1, "s"), (None, 1, None), ("a", None, None), (None, None, None)]
    df = spark.createDataFrame(rows, "x string, y int, z string")
    docs = [{k: v for k, v in zip("xyz", r) if v is not None} for r in rows]
    annotated = SparkValidator(schema, allow_unknown=True,
                               require_all=True).annotate(df).collect()
    assert compare_per_row(annotated, docs, schema, require_all=True) == []


def test_readonly_default_interplay_parity(spark):
    """readonly+default: an absent key gains the default silently; any
    input-provided value errors (reference validator.py:939-945 checks
    readonly BEFORE defaults fire)."""
    schema = {"x": {"readonly": True, "default": "n"},
              "y": {"type": "string"}}
    rows = [(None, "a"), ("n", "b"), ("other", "c")]
    df = spark.createDataFrame(rows, "x string, y string")
    v = SparkValidator(schema, allow_unknown=True)
    got = v.annotate(df).collect()
    docs = [({"y": r[1]} if r[0] is None else {"x": r[0], "y": r[1]}) for r in rows]
    assert compare_per_row(got, docs, schema) == []
    # and the default was applied to the absent row
    assert got[0]["x"] == "n" and got[1]["x"] == "n"


def test_default_for_missing_column_satisfies_required(spark):
    """A schema field absent from the DataFrame entirely but declaring a
    default is materialized; required then passes (reference: the
    normalizer inserts the default into the document)."""
    schema = {"a": {"type": "string", "required": True},
              "missing": {"type": "integer", "required": True, "default": 7}}
    df = spark.createDataFrame([("x",), ("y",)], "a string")
    v = SparkValidator(schema, allow_unknown=True)
    got = v.annotate(df).collect()
    assert all(r["passed"] for r in got)
    assert all(r["missing"] == 7 for r in got)
    docs = [{"a": "x"}, {"a": "y"}]
    assert compare_per_row(got, docs, schema) == []


def test_update_mode_skips_required_parity(spark):
    schema = {"a": {"type": "string", "required": True},
              "b": {"type": "integer", "min": 3}}
    rows = [(None, 1), (None, 5), ("x", None)]
    df = spark.createDataFrame(rows, "a string, b int")
    v = SparkValidator(schema, allow_unknown=True, update=True)
    got = v.annotate(df).collect()
    codes = [sorted(x["code"] for x in r["violations"]) for r in got]
    assert codes == [[0x42], [], []]  # only the min failure; no required


def test_none_semantics_parity(spark):
    """null_semantics='none': a NULL column means the key is PRESENT
    with value None — nullable (mandatory on every field) fires for
    non-nullable fields, required passes, value-shape rules are
    suppressed on None (reference validator.py:107, 1371-1394)."""
    schema = {
        "a": {"type": "string"},                      # nullable defaults False
        "b": {"type": "integer", "nullable": True, "min": 3},
        "c": {"type": "string", "required": True},
    }
    rows = [(None, None, None), ("x", 1, "y"), (None, 5, "z")]
    df = spark.createDataFrame(rows, "a string, b int, c string")
    v = SparkValidator(schema, allow_unknown=True, null_semantics="none")
    got = v.annotate(df).collect()
    docs = [dict(zip("abc", r)) for r in rows]  # Nones kept: present keys
    assert compare_per_row(got, docs, schema) == []


def test_registry_resolution_parity(spark):
    """Schemas referencing the rules-set registry by name validate like
    the reference with the same registrations (schema.py:473-554)."""
    from cerberus_spark.dsl import rules_set_registry

    rules_set_registry.add("score", {"type": "integer", "min": 0, "max": 10})
    schema = {"s1": "score", "s2": "score"}
    rows = [(5, 11), (-1, 0), (None, 3)]
    df = spark.createDataFrame(rows, "s1 int, s2 int")
    got = SparkValidator(schema, allow_unknown=True).annotate(df).collect()

    cerberus.rules_set_registry.add("score", {"type": "integer", "min": 0, "max": 10})
    try:
        docs = [{k: v for k, v in zip(("s1", "s2"), r) if v is not None}
                for r in rows]
        assert compare_per_row(got, docs, schema) == []
    finally:
        cerberus.rules_set_registry.remove("score")


def test_custom_type_registry_parity(spark):
    """Custom types via the `types` registry — the analog of extending
    the reference's types_mapping (docs/customize.rst:73-115; the
    benchmark's 'path' type).  Reference custom types are isinstance
    checks; the engine's are DataType predicates."""
    from pyspark.sql import types as T

    schema = {"p": {"type": "path", "minlength": 2},
              "n": {"type": "integer"}}
    rows = [("/a/b", 1), ("x", 2), (None, None)]
    df = spark.createDataFrame(rows, "p string, n int")
    v = SparkValidator(
        schema, allow_unknown=True,
        types={"path": lambda dt: isinstance(dt, T.StringType)},
    )
    got = v.annotate(df).collect()

    class PathValidator(cerberus.Validator):
        types_mapping = cerberus.Validator.types_mapping.copy()
        types_mapping["path"] = cerberus.TypeDefinition("path", (str,), ())

    ref = PathValidator(schema, allow_unknown=True)
    docs = [{k: v2 for k, v2 in zip(("p", "n"), r) if v2 is not None} for r in rows]
    from cerberus_spark.oracle import flatten_reference_errors, spark_violation_tuples
    for row, doc in zip(got, docs):
        ref.validate(doc)
        expected = sorted(flatten_reference_errors(ref._errors))
        actual = spark_violation_tuples(
            [x.asDict(recursive=True) for x in row["violations"]])
        assert actual == expected, (doc, actual, expected)

    # schema-of-schemas still rejects unregistered names
    from cerberus_spark.dsl import SchemaError
    with pytest.raises(SchemaError, match="unknown type"):
        SparkValidator({"p": {"type": "path"}})


# ---------------------------------------------------------------------------
# custom NAMED rules (VERDICT r2 item 2 — docs/customize.rst:21-67)
# ---------------------------------------------------------------------------


class _OddValidator:
    """Lazy holder: build the reference subclass once per run."""

    _cls = None

    @classmethod
    def get(cls):
        if cls._cls is None:
            class MyValidator(cerberus.Validator):
                def _validate_is_odd(self, constraint, field, value):
                    """ {'type': 'boolean'} """
                    if constraint is True and not bool(value & 1):
                        self._error(field, "Must be an odd number")

            cls._cls = MyValidator
        return cls._cls


def _is_odd_column(constraint, value, dtype):
    if constraint is not True:
        return F.lit(True)
    return value % 2 != 0


def _make_is_odd_scalar():
    # defined via factory: closures pickle by value (the test module is
    # not importable on Spark's Python workers — see note above)
    def is_odd(constraint, value):
        return constraint is not True or bool(value & 1)

    return is_odd


def test_custom_named_rule_parity(spark):
    """The ported docs/customize.rst `is_odd` example, differentially
    checked: SparkValidator(rules={'is_odd': fn}) emits the same
    (doc_path, schema_path, code, rule) crumbs as a reference subclass
    with _validate_is_odd, for the Column-builder AND the scalar shape,
    including the 'is odd' space alias and the missing-field skip."""
    schema = {"amount": {"is odd": True, "type": "integer"}}
    rows = [(10,), (9,), (None,), (-3,), (0,)]
    df = spark.createDataFrame(rows, "amount int")
    docs = [{"amount": r[0]} if r[0] is not None else {} for r in rows]
    for impl in (_is_odd_column, _make_is_odd_scalar()):
        v = SparkValidator(schema, allow_unknown=True, rules={"is_odd": impl})
        got = v.annotate(df).collect()
        assert compare_per_row(got, docs, schema,
                               validator_cls=_OddValidator.get()) == [], impl


def test_custom_named_rule_type_suppression(spark):
    """A type failure on the field suppresses the custom rule, like
    every other value rule (validator.py:1110-1115)."""
    schema = {"amount": {"is_odd": True, "type": "integer"}}
    df = spark.createDataFrame([("x",), ("y",)], "amount string")
    v = SparkValidator(schema, allow_unknown=True,
                       rules={"is_odd": _make_is_odd_scalar()})
    rows = v.annotate(df).collect()
    codes = {int(c["code"]) for r in rows for c in r["violations"]}
    assert codes == {0x24}  # BAD_TYPE only — custom rule suppressed


def test_custom_named_rule_schema_validation():
    """dsl.validate_schema accepts registered custom rule names and
    rejects unknown ones; fn.check_constraint gates the constraint
    (the engine's docstring-constraint-schema analog)."""
    import pytest as _pytest

    from cerberus_spark.dsl import SchemaError

    def is_odd(constraint, value):
        return constraint is not True or bool(value & 1)

    is_odd.check_constraint = lambda c: isinstance(c, bool)

    # accepted with registration
    SparkValidator({"a": {"is_odd": True}}, rules={"is_odd": is_odd})
    # rejected without registration
    with _pytest.raises(SchemaError):
        SparkValidator({"a": {"is_odd": True}})
    # bad constraint shape rejected by check_constraint
    with _pytest.raises(SchemaError):
        SparkValidator({"a": {"is_odd": "yes"}}, rules={"is_odd": is_odd})
    # custom rule accepted inside nested definitions too
    SparkValidator(
        {"xs": {"type": "list", "schema": {"is_odd": True, "type": "integer"}}},
        rules={"is_odd": is_odd},
    )


def test_custom_named_rule_stays_in_codegen(spark):
    """The Column-builder shape compiles into the single shuffle-free
    projection — no BatchEvalPython / ArrowEvalPython stage appears."""
    from cerberus_spark.plans.explain import assert_shuffle_free, plan_report

    schema = {"amount": {"is_odd": True, "type": "integer"}}
    df = spark.createDataFrame([(3,), (4,)], "amount int")
    v = SparkValidator(schema, allow_unknown=True,
                       rules={"is_odd": _is_odd_column})
    annotated = v.annotate(df)
    assert_shuffle_free(annotated)
    assert not plan_report(annotated)["python_workers"]


def test_regex_python_dialect_fallback_parity(spark):
    """Python-only regex constructs (named groups, \\A/\\Z anchors,
    conditionals) can't compile in the JVM dialect — the compiler falls
    back to the exact-parity `re` pandas UDF; differential vs the
    reference's re.match(pattern + '$') semantics."""
    rows = [("abc",), ("abcd",), ("xabc",), ("",), (None,), ("ABC",)]
    df = spark.createDataFrame(rows, "s string")
    docs = [{"s": r[0]} if r[0] is not None else {} for r in rows]
    for pattern in (r"(?P<word>[a-z]+)", r"abc\Z", r"\Aabc",
                    r"(?P<a>a)(?(a)bc|xy)"):
        schema = {"s": {"regex": pattern}}
        got = SparkValidator(schema, allow_unknown=True).annotate(df).collect()
        assert compare_per_row(got, docs, schema) == [], pattern


def test_custom_named_rule_error_tree_matches_reference(spark):
    """error_tree renders a custom rule's failure exactly like the
    reference's validator.errors: {field: [message]}."""
    from cerberus_spark.errors import error_tree

    def is_odd(constraint, value):
        return constraint is not True or bool(value & 1)
    is_odd.message = "Must be an odd number"

    v = SparkValidator({"amount": {"is_odd": True, "type": "integer"}},
                       allow_unknown=True, rules={"is_odd": is_odd})
    df = spark.createDataFrame([(10,)], "amount int")
    row = v.annotate(df).collect()[0]
    got = error_tree(row["violations"])

    mv = _OddValidator.get()({"amount": {"is_odd": True, "type": "integer"}},
                             allow_unknown=True)
    mv.validate({"amount": 10})
    assert got == mv.errors == {"amount": ["Must be an odd number"]}


def test_static_bool_column_passes_float_parity(spark):
    """Fuzz-soak find (r3): a BOOLEAN column must pass {'type':'float'}
    statically (bool ⊂ int ⊂ float), so downstream rules (dependencies,
    excludes) run instead of being suppressed by a spurious BAD_TYPE."""
    schema = {"f0": {"type": "float", "dependencies": ["f1", "f2"]},
              "f1": {"type": "string"},
              "f2": {"type": "boolean", "required": True, "nullable": True}}
    rows = [(True, None, None), (False, "x", True), (None, None, True)]
    df = spark.createDataFrame(rows, "f0 boolean, f1 string, f2 boolean")
    docs = [{k: v for k, v in zip(("f0", "f1", "f2"), r) if v is not None}
            for r in rows]
    got = SparkValidator(schema, allow_unknown=True).annotate(df).collect()
    assert compare_per_row(got, docs, schema) == []


def test_excludes_waiver_gated_on_declarer_type_parity(spark):
    """Fuzz-soak find (r3): a present excluder whose own TYPE check
    fails never runs its excludes handler in the reference, so the
    target's `required` still fires; an EMPTY-failing excluder does
    still waive it (empty does not suppress excludes)."""
    # type-failing excluder: waiver must NOT apply
    s1 = {"f3": {"required": True, "excludes": "f4"},
          "f4": {"type": "string", "required": True, "excludes": "f3"}}
    df1 = spark.createDataFrame([(None, -100), (None, None)],
                                "f3 string, f4 int")
    docs1 = [{"f4": -100}, {}]
    got1 = SparkValidator(s1, allow_unknown=True).annotate(df1).collect()
    assert compare_per_row(got1, docs1, s1) == []

    # empty-failing excluder: waiver still applies
    s2 = {"a": {"type": "string", "empty": False, "required": True,
                "excludes": "b"},
          "b": {"required": True, "excludes": "a"}}
    df2 = spark.createDataFrame([("",), ("x",)], "a string")
    docs2 = [{"a": ""}, {"a": "x"}]
    got2 = SparkValidator(s2, allow_unknown=True).annotate(df2).collect()
    assert compare_per_row(got2, docs2, s2) == []


def test_require_all_never_applies_to_unknown_columns(spark):
    """Fuzz-soak find (r3): requirement semantics never apply to unknown
    fields — the reference validates unknowns through a child validator
    that only sees PRESENT fields, so neither require_all nor an
    explicit 'required' in the allow_unknown rules-set fires for an
    absent unknown column."""
    schema = {"a": {"type": "integer"}}
    rows = [(1, None, 7), (2, 3, None)]
    df = spark.createDataFrame(rows, "a int, b int, c int")
    docs = [{k: v for k, v in zip("abc", r) if v is not None} for r in rows]
    for au in ({"type": "integer"}, {"required": True}):
        v = SparkValidator(schema, allow_unknown=au, require_all=True)
        got = v.annotate(df).collect()
        assert compare_per_row(got, docs, schema, allow_unknown=au,
                               require_all=True) == [], au


def test_membership_cross_type_constants_parity(spark):
    """Fuzz-soak find (r3): allowed/forbidden constants of a type the
    column can never equal behave like Python equality (never a member)
    instead of raising CAST_INVALID_INPUT under ANSI mode; the bool↔int
    equivalence (True == 1) is preserved."""
    schema = {"s": {"allowed": [5, 10, "abc"]},
              "n": {"forbidden": ["zzz", 7]},
              "b": {"allowed": [1, "x"]},
              "m": {"type": "integer", "allowed": [True, 5]},
              "xs": {"contains": [5, "a"]}}
    rows = [("abc", 7, True, 1, ["a", "b"]),
            ("hello", 3, False, 5, ["x"]),
            ("", 7, None, 2, None)]
    df = spark.createDataFrame(
        rows, "s string, n int, b boolean, m int, xs array<string>")
    docs = [{k: v for k, v in zip(("s", "n", "b", "m", "xs"), r)
             if v is not None} for r in rows]
    got = SparkValidator(schema, allow_unknown=True).annotate(df).collect()
    assert compare_per_row(got, docs, schema) == []
