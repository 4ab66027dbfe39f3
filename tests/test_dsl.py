"""Schema DSL unit tests — pure driver-side Python, no Spark session."""

import pytest

from cerberus_spark.dsl import (
    Registry,
    RuleSetSchema,
    SchemaError,
    expand_rules_set,
    expand_schema,
    rules_set_registry,
    schema_hash,
    schema_registry,
    validate_schema,
)


def test_logical_shortcut_expansion():
    out = expand_rules_set({"type": "string", "anyof_regex": ["a+", "b+"]})
    assert out["anyof"] == [{"regex": "a+"}, {"regex": "b+"}]
    assert "anyof_regex" not in out


def test_deprecated_renames():
    out = expand_rules_set({"keyschema": {"type": "string"},
                            "valueschema": {"type": "integer"},
                            "validator": "checkit"})
    assert set(out) == {"keysrules", "valuesrules", "check_with"}


def test_nested_expansion_recurses():
    out = expand_schema({
        "a": {"type": "dict", "schema": {"b": {"anyof_type": ["string", "integer"]}}},
    })
    assert out["a"]["schema"]["b"]["anyof"] == [{"type": "string"}, {"type": "integer"}]


def test_items_expansion():
    out = expand_rules_set({"type": "list", "items": [{"oneof_type": ["string"]}]})
    assert out["items"][0]["oneof"] == [{"type": "string"}]


def test_registry_resolution():
    rules_set_registry.add("posint", {"type": "integer", "min": 0})
    schema_registry.add("point", {"x": "posint", "y": "posint"})
    try:
        out = expand_schema("point")
        assert out["x"] == {"type": "integer", "min": 0}
    finally:
        rules_set_registry.remove("posint")
        schema_registry.remove("point")


def test_unknown_registry_reference_raises():
    with pytest.raises(SchemaError, match="registry"):
        expand_schema("nope")


def test_validate_schema_rejects():
    with pytest.raises(SchemaError, match="unknown rule"):
        validate_schema({"f": {"regexx": "a"}})
    with pytest.raises(SchemaError, match="unknown type"):
        validate_schema({"f": {"type": "strnig"}})
    with pytest.raises(SchemaError, match="must be boolean"):
        validate_schema({"f": {"required": "yes"}})
    with pytest.raises(SchemaError, match="must be a dict"):
        validate_schema({"f": 3})
    with pytest.raises(SchemaError, match="integer"):
        validate_schema({"f": {"minlength": "3"}})


def test_validate_schema_constraint_shapes():
    """Ported SchemaError families from the reference's test_schema.py /
    SchemaValidatorMixin (schema.py:310-467): malformed constraints fail
    at schema time, not as confusing compile/Spark errors."""
    # allowed/forbidden must be collections (schema.py:344-352)
    with pytest.raises(SchemaError, match="collection"):
        validate_schema({"f": {"allowed": "abc"}})
    with pytest.raises(SchemaError, match="collection"):
        validate_schema({"f": {"forbidden": 7}})
    # dependencies: name / list / mapping (validator.py:1183 docstring)
    with pytest.raises(SchemaError, match="dependencies"):
        validate_schema({"f": {"dependencies": 3.5}})
    validate_schema({"f": {"dependencies": "g"}})
    validate_schema({"f": {"dependencies": {"g": [1, 2]}}})
    # excludes: name or list of names (schema.py:401-412)
    with pytest.raises(SchemaError, match="excludes"):
        validate_schema({"f": {"excludes": [1, 2]}})
    # coerce / check_with: callables or names (schema.py:354-372)
    with pytest.raises(SchemaError, match="coerce"):
        validate_schema({"f": {"coerce": 42}})
    with pytest.raises(SchemaError, match="check_with"):
        validate_schema({"f": {"check_with": [lambda v: v, 42]}})
    # items: list of rules-sets; nested shapes recurse
    with pytest.raises(SchemaError, match="items"):
        validate_schema({"f": {"items": {"type": "string"}}})
    with pytest.raises(SchemaError, match="unknown rule"):
        validate_schema({"f": {"items": [{"typ": "string"}]}})
    # keysrules/valuesrules: rules-set mappings, recursed
    with pytest.raises(SchemaError, match="rules-set"):
        validate_schema({"f": {"valuesrules": ["type"]}})
    with pytest.raises(SchemaError, match="unknown type"):
        validate_schema({"f": {"keysrules": {"type": "strnig"}}})
    # *of: list of rules-sets (test_schema.py::test_bad_of_rules),
    # no normalization inside
    # (test_schema.py::test_normalization_rules_are_invalid_in_of_rules)
    with pytest.raises(SchemaError, match="list of rules-sets"):
        validate_schema({"f": {"anyof": {"type": "string"}}})
    with pytest.raises(SchemaError, match="not allowed inside"):
        validate_schema({"f": {"anyof": [{"coerce": "to_int"}]}})
    # allow_unknown: bool or rules-set
    with pytest.raises(SchemaError, match="allow_unknown"):
        validate_schema({"f": {"allow_unknown": "sure"}})
    # nested schema errors surface (test_schema.py::test_bad_schema_type_field)
    with pytest.raises(SchemaError, match="unknown type"):
        validate_schema({"foo": {"schema": {"bar": {"type": "strong"}}}})
    # type constraint itself must be names
    with pytest.raises(SchemaError, match="type"):
        validate_schema({"f": {"type": 12}})
    # minlength must be non-negative
    with pytest.raises(SchemaError, match="non-negative"):
        validate_schema({"f": {"maxlength": -1}})


def test_schema_hash_stability_and_sensitivity():
    s1 = {"a": {"type": "integer", "min": 0}, "b": {"type": "string"}}
    s2 = {"b": {"type": "string"}, "a": {"min": 0, "type": "integer"}}
    assert schema_hash(s1) == schema_hash(s2)
    s3 = {"a": {"type": "integer", "min": 1}, "b": {"type": "string"}}
    assert schema_hash(s1) != schema_hash(s3)


def test_schema_hash_callables_by_name():
    def checker(v):
        return True

    h1 = schema_hash({"a": {"check_with": checker}})
    h2 = schema_hash({"a": {"check_with": checker}})
    assert h1 == h2


def test_rulesetschema_roundtrip():
    rs = RuleSetSchema({"a": {"anyof_type": ["string", "integer"], "required": True}})
    assert rs["a"]["required"] is True
    assert len(rs.hash) == 64
    assert rs.fields() == ["a"]


def test_registry_api():
    r = Registry({"x": {"type": "string"}})
    assert r.get("x") == {"type": "string"}
    r.extend({"y": {"type": "integer"}})
    assert set(r.all()) == {"x", "y"}
    r.remove("x")
    assert r.get("x") is None
    r.clear()
    assert r.all() == {}


def test_cycle_guard():
    rules_set_registry.add("self", {"type": "dict", "schema": {"s": "self"}})
    try:
        with pytest.raises(SchemaError, match="64 levels"):
            expand_rules_set("self")
    finally:
        rules_set_registry.remove("self")
