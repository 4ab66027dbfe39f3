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
    kw.setdefault("allow_unknown", True)
    v = SparkValidator(schema, **kw)
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


def test_nested_struct_rename_and_purge(spark):
    """Container normalization applies rename + purge_unknown INSIDE
    struct subdocuments (VERDICT r2 item 3; reference: child-validator
    flag inheritance validator.py:843-849, rename 900-918, purge
    effective only when unknowns are not allowed, 698-699)."""
    schema = {"d": {"type": "dict", "purge_unknown": True, "schema": {
        "a": {"rename": "b"},
        "b": {"coerce": "strip"},
        "c": {"type": "string"},
    }}}
    rows = [((" hi ", "q", "k"),), ((None, "q2", "k2"),), (None,)]
    ddl = "d struct<a:string, z:string, c:string>"
    got = _norm_rows(spark, schema, rows, ddl, allow_unknown=False)
    assert got[0]["d"].asDict() == {"c": "k", "b": "hi"}
    # NULL (absent) source: rename does not fire, no b value appears
    assert got[1]["d"].asDict() == {"c": "k2", "b": None}
    assert got[2]["d"] is None

    if cerberus is not None:
        ref_schema = {"d": {"type": "dict", "purge_unknown": True, "schema": {
            "a": {"rename": "b"}, "b": {"coerce": str.strip},
            "c": {"type": "string"}}}}
        v = cerberus.Validator(ref_schema, allow_unknown=False)
        r0 = v.normalized({"d": {"a": " hi ", "z": "q", "c": "k"}})
        assert r0["d"] == {"c": "k", "b": "hi"}
        r1 = v.normalized({"d": {"z": "q2", "c": "k2"}})
        assert r1["d"] == {"c": "k2"}


def test_nested_struct_purge_skipped_when_unknown_allowed(spark):
    """purge_unknown fires only when unknowns are NOT allowed
    (validator.py:698-699) — with allow_unknown=True the undeclared
    struct field survives, exactly like the reference."""
    schema = {"d": {"type": "dict", "purge_unknown": True, "schema": {
        "a": {"coerce": "strip"},
    }}}
    rows = [((" hi ", "keep"),)]
    got = _norm_rows(spark, schema, rows, "d struct<a:string, z:string>",
                     allow_unknown=True)
    assert got[0]["d"].asDict() == {"a": "hi", "z": "keep"}

    if cerberus is not None:
        v = cerberus.Validator(
            {"d": {"type": "dict", "purge_unknown": True,
                   "schema": {"a": {"coerce": str.strip}}}},
            allow_unknown=True)
        assert v.normalized({"d": {"a": " hi ", "z": "keep"}})["d"] == \
            {"a": "hi", "z": "keep"}


def test_validator_level_purge_recurses_into_struct(spark):
    """Validator-level purge_unknown=True reaches subdocuments through
    the child-validator inheritance even when the nested schema has no
    explicit normalization rule (reference v4 shape)."""
    schema = {"d": {"type": "dict", "schema": {"a": {"type": "string"}}}}
    from cerberus_spark import SparkValidator

    df = spark.createDataFrame([(("x", "y"),)], "d struct<a:string, z:string>")
    v = SparkValidator(schema, purge_unknown=True)
    got = v.normalized(df).collect()
    assert got[0]["d"].asDict() == {"a": "x"}

    if cerberus is not None:
        rv = cerberus.Validator(schema, purge_unknown=True)
        assert rv.normalized({"d": {"a": "x", "z": "y"}})["d"] == {"a": "x"}


def test_nested_map_rename_and_purge(spark):
    """Nested rename + purge over a dynamic map subdocument: the entry
    moves to its target key (clobbering an existing one), the target's
    coercion applies to the moved value, and undeclared keys purge."""
    schema = {"payload": {"type": "dict", "purge_unknown": True, "schema": {
        "a": {"rename": "b"},
        "b": {"coerce": "strip"},
        "keep": {"type": "string"},
    }}}
    rows = [
        ({"a": " hi ", "z": "drop", "keep": "y"},),
        ({"a": " new ", "b": "old", "keep": "y"},),  # clobber existing b
        ({"keep": "y"},),
        (None,),
    ]
    got = _norm_rows(spark, schema, rows, "payload map<string,string>",
                     allow_unknown=False)
    assert got[0]["payload"] == {"b": "hi", "keep": "y"}
    assert got[1]["payload"] == {"b": "new", "keep": "y"}
    assert got[2]["payload"] == {"keep": "y"}
    assert got[3]["payload"] is None

    if cerberus is not None:
        ref_schema = {"payload": {"type": "dict", "purge_unknown": True, "schema": {
            "a": {"rename": "b"}, "b": {"coerce": str.strip},
            "keep": {"type": "string"}}}}
        v = cerberus.Validator(ref_schema, allow_unknown=False)
        assert v.normalized({"payload": {"a": " hi ", "z": "drop", "keep": "y"}})[
            "payload"] == {"b": "hi", "keep": "y"}
        assert v.normalized({"payload": {"a": " new ", "b": "old", "keep": "y"}})[
            "payload"] == {"b": "new", "keep": "y"}
        assert v.normalized({"payload": {"keep": "y"}})["payload"] == {"keep": "y"}


def test_nested_struct_default_for_missing_field(spark):
    """A declared sub-field entirely MISSING from the struct gains a
    synthesized slot filled with its default, the default value runs
    through the field's coerce chain (reference stage order: defaults
    THEN coerce, validator.py:690-710), and a nested `required`
    passes."""
    schema = {"d": {"type": "dict", "schema": {
        "a": {"type": "string"},
        "b": {"default": "z", "coerce": "upper"},
        "r": {"type": "string", "required": True, "default": "rr"},
    }}}
    rows = [(("x",),), (None,)]
    got = _norm_rows(spark, schema, rows, "d struct<a:string>",
                     allow_unknown=False)
    assert got[0]["d"].asDict() == {"a": "x", "b": "Z", "r": "rr"}
    assert got[0]["violations"] == []
    assert got[1]["d"] is None

    if cerberus is not None:
        v = cerberus.Validator({"d": {"type": "dict", "schema": {
            "a": {"type": "string"},
            "b": {"default": "z", "coerce": str.upper},
            "r": {"type": "string", "required": True, "default": "rr"},
        }}})
        assert v.validate({"d": {"a": "x"}}) is True
        assert v.document["d"] == {"a": "x", "b": "Z", "r": "rr"}


def test_same_target_renames_last_wins(spark):
    """Fuzz-soak find (r3): several sources renaming to the SAME target
    follow the reference's sequential dict moves — the last present
    source in schema order wins; earlier ones fall through when it is
    absent; an untouched target survives.  Previously two present
    sources raised DUPLICATED_MAP_KEY (map) / built a duplicate struct
    field."""
    sub = {"a": {"rename": "g"}, "b": {"rename": "g"}}
    ref_sub = dict(sub)
    # map subdocument
    schema = {"payload": {"type": "dict", "schema": sub}}
    rows = [({"a": "A", "b": "B"},), ({"a": "A"},), ({"b": "B"},),
            ({"a": "A", "g": "G"},), ({"g": "G"},)]
    got = _norm_rows(spark, schema, rows, "payload map<string,string>")
    payloads = [dict(r["payload"]) for r in got]
    if cerberus is not None:
        v = cerberus.Validator({"payload": {"type": "dict", "schema": ref_sub}},
                               allow_unknown=True)
        expected = [v.normalized({"payload": dict(r[0])})["payload"] for r in rows]
        assert payloads == expected
    assert payloads[0] == {"g": "B"} and payloads[1] == {"g": "A"}
    assert payloads[3] == {"g": "A"} and payloads[4] == {"g": "G"}

    # struct subdocument (same semantics over fixed fields)
    s2 = {"d": {"type": "dict", "schema": {"a": {"rename": "g"},
                                           "b": {"rename": "g"}}}}
    rows2 = [(("A", "B"),), (("A", None),), ((None, "B"),), ((None, None),)]
    got2 = _norm_rows(spark, s2, rows2, "d struct<a:string, b:string>")
    vals = [r["d"].asDict() if r["d"] is not None else None for r in got2]
    assert vals[0] == {"g": "B"}
    assert vals[1] == {"g": "A"}
    assert vals[2] == {"g": "B"}
    assert vals[3] == {"g": None}


def test_depth2_purge_unknown_recursion(spark):
    """purge_unknown inherits at EVERY depth (r3 ADVICE item 1;
    reference: child validators inherit the flag, validator.py:843-849):
    a nested field whose rules are only {'type','schema'} — no
    normalization rule of its own — must still be descended into so its
    depth-2 unknown sub-fields purge."""
    schema = {"d": {"type": "dict", "schema": {
        "a": {"type": "dict", "schema": {"x": {"type": "integer"}}},
    }}}
    df = spark.createDataFrame(
        [(((1, "drop"), "dropme"),)],
        "d struct<a:struct<x:int, z:string>, w:string>")
    v = SparkValidator(schema, purge_unknown=True)
    got = v.normalized(df).collect()
    assert got[0]["d"].asDict(recursive=True) == {"a": {"x": 1}}

    if cerberus is not None:
        rv = cerberus.Validator(schema, purge_unknown=True)
        assert rv.normalized(
            {"d": {"a": {"x": 1, "z": "drop"}, "w": "dropme"}}
        ) == {"d": {"a": {"x": 1}}}


def test_depth2_purge_unknown_map_values(spark):
    """Depth-2 purge through a MAP subdocument: a declared map key whose
    rules are only {'schema'} still recurses when purging (the nested
    value type must be preserved, so the purged field set must equal
    the declared one here — covered by the string-typed map)."""
    schema = {"payload": {"type": "dict", "purge_unknown": True, "schema": {
        "keep": {"type": "string"},
    }}}
    rows = [({"keep": "y", "z": "drop"},)]
    got = _norm_rows(spark, schema, rows, "payload map<string,string>",
                     allow_unknown=False)
    assert got[0]["payload"] == {"keep": "y"}


def test_rename_chains_sequential(spark):
    """r3 VERDICT item 6: renames apply sequentially in schema order
    like the reference's dict moves — a→b declared before b→c sends a's
    value on to c; the reversed declaration order stops it at b."""
    # chain order: a→b first, then b→c ⇒ a travels to c
    s_fwd = {"a": {"rename": "b"}, "b": {"rename": "c"}, "c": {"type": "string"}}
    rows = [("A", "B", "C"), ("A", None, "C"), (None, "B", "C"), (None, None, None)]
    ddl = "a string, b string, c string"
    got = _norm_rows(spark, s_fwd, rows, ddl)
    vals = [{k: r[k] for k in r.asDict() if k in ("b", "c") and r[k] is not None}
            for r in got]
    if cerberus is not None:
        v = cerberus.Validator(s_fwd, allow_unknown=True)
        docs = [{k: x for k, x in zip(("a", "b", "c"), row) if x is not None}
                for row in rows]
        expected = [v.normalized(d) for d in docs]
        assert vals == expected
    assert vals[0] == {"c": "A"}   # a→b clobbers B, then b's visit moves it on
    # b was NOT originally present: the chain stops — a's value parks at b
    assert vals[1] == {"b": "A", "c": "C"}
    assert vals[2] == {"c": "B"}

    # DOCUMENT order (column layout) sequences the moves, not schema
    # order: with b laid out before a, b's move fires first (B→c), then
    # a parks at the now-empty b slot
    got2 = _norm_rows(spark, s_fwd, [("B", "A", "C")], "b string, a string, c string")
    vals2 = [{k: r[k] for k in r.asDict() if k in ("b", "c") and r[k] is not None}
             for r in got2]
    if cerberus is not None:
        v2 = cerberus.Validator(s_fwd, allow_unknown=True)
        assert vals2 == [v2.normalized({"b": "B", "a": "A", "c": "C"})]
    assert vals2[0] == {"b": "A", "c": "B"}


def test_rename_chains_nested_struct_and_map(spark):
    """Sequential rename moves inside struct and map subdocuments."""
    sub = {"a": {"rename": "b"}, "b": {"rename": "c"}, "c": {"type": "string"}}
    schema_struct = {"d": {"type": "dict", "schema": sub}}
    rows = [(("A", "B", "C"),), ((None, "B", None),)]
    got = _norm_rows(spark, schema_struct, rows,
                     "d struct<a:string, b:string, c:string>")
    d0 = {k: v for k, v in got[0]["d"].asDict().items() if v is not None}
    d1 = {k: v for k, v in got[1]["d"].asDict().items() if v is not None}
    if cerberus is not None:
        v = cerberus.Validator(schema_struct, allow_unknown=True)
        assert d0 == v.normalized({"d": {"a": "A", "b": "B", "c": "C"}})["d"]
        assert d1 == v.normalized({"d": {"b": "B"}})["d"]
    assert d0 == {"c": "A"}
    assert d1 == {"c": "B"}

    schema_map = {"payload": {"type": "dict", "schema": sub}}
    rows_m = [({"a": "A", "b": "B", "c": "C"},), ({"b": "B"},), ({},)]
    got_m = _norm_rows(spark, schema_map, rows_m, "payload map<string,string>")
    pays = [dict(r["payload"]) for r in got_m]
    if cerberus is not None:
        v = cerberus.Validator(schema_map, allow_unknown=True)
        assert pays == [v.normalized({"payload": dict(r[0])})["payload"]
                        for r in rows_m]
    assert pays[0] == {"c": "A"} and pays[1] == {"c": "B"} and pays[2] == {}


def test_keysrules_collision_last_wins(spark):
    """r3 VERDICT item 7: colliding coerced map keys — default surfaces
    an error (DUPLICATED_MAP_KEY); on_key_collision='last_wins' clobbers
    like the reference (warn + last wins)."""
    schema = {"payload": {"type": "dict",
                          "keysrules": {"coerce": "lower"}}}
    rows = [({"A": "1", "a": "2", "B": "3"},)]
    df = spark.createDataFrame(rows, "payload map<string,string>")

    v_err = SparkValidator(schema, allow_unknown=True)
    with pytest.raises(Exception, match="DUPLICATE"):
        v_err.normalized(df).collect()

    v_last = SparkValidator(schema, allow_unknown=True,
                            on_key_collision="last_wins")
    got = dict(v_last.normalized(df).collect()[0]["payload"])
    if cerberus is not None:
        import warnings
        rv = cerberus.Validator(
            {"payload": {"type": "dict", "keysrules": {"coerce": str.lower}}},
            allow_unknown=True)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            expected = rv.normalized({"payload": {"A": "1", "a": "2", "B": "3"}})
        assert got == expected["payload"]
    assert got["b"] == "3" and got["a"] in ("1", "2")
