"""Seeded differential fuzzing: random schemas × random documents,
Spark engine vs the reference, exact violation-tuple parity.

Deterministic (seed 42) so failures reproduce; the generator draws from
the rule pool the engine claims full parity for (SURVEY.md §2.1) and
deliberately includes type-mismatched declarations, nulls, empty
strings, boundary numerics, dependencies/excludes field references and
require_all — the combinations no hand-written table covers
exhaustively.  Each schema validates one 40-row DataFrame in a single
annotate() pass, so the suite stays ~1 Spark job per schema.
"""

import random

import pytest

from cerberus_spark import SparkValidator
from cerberus_spark.oracle import compare_per_row, load_reference

cerberus = load_reference()
pytestmark = pytest.mark.skipif(cerberus is None, reason="reference not importable")

N_SCHEMAS = 15
N_DOCS = 40

DTYPES = {
    "int": ("int", "integer"),
    "bigint": ("bigint", "integer"),
    "double": ("double", "float"),
    "string": ("string", "string"),
    "boolean": ("boolean", "boolean"),
}
TYPE_NAMES = ["integer", "float", "number", "string", "boolean"]

_STR_POOL = ["", "a", "ab", "abc", "hello", "Hello World", "  pad  ",
             "xyz-1", "zzz", "1234", "true"]
_INT_POOL = [0, 1, -1, 5, 10, 42, -100, 999]
_FLT_POOL = [0.0, 1.5, -2.25, 10.0, 0.001, -0.5, 99.75]


def _rand_value(rng, dtype):
    if rng.random() < 0.25:
        return None
    if dtype in ("int", "bigint"):
        return rng.choice(_INT_POOL)
    if dtype == "double":
        return float(rng.choice(_FLT_POOL + _INT_POOL))
    if dtype == "boolean":
        return rng.choice([True, False])
    return rng.choice(_STR_POOL)


def _rand_rules(rng, fname, dtype, all_fields):
    rules = {}
    if rng.random() < 0.8:
        # 30% of the time declare a type that may NOT match the column
        declared = DTYPES[dtype][1] if rng.random() < 0.7 else rng.choice(TYPE_NAMES)
        rules["type"] = declared
    if rng.random() < 0.3:
        rules["required"] = rng.random() < 0.8
    if rng.random() < 0.2:
        rules["nullable"] = True
    if dtype in ("int", "bigint", "double"):
        if rng.random() < 0.4:
            rules["min"] = rng.choice(_INT_POOL)
        if rng.random() < 0.4:
            rules["max"] = rng.choice(_INT_POOL)
        if rng.random() < 0.25:
            rules["allowed"] = rng.sample(_INT_POOL, k=rng.randint(2, 5))
        if rng.random() < 0.1:
            # cross-type constants: never equal per Python semantics —
            # must contribute False, not an ANSI cast error
            rules.setdefault("allowed", []).extend(rng.sample(_STR_POOL[1:], k=2))
    elif dtype == "string":
        if rng.random() < 0.3:
            rules["minlength"] = rng.randint(0, 3)
        if rng.random() < 0.3:
            rules["maxlength"] = rng.randint(3, 8)
        if rng.random() < 0.3:
            rules["allowed"] = rng.sample(_STR_POOL, k=rng.randint(2, 5))
        if rng.random() < 0.25:
            rules["forbidden"] = rng.sample(_STR_POOL, k=rng.randint(1, 3))
        if rng.random() < 0.1:
            rules.setdefault("allowed", []).extend(rng.sample(_INT_POOL, k=2))
        if rng.random() < 0.3:
            rules["regex"] = rng.choice([r"[a-z]+", r"[A-Za-z ]+", r"a.*",
                                         r"[0-9]{4}", r".{2,6}"])
        if rng.random() < 0.2:
            rules["empty"] = rng.random() < 0.5
    others = [f for f in all_fields if f != fname]
    if others and rng.random() < 0.25:
        dep = rng.sample(others, k=min(len(others), rng.randint(1, 2)))
        rules["dependencies"] = dep if len(dep) > 1 else dep[0]
    if others and rng.random() < 0.15:
        rules["excludes"] = rng.choice(others)
    return rules


def _gen_case(rng):
    n_fields = rng.randint(3, 5)
    fields = [f"f{i}" for i in range(n_fields)]
    dtypes = {f: rng.choice(list(DTYPES)) for f in fields}
    schema = {f: _rand_rules(rng, f, dtypes[f], fields) for f in fields}
    # a rules-less field is not a valid schema entry for the engine's
    # purposes — give it at least a type
    for f in fields:
        if not schema[f]:
            schema[f] = {"type": DTYPES[dtypes[f]][1]}
    ddl = ", ".join(f"{f} {DTYPES[dtypes[f]][0]}" for f in fields)
    rows = [tuple(_rand_value(rng, dtypes[f]) for f in fields)
            for _ in range(N_DOCS)]
    require_all = rng.random() < 0.2
    return schema, ddl, fields, rows, require_all


def test_fuzz_flat_schemas_match_reference(spark):
    rng = random.Random(42)
    failures = []
    for case_i in range(N_SCHEMAS):
        schema, ddl, fields, rows, require_all = _gen_case(rng)
        df = spark.createDataFrame(rows, ddl)
        v = SparkValidator(schema, allow_unknown=True, require_all=require_all)
        annotated = v.annotate(df).collect()
        docs = [{f: val for f, val in zip(fields, r) if val is not None}
                for r in rows]
        mismatches = compare_per_row(annotated, docs, schema,
                                     require_all=require_all, normalize=False)
        if mismatches:
            failures.append(
                {"case": case_i, "schema": schema,
                 "first_mismatch": mismatches[0], "n": len(mismatches)})
    assert failures == [], failures[:2]


# ---------------------------------------------------------------------------
# dynamic map payloads (runtime per-value type checks) — the quirkiest
# surface: bool⊂int⊂float, number-excludes-bool, TypeError-pass min/max,
# regex/length gated on str-denoting literals
# ---------------------------------------------------------------------------

_DYN_LITERALS = ["5", "-3", "0", "2.5", "-0.75", "1e3", ".5", "true", "false",
                 "TRUE", "hello", "a b c", "", "2021-04-05", "xyz", "42"]
_DYN_KEYS = list("abcde")

import datetime as _dt
import re as _re

_INT_RE = _re.compile(r"^[+-]?[0-9]+$")
_FLOAT_RE = _re.compile(r"^[+-]?([0-9]+[.][0-9]*|[.]?[0-9]+)([eE][+-]?[0-9]+)?$")
_DATE_RE = _re.compile(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$")


def _parse_back(s):
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
            return _dt.date.fromisoformat(s)
        except ValueError:
            return s
    try:
        return _dt.datetime.fromisoformat(s)
    except ValueError:
        return s


def _rand_valuesrules(rng):
    rules = {}
    if rng.random() < 0.8:
        rules["type"] = rng.choice(["integer", "float", "number", "string", "boolean"])
    if rng.random() < 0.4:
        rules["min"] = rng.choice(_INT_POOL)
    if rng.random() < 0.4:
        rules["max"] = rng.choice(_INT_POOL)
    if rng.random() < 0.3:
        rules["regex"] = rng.choice([r"[a-z ]+", r"[0-9]+", r"h.*"])
    if rng.random() < 0.3:
        rules["minlength"] = rng.randint(0, 3)
    if rng.random() < 0.3:
        rules["maxlength"] = rng.randint(3, 8)
    return rules or {"type": "string"}


def test_fuzz_dynamic_payload_matches_reference(spark):
    rng = random.Random(7)
    failures = []
    for case_i in range(12):
        vr = _rand_valuesrules(rng)
        schema = {"payload": {"type": "dict", "valuesrules": vr}}
        rows = []
        for _ in range(30):
            if rng.random() < 0.1:
                rows.append((None,))
            else:
                ks = rng.sample(_DYN_KEYS, k=rng.randint(0, 4))
                rows.append(({k: rng.choice(_DYN_LITERALS) for k in ks},))
        df = spark.createDataFrame(rows, "payload map<string,string>")
        v = SparkValidator(schema, dynamic_types=True, allow_unknown=True)
        annotated = v.annotate(df).collect()
        docs = [
            {"payload": {k: _parse_back(x) for k, x in r[0].items()}}
            if r[0] is not None else {}
            for r in rows
        ]
        mismatches = compare_per_row(annotated, docs, schema, normalize=False)
        if mismatches:
            failures.append({"case": case_i, "valuesrules": vr,
                             "first": mismatches[0], "n": len(mismatches)})
    assert failures == [], failures[:2]


# ---------------------------------------------------------------------------
# nested struct subdocuments — sub-schema rules + cross-sibling
# dependencies/excludes inside the struct
# ---------------------------------------------------------------------------


def test_fuzz_nested_struct_matches_reference(spark):
    rng = random.Random(99)
    failures = []
    for case_i in range(10):
        sub_fields = [f"s{i}" for i in range(rng.randint(2, 3))]
        sub_dtypes = {f: rng.choice(["int", "string", "double", "boolean"])
                      for f in sub_fields}
        sub_schema = {f: _rand_rules(rng, f, sub_dtypes[f], sub_fields)
                      for f in sub_fields}
        for f in sub_fields:
            if not sub_schema[f]:
                sub_schema[f] = {"type": DTYPES[sub_dtypes[f]][1]}
        schema = {"d": {"type": "dict", "schema": sub_schema},
                  "top": {"type": "string"}}
        ddl = ("d struct<" + ", ".join(f"{f}:{DTYPES[sub_dtypes[f]][0]}"
                                       for f in sub_fields) + ">, top string")
        rows = []
        for _ in range(30):
            if rng.random() < 0.15:
                rows.append((None, _rand_value(rng, "string")))
            else:
                rows.append((
                    tuple(_rand_value(rng, sub_dtypes[f]) for f in sub_fields),
                    _rand_value(rng, "string"),
                ))
        df = spark.createDataFrame(rows, ddl)
        v = SparkValidator(schema, allow_unknown=True)
        annotated = v.annotate(df).collect()
        docs = []
        for d, top in rows:
            doc = {}
            if d is not None:
                doc["d"] = {f: val for f, val in zip(sub_fields, d)
                            if val is not None}
            if top is not None:
                doc["top"] = top
            docs.append(doc)
        mismatches = compare_per_row(annotated, docs, schema, normalize=False)
        if mismatches:
            failures.append({"case": case_i, "schema": schema,
                             "first": mismatches[0], "n": len(mismatches)})
    assert failures == [], failures[:2]


# ---------------------------------------------------------------------------
# normalization: coerce chains + defaults over string columns, comparing
# the NORMALIZED VALUES against the reference's normalized documents
# ---------------------------------------------------------------------------

_COERCERS = {  # engine name -> reference callable
    "strip": str.strip,
    "lower": str.lower,
    "upper": str.upper,
}


def test_fuzz_normalization_matches_reference(spark):
    rng = random.Random(1234)
    failures = []
    for case_i in range(12):
        n_fields = rng.randint(2, 4)
        fields = [f"f{i}" for i in range(n_fields)]
        eng_schema, ref_schema = {}, {}
        for f in fields:
            chain = rng.sample(list(_COERCERS), k=rng.randint(0, 2))
            er, rr = {"type": "string"}, {"type": "string"}
            if chain:
                er["coerce"] = list(chain)
                rr["coerce"] = [_COERCERS[c] for c in chain]
            if rng.random() < 0.5:
                d = rng.choice(_STR_POOL[1:])  # non-empty default
                er["default"] = d
                rr["default"] = d
            eng_schema[f], ref_schema[f] = er, rr
        ddl = ", ".join(f"{f} string" for f in fields)
        rows = [tuple(_rand_value(rng, "string") for _ in fields)
                for _ in range(25)]
        df = spark.createDataFrame(rows, ddl)
        v = SparkValidator(eng_schema, allow_unknown=True)
        got = v.normalized(df).collect()

        ref = cerberus.Validator(ref_schema, allow_unknown=True)
        for row_i, (r, spark_row) in enumerate(zip(rows, got)):
            doc = {f: val for f, val in zip(fields, r) if val is not None}
            ref_doc = ref.normalized(doc)
            eng_doc = {f: spark_row[f] for f in fields
                       if spark_row[f] is not None}
            if ref_doc != eng_doc:
                failures.append({"case": case_i, "row": row_i,
                                 "schema": eng_schema, "in": doc,
                                 "ref": ref_doc, "eng": eng_doc})
    assert failures == [], failures[:3]


# ---------------------------------------------------------------------------
# logical *of operators and list-element schemas
# ---------------------------------------------------------------------------


def test_fuzz_logical_ops_match_reference(spark):
    rng = random.Random(555)
    failures = []
    for case_i in range(12):
        op = rng.choice(["anyof", "allof", "noneof", "oneof"])
        n_defs = rng.randint(2, 3)
        defs = []
        for _ in range(n_defs):
            d = {}
            if rng.random() < 0.6:
                d["min"] = rng.choice(_INT_POOL)
            if rng.random() < 0.6:
                d["max"] = rng.choice(_INT_POOL)
            if rng.random() < 0.3:
                d["allowed"] = rng.sample(_INT_POOL, k=rng.randint(2, 4))
            if not d:
                d["min"] = 0
            defs.append(d)
        schema = {"n": {"type": "integer", op: defs},
                  "s": {"type": "string",
                        "anyof_regex": [r"[a-z]+", r"[0-9]+"]}
                  if rng.random() < 0.5 else {"type": "string"}}
        rows = [(rng.choice(_INT_POOL + [None]),
                 _rand_value(rng, "string")) for _ in range(30)]
        df = spark.createDataFrame(rows, "n int, s string")
        v = SparkValidator(schema, allow_unknown=True)
        annotated = v.annotate(df).collect()
        docs = [{k: val for k, val in zip(("n", "s"), r) if val is not None}
                for r in rows]
        mismatches = compare_per_row(annotated, docs, schema, normalize=False)
        if mismatches:
            failures.append({"case": case_i, "op": op, "schema": schema,
                             "first": mismatches[0], "n": len(mismatches)})
    assert failures == [], failures[:2]


def test_fuzz_list_element_schemas_match_reference(spark):
    rng = random.Random(321)
    failures = []
    for case_i in range(10):
        elem_rules = {"type": "string"}
        if rng.random() < 0.5:
            elem_rules["minlength"] = rng.randint(1, 3)
        if rng.random() < 0.5:
            elem_rules["regex"] = rng.choice([r"[a-z]+", r"[a-z ]+", r".{1,5}"])
        if rng.random() < 0.4:
            elem_rules["allowed"] = rng.sample(_STR_POOL[1:], k=rng.randint(2, 4))
        schema = {"xs": {"type": "list", "schema": elem_rules}}
        rows = []
        for _ in range(25):
            if rng.random() < 0.2:
                rows.append((None,))
            else:
                rows.append(([rng.choice(_STR_POOL)
                              for _ in range(rng.randint(0, 4))],))
        df = spark.createDataFrame(rows, "xs array<string>")
        v = SparkValidator(schema, allow_unknown=True)
        annotated = v.annotate(df).collect()
        docs = [{"xs": list(r[0])} if r[0] is not None else {} for r in rows]
        mismatches = compare_per_row(annotated, docs, schema, normalize=False)
        if mismatches:
            failures.append({"case": case_i, "schema": schema,
                             "first": mismatches[0], "n": len(mismatches)})
    assert failures == [], failures[:2]


def test_fuzz_none_semantics_matches_reference(spark):
    """null_semantics='none' (present-None convention): nullable fires,
    excludes runs on None values with key-existence co-presence,
    dependencies are met by any existing column, and the exclusion-group
    required check registers per-row (type-mismatched declarers only on
    None).  All pinned fuzz-soak finds of round 3."""
    rng = random.Random(9753)
    failures = []
    for case_i in range(12):
        schema, ddl, fields, rows, require_all = _gen_case(rng)
        df = spark.createDataFrame(rows, ddl)
        v = SparkValidator(schema, allow_unknown=True, require_all=require_all,
                           null_semantics="none")
        annotated = v.annotate(df).collect()
        docs = [dict(zip(fields, r)) for r in rows]  # Nones KEPT: present keys
        m = compare_per_row(annotated, docs, schema, require_all=require_all,
                            normalize=False)
        if m:
            failures.append({"case": case_i, "schema": schema, "first": m[0]})
    assert failures == [], failures[:2]


# ---------------------------------------------------------------------------
# r4 soaks: coerce callables; *of + normalization interplay (r3 VERDICT 8)
# ---------------------------------------------------------------------------


def test_fuzz_coerce_callables_match_reference(spark):
    """Callable coercers whose Python twins can RAISE: an exception (or
    cast failure) files COERCION_FAILED (0x61) on both sides.  The
    reference keeps the un-coercible value where the engine NULLs it
    (documented deviation), so parity here is (1) the violation sets
    and (2) the values of fields whose coercion succeeded."""
    from pyspark.sql import functions as F, types as T

    # paired (engine CoercerFn, reference py-callable) — defined inside
    # the test (module-level test functions don't pickle to workers)
    def eng_int(col, dtype):
        return col.try_cast(T.LongType()), T.LongType()

    def eng_float(col, dtype):
        return col.try_cast(T.DoubleType()), T.DoubleType()

    def eng_strip(col, dtype):
        return F.trim(col), T.StringType()

    def eng_upper(col, dtype):
        return F.upper(col), T.StringType()

    def eng_rev(col, dtype):
        return F.reverse(col), T.StringType()

    pairs = {
        "int": (eng_int, int),
        "float": (eng_float, float),
        "strip": (eng_strip, str.strip),
        "upper": (eng_upper, str.upper),
        "rev": (eng_rev, lambda v: v[::-1]),
    }
    str_only = {"strip", "upper", "rev"}
    pool = ["", " 42 ", "1.5", "abc", "007", "-3", "0x1f", "  pad  ",
            "99.75", "NaN", "hello world", "12e2"]

    rng = random.Random(777)
    failures = []
    for case_i in range(20):
        n_fields = rng.randint(1, 3)
        fields = [f"f{i}" for i in range(n_fields)]
        eng_schema, ref_schema = {}, {}
        for f in fields:
            if rng.random() < 0.5:
                names = [rng.choice(sorted(str_only))]
            else:
                names = rng.sample(sorted(pairs), k=rng.randint(1, 2))
                # keep chains type-coherent: python str-ops raise on the
                # ints a numeric step yields — str-ops first
                names.sort(key=lambda n: n not in str_only)
            eng_schema[f] = {"coerce": [pairs[n][0] for n in names]}
            ref_schema[f] = {"coerce": [pairs[n][1] for n in names]}
        rows = [tuple(rng.choice(pool + [None]) for _ in fields)
                for _ in range(20)]
        ddl = ", ".join(f"{f} string" for f in fields)
        df = spark.createDataFrame(rows, ddl)
        v = SparkValidator(eng_schema, allow_unknown=True)
        got = v.annotate(df).collect()

        ref = cerberus.Validator(ref_schema, allow_unknown=True)
        for row_i, (r, srow) in enumerate(zip(rows, got)):
            doc = {f: val for f, val in zip(fields, r) if val is not None}
            ref.validate(dict(doc))
            ref_doc = ref.document
            ref_failed = {p[0] for p in
                          (e.document_path for e in ref._errors)}
            eng_failed = {v2["document_path"][0]
                          for v2 in (x.asDict(recursive=True)
                                     for x in srow["violations"])}
            ok = ref_failed == eng_failed
            # values parity on fields that did NOT fail coercion
            for f in fields:
                if f in ref_failed or f not in doc:
                    continue
                ev = srow[f]
                rv = ref_doc.get(f)
                # engine numeric coercions are typed; compare loosely
                if isinstance(rv, float) or isinstance(ev, float):
                    import math
                    both_nan = (ev is not None and rv is not None
                                and math.isnan(float(ev))
                                and math.isnan(float(rv)))
                    ok = ok and (both_nan or (
                        ev is not None and rv is not None
                        and abs(float(ev) - float(rv)) < 1e-9))
                else:
                    ok = ok and str(ev) == str(rv)
            if not ok:
                failures.append({"case": case_i, "row": row_i, "in": doc,
                                 "ref": (ref_failed, ref_doc),
                                 "eng": (eng_failed,
                                         {f: srow[f] for f in fields})})
    assert failures == [], failures[:3]


def test_fuzz_of_with_normalization_matches_reference(spark):
    """*of operators on fields that ALSO normalize (default + coerce):
    the reference normalizes first, then the *of validates the
    normalized value — violation parity across the interplay."""
    rng = random.Random(4242)
    failures = []
    for case_i in range(15):
        op = rng.choice(["anyof", "allof", "noneof", "oneof"])
        n_defs = rng.randint(2, 3)
        defs = []
        for _ in range(n_defs):
            d = {}
            pick = rng.random()
            if pick < 0.4:
                d["min"] = rng.choice([0, 1, 5])
                if rng.random() < 0.5:
                    d["max"] = rng.choice([10, 42, 100])
            elif pick < 0.7:
                d["allowed"] = rng.sample([0, 1, 5, 7, 10, 42], k=3)
            else:
                d["forbidden"] = rng.sample([0, 1, 5, 42], k=2)
            defs.append(d)
        er = {"coerce": "to_int", op: defs}
        rr = {"coerce": int, op: defs}
        if rng.random() < 0.5:
            dflt = rng.choice(["1", "5", "42"])
            er["default"], rr["default"] = dflt, dflt
        eng_schema = {"x": er, "pad": {"type": "string"}}
        ref_schema = {"x": rr, "pad": {"type": "string"}}
        # coercible inputs only: an un-coercible value triggers the
        # documented keep-vs-NULL deviation (reference validates the
        # kept raw value, the engine the NULLed one), pinned elsewhere
        rows = [(rng.choice(["0", "1", "5", "7", "42", None]),
                 rng.choice(["p", None]))
                for _ in range(25)]
        df = spark.createDataFrame(rows, "x string, pad string")
        v = SparkValidator(eng_schema, allow_unknown=True)
        got = v.annotate(df).collect()
        docs = [{k: x for k, x in zip(("x", "pad"), r) if x is not None}
                for r in rows]
        mism = compare_per_row(got, docs, ref_schema)
        for m in mism:
            failures.append({"case": case_i, "op": op, "defs": defs, **m})
    assert failures == [], failures[:3]


def test_fuzz_rename_graphs_match_reference(spark):
    """Random rename topologies — chains, shared targets, renames onto
    existing fields, renames to fresh names — across random presence
    patterns: the engine's fold_renames must reproduce the reference's
    document-order dict moves exactly (r4: sequential-rename parity)."""
    rng = random.Random(90210)
    failures = []
    for case_i in range(30):
        n_fields = rng.randint(2, 5)
        fields = [f"f{i}" for i in range(n_fields)]
        name_pool = fields + [f"g{i}" for i in range(2)]
        schema = {}
        for f in fields:
            r = {}
            if rng.random() < 0.6:
                tgt = rng.choice([n for n in name_pool if n != f])
                r["rename"] = tgt
            else:
                r["type"] = "string"
            schema[f] = r
        # reference requires every rename target be schema-known? no —
        # targets may be unknown names (allow_unknown handles them)
        rows = [tuple(rng.choice(["A", "B", "C", None]) for _ in fields)
                for _ in range(30)]
        ddl = ", ".join(f"{f} string" for f in fields)
        df = spark.createDataFrame(rows, ddl)
        try:
            v = SparkValidator(schema, allow_unknown=True)
            got = v.normalized(df).collect()
        except Exception as e:
            failures.append({"case": case_i, "schema": schema,
                             "engine_error": repr(e)})
            continue
        ref = cerberus.Validator(schema, allow_unknown=True)
        for row_i, (r, srow) in enumerate(zip(rows, got)):
            doc = {f: val for f, val in zip(fields, r) if val is not None}
            ref_doc = ref.normalized(dict(doc))
            eng_doc = {k: srow[k] for k in srow.asDict()
                       if srow[k] is not None}
            if ref_doc != eng_doc:
                failures.append({"case": case_i, "row": row_i,
                                 "schema": schema, "in": doc,
                                 "ref": ref_doc, "eng": eng_doc})
    assert failures == [], (len(failures), failures[:3])


def test_fuzz_keysrules_collisions_match_reference(spark):
    """keysrules key coercions under on_key_collision='last_wins':
    random colliding key sets × {lower, strip, upper} chains replay the
    reference's exact mutating-iteration semantics (overwrite-and-keep
    vs move) — including the warn-path where a coerced key lands on a
    LIVE key."""
    import warnings

    ref_chain = {"lower": str.lower, "strip": str.strip, "upper": str.upper}
    key_pool = ["A", "a", " a", "a ", "B", "b", "C", "cc", " B ", "Aa",
                "AA", "aa", " aa", "b "]  # dense collisions under all 3 chains

    rng = random.Random(31337)
    failures = []
    for case_i in range(25):
        coercer = rng.choice(sorted(ref_chain))
        schema = {"payload": {"type": "dict", "keysrules": {"coerce": coercer}}}
        ref_schema = {"payload": {"type": "dict",
                                  "keysrules": {"coerce": ref_chain[coercer]}}}
        rows = []
        for _ in range(15):
            ks = rng.sample(key_pool, k=rng.randint(1, 5))
            rows.append(({k: f"v{j}" for j, k in enumerate(ks)},))
        df = spark.createDataFrame(rows, "payload map<string,string>")
        v = SparkValidator(schema, allow_unknown=True,
                           on_key_collision="last_wins")
        got = v.normalized(df).collect()
        ref = cerberus.Validator(ref_schema, allow_unknown=True)
        for row_i, (r, srow) in enumerate(zip(rows, got)):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                # engine iterates canonical SORTED key order (a Spark
                # map carries no reliable entry order) — feed the
                # reference the same order
                ref_doc = ref.normalized({"payload": dict(sorted(r[0].items()))})
            eng = dict(srow["payload"]) if srow["payload"] is not None else None
            if eng != ref_doc["payload"]:
                failures.append({"case": case_i, "row": row_i,
                                 "coercer": coercer, "in": dict(r[0]),
                                 "ref": ref_doc["payload"], "eng": eng})
    assert failures == [], (len(failures), failures[:3])


def test_fuzz_nested_rename_graphs_match_reference(spark):
    """Random rename topologies INSIDE struct and map subdocuments: the
    struct branch shares fold_renames; the map branch replays the
    document-order moves with an aggregate over the runtime entries
    snapshot — both must match the reference's child-validator moves."""
    rng = random.Random(60606)
    failures = []
    keyspace = ["a", "b", "c", "d", "g"]
    for case_i in range(20):
        sub = {}
        for k in keyspace[:4]:
            if rng.random() < 0.6:
                sub[k] = {"rename": rng.choice([x for x in keyspace if x != k])}
            else:
                sub[k] = {"type": "string"}
        schema_map = {"payload": {"type": "dict", "schema": sub}}
        rows = []
        for _ in range(20):
            ks = [k for k in keyspace[:4] if rng.random() < 0.7]
            rng.shuffle(ks)  # producer order varies ...
            rows.append(({k: f"v_{k}" for k in ks},))
        df = spark.createDataFrame(rows, "payload map<string,string>")
        v = SparkValidator(schema_map, allow_unknown=True)
        got = v.normalized(df).collect()
        ref = cerberus.Validator(schema_map, allow_unknown=True)
        for row_i, (r, srow) in enumerate(zip(rows, got)):
            # ... but createDataFrame CANONICALIZES python-dict entry
            # order (verified: any insertion order materializes sorted),
            # so the engine can only see the stored order — parity is
            # defined on the entry order the column actually carries;
            # feed the reference the same order
            ref_doc = ref.normalized({"payload": dict(sorted(r[0].items()))})
            eng = dict(srow["payload"]) if srow["payload"] is not None else None
            if eng != ref_doc["payload"]:
                failures.append({"case": case_i, "row": row_i, "sub": sub,
                                 "in": dict(r[0]),
                                 "ref": ref_doc["payload"], "eng": eng})

        # struct variant: field layout IS the document order
        schema_st = {"d": {"type": "dict", "schema": sub}}
        st_rows = [((rng.choice(["X", None]), rng.choice(["Y", None]),
                     rng.choice(["Z", None]), rng.choice(["W", None])),)
                   for _ in range(10)]
        sdf = spark.createDataFrame(
            st_rows, "d struct<a:string, b:string, c:string, d:string>")
        sv = SparkValidator(schema_st, allow_unknown=True)
        sgot = sv.normalized(sdf).collect()
        for row_i, (r, srow) in enumerate(zip(st_rows, sgot)):
            doc = {k: x for k, x in zip(("a", "b", "c", "d"), r[0])
                   if x is not None}
            ref_doc = ref.normalized({"d" if False else "payload": doc}) \
                if False else cerberus.Validator(
                    schema_st, allow_unknown=True).normalized({"d": doc})
            eng = ({k: v2 for k, v2 in srow["d"].asDict().items()
                    if v2 is not None} if srow["d"] is not None else None)
            if eng != ref_doc["d"]:
                failures.append({"case": case_i, "row": row_i, "sub": sub,
                                 "struct_in": doc,
                                 "ref": ref_doc["d"], "eng": eng})
    assert failures == [], (len(failures), failures[:3])


def test_ignore_none_values_matches_reference(spark):
    """Reference Validator(ignore_none_values=True) (validator.py:146,
    1036, 1458-1462): a None VALUE runs no rule and counts as missing
    for required.  Directed parity on the reference's own test case
    (test_validation.py:832-856) plus excludes/dependencies nuances:
    a None-valued excludes declarer registers no waiver, but a
    present-None key still satisfies dependencies and still triggers a
    non-null declarer's excludes co-presence."""
    schema = {
        "t": {"type": "string", "empty": False, "required": True},
        "u": {"type": "string", "required": False},
        "a": {"type": "string", "required": True, "excludes": ["b"]},
        "b": {"type": "string", "required": True},
        "c": {"type": "integer", "dependencies": ["u"]},
    }
    rows = [
        (None, None, None, None, None),       # t: required only (None=missing)
        ("", None, None, None, None),         # t: empty error still fires
        ("x", "u1", "a1", None, 3),           # a present → waives b's required
        ("x", None, None, "b1", 4),           # a None → NO waiver code path; b ok
        ("x", None, "a1", "b1", None),        # both present → excludes fires on a
    ]
    df = spark.createDataFrame(rows, "t string, u string, a string, b string, c int")
    v = SparkValidator(schema, allow_unknown=True, null_semantics="none",
                       ignore_none_values=True)
    annotated = v.annotate(df).collect()
    docs = [dict(zip(("t", "u", "a", "b", "c"), r)) for r in rows]  # Nones KEPT
    m = compare_per_row(annotated, docs, schema, normalize=False,
                        ignore_none_values=True)
    assert m == [], m[:3]

    # under the default 'absent' convention the flag is a declared no-op
    v2 = SparkValidator(schema, allow_unknown=True, ignore_none_values=True)
    v3 = SparkValidator(schema, allow_unknown=True)
    got2 = [tuple(sorted((tuple(x["document_path"]), x["code"]) for x in
                         r["violations"]))
            for r in (vv.asDict(recursive=True) for vv in
                      (row for row in v2.annotate(df).collect()))]
    got3 = [tuple(sorted((tuple(x["document_path"]), x["code"]) for x in
                         r["violations"]))
            for r in (vv.asDict(recursive=True) for vv in
                      (row for row in v3.annotate(df).collect()))]
    assert got2 == got3


def test_fuzz_ignore_none_values_matches_reference(spark):
    """Soak: random flat schemas × None-bearing rows under
    null_semantics='none' + ignore_none_values=True, vs the live
    reference with the same flag."""
    rng = random.Random(31337)
    failures = []
    for case_i in range(12):
        schema, ddl, fields, rows, require_all = _gen_case(rng)
        df = spark.createDataFrame(rows, ddl)
        v = SparkValidator(schema, allow_unknown=True, require_all=require_all,
                           null_semantics="none", ignore_none_values=True)
        annotated = v.annotate(df).collect()
        docs = [dict(zip(fields, r)) for r in rows]  # Nones KEPT
        m = compare_per_row(annotated, docs, schema, require_all=require_all,
                            normalize=False, ignore_none_values=True)
        if m:
            failures.append({"case": case_i, "schema": schema, "first": m[0]})
    assert failures == [], failures[:2]


def test_coerce_failure_value_semantics_per_type(spark):
    """r4 VERDICT item 7 — per-type pin of what a FAILED coercion leaves
    in the normalized value.  Reference (__normalize_coerce,
    validator.py:745-767): the chain breaks at the first failing step
    and the field keeps that step's INPUT.  Engine: restores that value
    whenever the normalized column TYPE can hold it (string→string
    chains, items elements, map payloads); when the chain changes the
    column type (string→bigint) the original cannot live in the typed
    output column and stays NULL — the remaining deviation, asserted
    here against the live reference so a behavior change on either side
    fails loudly."""
    from pyspark.sql import functions as F, types as T

    def eng_fail_on_bad(col, dtype):
        return F.when(col != "bad", col), T.StringType()

    def ref_fail_on_bad(v):
        if v == "bad":
            raise ValueError("bad")
        return v

    def eng_strip(col, dtype):
        return F.trim(col), T.StringType()

    def eng_int(col, dtype):
        return col.try_cast(T.LongType()), T.LongType()

    # 1) same-type chain: engine ≡ reference (keeps the failing step's
    # input — here the STRIPPED value, not the raw original)
    eng_schema = {"s": {"coerce": [eng_strip, eng_fail_on_bad]}}
    ref_schema = {"s": {"coerce": [str.strip, ref_fail_on_bad]}}
    rows = [("  bad  ",), ("  ok  ",), (None,)]
    df = spark.createDataFrame(rows, "s string")
    got = SparkValidator(eng_schema, allow_unknown=True).annotate(df).collect()
    ref = cerberus.Validator(ref_schema, allow_unknown=True)
    for r, srow in zip(rows, got):
        doc = {"s": r[0]} if r[0] is not None else {}
        ref.validate(dict(doc))
        assert srow["s"] == ref.document.get("s"), (r, srow["s"], ref.document)
        eng_failed = bool(srow["violations"])
        ref_failed = bool(ref._errors)
        assert eng_failed == ref_failed, (r, srow, ref._errors)

    # 2) type-changing chain: reference keeps the string; the engine's
    # bigint column cannot — NULL deviation, both sides pinned
    got2 = SparkValidator({"n": {"coerce": [eng_int]}},
                          allow_unknown=True).annotate(
        spark.createDataFrame([("xx",), ("7",)], "n string")).collect()
    assert got2[0]["n"] is None and got2[0]["violations"]  # deviation: NULL
    assert got2[1]["n"] == 7 and not got2[1]["violations"]
    ref2 = cerberus.Validator({"n": {"coerce": [int]}}, allow_unknown=True)
    ref2.validate({"n": "xx"})
    assert ref2.document["n"] == "xx" and ref2._errors  # reference keeps it

    # 3) items elements (same-typed by construction): kept like reference
    got3 = SparkValidator(
        {"xs": {"items": [{"coerce": [eng_fail_on_bad]},
                          {"coerce": [eng_fail_on_bad]}]}},
        allow_unknown=True).annotate(
        spark.createDataFrame([(["bad", "ok"],)], "xs array<string>")).collect()
    assert got3[0]["xs"] == ["bad", "ok"]
    assert len(got3[0]["violations"]) == 1

    # 4) dynamic map payloads via valuesrules: kept like reference
    got4 = SparkValidator(
        {"m": {"valuesrules": {"coerce": [eng_fail_on_bad]}}},
        allow_unknown=True).annotate(
        spark.createDataFrame([({"a": "bad", "b": "ok"},)],
                              "m map<string,string>")).collect()
    assert got4[0]["m"] == {"a": "bad", "b": "ok"}


def test_fuzz_none_mode_normalization_matches_reference(spark):
    """'none'-semantics NORMALIZATION parity (r5): renames MOVE
    present-None keys — the reference iterates tuple(mapping), a
    membership test, so a None source moves, clobbers its target, and
    chains compose through it — and __normalize_default_fields
    (validator.py:944-953) fills defaults for non-nullable present-None
    fields.  A typed column cannot distinguish a DELETED key from a
    present-None one (deviation #1), so parity is per-key value
    equality with None≡NULL on the union of both key sets.  Also pins
    that ignore_none_values changes NOTHING about normalization."""
    from pyspark.sql import functions as F  # noqa: F401

    rng = random.Random(2718)
    failures = []
    for case_i in range(20):
        n_fields = rng.randint(2, 5)
        fields = [f"f{i}" for i in range(n_fields)]
        name_pool = fields + ["g0", "g1"]
        schema = {}
        for f in fields:
            r = {}
            roll = rng.random()
            if roll < 0.45:
                r["rename"] = rng.choice([n for n in name_pool if n != f])
            elif roll < 0.75:
                r["default"] = f"D{f}"
                if rng.random() < 0.5:
                    r["nullable"] = True
            else:
                r["type"] = "string"
            schema[f] = r
        rows = [tuple(rng.choice(["A", "B", None]) for _ in fields)
                for _ in range(25)]
        ddl = ", ".join(f"{f} string" for f in fields)
        df = spark.createDataFrame(rows, ddl)
        v = SparkValidator(schema, allow_unknown=True, null_semantics="none")
        got = v.normalized(df).collect()
        got_ign = SparkValidator(
            schema, allow_unknown=True, null_semantics="none",
            ignore_none_values=True).normalized(df).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in got_ign], \
            ("ignore_none_values changed normalization", case_i, schema)
        ref = cerberus.Validator(schema, allow_unknown=True)
        for row_i, (r, srow) in enumerate(zip(rows, got)):
            doc = dict(zip(fields, r))  # Nones KEPT: present keys
            ref_doc = ref.normalized(dict(doc))
            row_d = srow.asDict()
            bad = {k: (ref_doc.get(k), row_d.get(k))
                   for k in set(ref_doc) | set(row_d)
                   if ref_doc.get(k) != row_d.get(k)}
            if bad:
                failures.append({"case": case_i, "row": row_i,
                                 "schema": schema, "in": doc,
                                 "diff": bad, "ref": ref_doc})
    assert failures == [], (len(failures), failures[:3])


def test_none_mode_raising_coercer_on_none_deviation(spark):
    """'none' mode + present-None + a coercer whose Python twin RAISES
    on None: the reference files COERCION_FAILED during NORMALIZATION
    (ignore_none_values does not gate coercion — __normalize_coerce,
    validator.py:762-767), while the engine's Column coercers are TOTAL
    on NULL (null in → null out, no way to raise per-row) and file
    nothing.  Documented deviation (#6 in COVERAGE.md), both sides
    pinned so a change in either fails loudly."""
    from pyspark.sql import functions as F, types as T

    def eng_strip(col, dtype):
        return F.trim(col), T.StringType()

    df = spark.createDataFrame([(None,), (" x ",)], "s string")

    # not nullable: reference files COERCION_FAILED (0x61) from the
    # coercion attempt PLUS NOT_NULLABLE (0x23) from validation; the
    # engine files only NOT_NULLABLE — the 0x61 is the deviation
    got = SparkValidator({"s": {"coerce": [eng_strip]}}, allow_unknown=True,
                         null_semantics="none").annotate(df).collect()
    assert [v["code"] for v in got[0]["violations"]] == [0x23]
    assert got[0]["s"] is None and got[1]["s"] == "x"
    ref = cerberus.Validator({"s": {"coerce": [str.strip]}}, allow_unknown=True)
    ref.validate({"s": None})
    assert {int(e.code) for e in ref._errors} == {0x61, 0x23}

    # nullable=True: the reference SWALLOWS the coercer exception
    # (validator.py:765 `not (nullable and value is None)`) — both sides
    # agree on zero violations, so the deviation is exactly the
    # not-nullable case above
    got2 = SparkValidator({"s": {"coerce": [eng_strip], "nullable": True}},
                          allow_unknown=True,
                          null_semantics="none").annotate(df).collect()
    assert not got2[0]["violations"]
    ref2 = cerberus.Validator(
        {"s": {"coerce": [str.strip], "nullable": True}}, allow_unknown=True)
    assert ref2.validate({"s": None}) and not ref2._errors
