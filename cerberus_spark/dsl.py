"""Schema DSL: parse, expand, validate and hash rule-set schemas.

The user-facing schema language is the reference engine's declarative
dict-of-rules format, kept verbatim because it is already serializable
(reference: /root/reference/cerberus/docs/schemas.rst).  This module
re-derives (from scratch, driver-side pure Python) the compile-time
transformations the reference applies:

* logical-shortcut expansion  ``anyof_regex: [a, b]`` →
  ``anyof: [{regex: a}, {regex: b}]``   (reference: schema.py:135-156)
* deprecated-name rewriting   ``keyschema``→``keysrules``,
  ``valueschema``→``valuesrules``, ``validator``→``check_with``
  (reference: schema.py:218-247)
* recursive expansion into ``schema``/``*of``/``items``/``keysrules``/
  ``valuesrules`` sub-definitions (reference: schema.py:158-196)
* registry resolution for by-name schema / rules-set references
  (reference: schema.py:473-554)
* schema-of-schemas validation → ``SchemaError`` before any Spark job
  launches (reference: schema.py:252-283)
* a canonical, order-stable hash of the expanded schema — the
  compile-cache key and the checkpoint lineage key
  (reference analog: utils.py:57-84 ``mapping_to_frozenset``)
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Mapping, Sequence

LOGICAL_OPS = ("allof", "anyof", "noneof", "oneof")

#: rules understood by the compiler (validation + normalization).
VALID_RULES = frozenset(
    {
        "allow_unknown", "allowed", "allof", "anyof", "check_with", "coerce",
        "contains", "default", "default_setter", "dependencies", "empty",
        "excludes", "forbidden", "items", "keysrules", "max", "maxlength",
        "meta", "min", "minlength", "noneof", "nullable", "oneof", "purge_unknown",
        "readonly", "regex", "rename", "rename_handler", "require_all",
        "required", "schema", "type", "valuesrules",
    }
)

NORMALIZATION_RULES = frozenset(
    {"coerce", "rename", "rename_handler", "purge_unknown", "default",
     "default_setter"}
)

#: rule names accepted for backward compatibility with older schemas
#: (reference: schema.py:218-247).
DEPRECATED_RENAMES = {
    "keyschema": "keysrules",
    "valueschema": "valuesrules",
    "validator": "check_with",
}

TYPE_NAMES = frozenset(
    {"string", "integer", "float", "number", "boolean", "binary", "date",
     "datetime", "dict", "list", "set", "container"}
)


class SchemaError(Exception):
    """Raised when a schema is malformed (reference: schema.py:268-283)."""


class Registry:
    """Named store for schemas or rules-sets (reference: schema.py:473-554)."""

    def __init__(self, definitions: Mapping | None = None):
        self._storage: dict = {}
        if definitions:
            self.extend(definitions)

    def add(self, name: str, definition: Mapping) -> None:
        self._storage[name] = dict(definition)

    def extend(self, definitions: Mapping) -> None:
        for k, v in dict(definitions).items():
            self.add(k, v)

    def get(self, name: str, default=None):
        return self._storage.get(name, default)

    def remove(self, *names: str) -> None:
        for n in names:
            self._storage.pop(n, None)

    def clear(self) -> None:
        self._storage.clear()

    def all(self) -> dict:
        return dict(self._storage)


schema_registry = Registry()
rules_set_registry = Registry()


def _resolve(ref, registry: Registry, kind: str):
    if isinstance(ref, str):
        resolved = registry.get(ref)
        if resolved is None:
            raise SchemaError(f"unknown {kind} registry reference: {ref!r}")
        return resolved
    return ref


def expand_rules_set(rules, *, _depth: int = 0,
                     extra_rules: frozenset = frozenset()) -> dict:
    """Return a fully-expanded copy of one field's rules-set.

    ``extra_rules`` are custom rule names registered with the validator
    (``SparkValidator(rules={...})``) — the analog of the reference's
    ``_validate_<rule>`` subclass methods (validator.py:1584-1671,
    docs/customize.rst:21-67); they participate in the rules-set /
    field-mapping disambiguation below."""
    if _depth > 64:
        raise SchemaError("schema nesting exceeds 64 levels (cycle?)")
    rules = _resolve(rules, rules_set_registry, "rules-set")
    if not isinstance(rules, Mapping):
        raise SchemaError(f"rules-set must be a mapping, got {type(rules).__name__}")

    out: dict = {}
    for rule, constraint in rules.items():
        rule = DEPRECATED_RENAMES.get(rule, rule)
        # logical shortcut: anyof_regex / oneof_type / ...
        for op in LOGICAL_OPS:
            prefix = op + "_"
            if rule.startswith(prefix):
                base_rule = rule[len(prefix):]
                out[op] = [{base_rule: c} for c in constraint]
                break
        else:
            out[rule] = constraint

    # recurse
    if "schema" in out:
        sub = out["schema"]
        sub = _resolve(sub, schema_registry, "schema")
        if isinstance(sub, Mapping):
            if _looks_like_rules_set(sub, extra_rules):
                out["schema"] = expand_rules_set(sub, _depth=_depth + 1,
                                                 extra_rules=extra_rules)
            else:
                out["schema"] = expand_schema(sub, _depth=_depth + 1,
                                              extra_rules=extra_rules)
    for key in ("keysrules", "valuesrules", "allow_unknown"):
        if isinstance(out.get(key), Mapping):
            out[key] = expand_rules_set(out[key], _depth=_depth + 1,
                                        extra_rules=extra_rules)
    if "items" in out and isinstance(out["items"], Sequence):
        out["items"] = [expand_rules_set(i, _depth=_depth + 1,
                                         extra_rules=extra_rules)
                        for i in out["items"]]
    for op in LOGICAL_OPS:
        if op in out:
            if not isinstance(out[op], Sequence) or isinstance(out[op], str):
                raise SchemaError(f"'{op}' constraint must be a list of rules-sets")
            out[op] = [expand_rules_set(d, _depth=_depth + 1,
                                        extra_rules=extra_rules)
                       for d in out[op]]
    return out


def _norm_rule_name(name: str) -> str:
    """Schema references to custom methods may use spaces instead of
    underscores ('is odd' ≡ 'is_odd', docs/customize.rst:16-18)."""
    return name.replace(" ", "_")


def _looks_like_rules_set(mapping: Mapping,
                          extra_rules: frozenset = frozenset()) -> bool:
    """Disambiguate `schema`-as-rules-set (list elements) from
    `schema`-as-field-mapping (dict fields), like the reference does by
    attempting both interpretations (schema.py:420-436)."""
    if not mapping:
        return False
    return all(isinstance(k, str) and (k in VALID_RULES or k in DEPRECATED_RENAMES
               or _norm_rule_name(k) in extra_rules)
               for k in mapping)


def expand_schema(schema, *, _depth: int = 0,
                  extra_rules: frozenset = frozenset()) -> dict:
    """Expand a full {field: rules_set} schema (reference: schema.py:122-133)."""
    schema = _resolve(schema, schema_registry, "schema")
    if not isinstance(schema, Mapping):
        raise SchemaError("validation schema must be a mapping")
    return {
        field: expand_rules_set(rules, _depth=_depth + 1, extra_rules=extra_rules)
        for field, rules in schema.items()
    }


def _is_listish(x) -> bool:
    return isinstance(x, Sequence) and not isinstance(x, str)


def _callable_or_name(x) -> bool:
    return callable(x) or isinstance(x, str)


def validate_rules_set(field: str, rules: Mapping,
                       extra_types: frozenset = frozenset(),
                       custom_rules: Mapping = {}) -> None:
    """Validate ONE rules-set's constraint shapes, recursing into every
    nested definition (reference: the introspected SchemaValidatorMixin,
    schema.py:252-283 + 310-467 — each ``_validate_*`` docstring pins its
    constraint's own schema; this re-derives the same shape table).

    ``extra_types`` are custom type names registered with the validator
    (the analog of extending ``types_mapping``, docs/customize.rst).
    ``custom_rules`` maps registered custom rule names to their
    implementations (the analog of ``_validate_<rule>`` subclass
    methods); a rule fn may carry a ``check_constraint(c)`` attribute —
    the engine's version of the reference's docstring constraint schema
    (docs/customize.rst:61-67) — which gates the constraint shape here,
    before any Spark job launches."""
    if not isinstance(rules, Mapping):
        raise SchemaError(f"schema definition for field '{field}' must be a dict")
    for rule, c in rules.items():
        if rule not in VALID_RULES:
            cname = _norm_rule_name(rule)
            fn = custom_rules.get(cname)
            if fn is None:
                raise SchemaError(f"field '{field}': unknown rule '{rule}'")
            chk = getattr(fn, "check_constraint", None)
            if chk is not None:
                try:
                    ok = chk(c)
                except Exception:
                    ok = False
                if ok is False:
                    raise SchemaError(
                        f"field '{field}': invalid constraint {c!r} for "
                        f"custom rule '{cname}'")
            continue
        if rule == "type":
            names = [c] if isinstance(c, str) else list(c) if _is_listish(c) else None
            if names is None:
                raise SchemaError(f"field '{field}': 'type' must be a name or list of names")
            for n in names:
                if n not in TYPE_NAMES and n not in extra_types:
                    raise SchemaError(f"field '{field}': unknown type '{n}'")
        elif rule in ("required", "nullable", "readonly", "empty",
                      "require_all", "purge_unknown"):
            if not isinstance(c, bool):
                raise SchemaError(f"field '{field}': '{rule}' must be boolean")
        elif rule in ("minlength", "maxlength"):
            if not isinstance(c, int) or isinstance(c, bool) or c < 0:
                raise SchemaError(f"field '{field}': '{rule}' must be a non-negative integer")
        elif rule == "regex":
            if not isinstance(c, str):
                raise SchemaError(f"field '{field}': 'regex' must be a string")
        elif rule in ("allowed", "forbidden"):
            # reference: {'type': 'container_but_not_string'} (schema.py:344-352)
            if not _is_listish(c) and not isinstance(c, (set, frozenset)):
                raise SchemaError(f"field '{field}': '{rule}' must be a collection")
        elif rule == "dependencies":
            # reference: ('dict', 'hashable', 'list') (validator.py:1183)
            if isinstance(c, Mapping):
                for k in c:
                    if not isinstance(k, str):
                        raise SchemaError(
                            f"field '{field}': 'dependencies' keys must be field names")
            elif not isinstance(c, str) and not _is_listish(c):
                raise SchemaError(
                    f"field '{field}': 'dependencies' must be a field name, list, or mapping")
        elif rule == "excludes":
            # reference: hashable or list of hashables (schema.py:401-412)
            if not isinstance(c, str) and not (
                _is_listish(c) and all(isinstance(x, str) for x in c)
            ):
                raise SchemaError(
                    f"field '{field}': 'excludes' must be a field name or list of names")
        elif rule in ("coerce", "check_with", "rename_handler"):
            # reference: callable / registry name / list thereof
            # (schema.py:354-372, 390-399)
            items = c if _is_listish(c) else [c]
            if not all(_callable_or_name(x) for x in items):
                raise SchemaError(
                    f"field '{field}': '{rule}' must be callable(s) or registered name(s)")
        elif rule == "rename":
            if not isinstance(c, str):
                raise SchemaError(f"field '{field}': 'rename' must be a string")
        elif rule == "default_setter":
            if not _callable_or_name(c):
                raise SchemaError(
                    f"field '{field}': 'default_setter' must be callable or a registered name")
        elif rule == "items":
            # reference: list of rules-sets (validator.py:1272 docstring)
            if not _is_listish(c) or not all(isinstance(d, Mapping) for d in c):
                raise SchemaError(f"field '{field}': 'items' must be a list of rules-sets")
            for i, d in enumerate(c):
                validate_rules_set(f"{field}[{i}]", d, extra_types, custom_rules)
        elif rule in ("keysrules", "valuesrules"):
            if not isinstance(c, Mapping):
                raise SchemaError(f"field '{field}': '{rule}' must be a rules-set mapping")
            validate_rules_set(f"{field}.{rule}", c, extra_types, custom_rules)
        elif rule == "allow_unknown":
            if isinstance(c, Mapping):
                validate_rules_set(f"{field}.allow_unknown", c, extra_types, custom_rules)
            elif not isinstance(c, bool):
                raise SchemaError(
                    f"field '{field}': 'allow_unknown' must be boolean or a rules-set")
        elif rule in LOGICAL_OPS:
            if not _is_listish(c) or not all(isinstance(d, Mapping) for d in c):
                raise SchemaError(f"field '{field}': '{rule}' must be a list of rules-sets")
            for i, d in enumerate(c):
                # normalization rules are invalid inside *of definitions
                # (reference: test_schema.py::
                #  test_normalization_rules_are_invalid_in_of_rules)
                bad = NORMALIZATION_RULES.intersection(d)
                if bad:
                    raise SchemaError(
                        f"field '{field}': normalization rule(s) {sorted(bad)} "
                        f"not allowed inside '{rule}'")
                validate_rules_set(f"{field}.{rule}[{i}]", d, extra_types, custom_rules)
        elif rule == "schema":
            if not isinstance(c, Mapping):
                raise SchemaError(f"field '{field}': 'schema' must be a mapping")
            if _looks_like_rules_set(c, frozenset(custom_rules)):
                validate_rules_set(f"{field}.schema", c, extra_types, custom_rules)
            else:
                validate_schema(c, extra_types, custom_rules)
        # 'min'/'max'/'contains'/'default'/'meta': any value is legal
        # (reference declares no constraint schema for them)


def validate_schema(schema: Mapping,
                    extra_types: frozenset = frozenset(),
                    custom_rules: Mapping = {}) -> None:
    """Schema-of-schemas check: raise SchemaError on unknown rules or
    malformed constraints before any Spark job launches
    (reference: schema.py:252-283 + SchemaValidatorMixin checks)."""
    if not isinstance(schema, Mapping):
        raise SchemaError("validation schema must be a mapping")
    for field, rules in schema.items():
        validate_rules_set(field, rules, extra_types, custom_rules)


def _canonicalize(obj):
    """JSON-stable representation; callables hash by qualified name."""
    if isinstance(obj, Mapping):
        return {str(k): _canonicalize(v) for k, v in sorted(obj.items(), key=lambda kv: str(kv[0]))}
    if isinstance(obj, (list, tuple)):
        return [_canonicalize(x) for x in obj]
    if isinstance(obj, (set, frozenset)):
        return sorted(_canonicalize(x) for x in obj)
    if callable(obj):
        return f"<callable:{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', repr(obj))}>"
    return obj


def schema_hash(schema: Mapping) -> str:
    """Deterministic hash of an (expanded) schema.

    Serves as both the compile-once cache key (reference analog:
    validator.py:136-140 memo of hashed schemas) and the checkpoint
    lineage key required by the north rule ("rule-schema hash").
    """
    payload = json.dumps(_canonicalize(schema), sort_keys=True, separators=(",", ":"),
                         default=str)
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


class RuleSetSchema:
    """A parsed + expanded + validated schema, ready for compilation."""

    def __init__(self, schema: Mapping, extra_type_names=(),
                 custom_rules: Mapping | None = None):
        self.raw = dict(schema)
        custom_rules = dict(custom_rules or {})
        self.expanded = expand_schema(
            schema, extra_rules=frozenset(custom_rules))
        validate_schema(self.expanded, frozenset(extra_type_names), custom_rules)
        self.hash = schema_hash(self.expanded)

    def __getitem__(self, field):
        return self.expanded[field]

    def __iter__(self):
        return iter(self.expanded)

    def items(self):
        return self.expanded.items()

    def fields(self):
        return list(self.expanded)
