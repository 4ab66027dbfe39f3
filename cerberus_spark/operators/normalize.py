"""Normalization operators: rename → purge → defaults → coerce.

Re-expresses the reference's normalization pipeline
(/root/reference/cerberus/validator.py:690-710 fixed stage order;
docs/normalization-rules.rst) as column-level transforms computed in the
same single projection as validation — normalized values feed the rule
predicates directly, exactly like the reference validates the
*normalized copy* of each document (validator.py:1032-1033).

Stage mapping (reference → Spark):

* ``rename``          validator.py:900-918  → select-alias (compile time)
* ``purge_unknown``   validator.py:893-898  → drop columns (compile time)
* ``purge_readonly``  validator.py:887-891  → drop columns (compile time)
* ``default``         validator.py:947-963  → ``coalesce(col, lit(default))``
* ``default_setter``  validator.py:965-1005 → registered Column-builder over
                       the row; cycles detected by compile-time topo sort
* ``coerce``          validator.py:712-767  → ``try_cast`` / Column fn /
                       vectorized pandas UDF; failure → COERCION_FAILED
                       violation row (value kept as NULL — documented
                       deviation: the reference keeps the un-coerced value,
                       a single-typed Spark column cannot)
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Callable

from pyspark.sql import Column, functions as F, types as T

from .. import errors as E
from ..dsl import SchemaError
from .compile import make_violation, collect_violations, empty_violations, stringify

# ---------------------------------------------------------------------------
# coercer registry — named, vectorized coercers (reference: named coercers
# resolved via _normalize_coerce_* reflection, docs/customize.rst:116-150)
# ---------------------------------------------------------------------------

CoercerFn = Callable[[Column, T.DataType], tuple[Column, T.DataType]]

_BUILTIN_COERCERS: dict[str, CoercerFn] = {}


def register_coercer(name: str):
    def deco(fn: CoercerFn):
        _BUILTIN_COERCERS[name] = fn
        return fn
    return deco


@register_coercer("to_int")
def _to_int(col, dtype):
    return col.try_cast(T.LongType()), T.LongType()


@register_coercer("to_float")
def _to_float(col, dtype):
    return col.try_cast(T.DoubleType()), T.DoubleType()


@register_coercer("to_string")
def _to_string(col, dtype):
    return stringify(col, dtype), T.StringType()


@register_coercer("to_bool")
def _to_bool(col, dtype):
    return col.try_cast(T.BooleanType()), T.BooleanType()


@register_coercer("to_datetime")
def _to_datetime(col, dtype):
    return col.try_cast(T.TimestampType()), T.TimestampType()


@register_coercer("strip")
def _strip(col, dtype):
    return F.trim(col), T.StringType()


@register_coercer("lower")
def _lower(col, dtype):
    return F.lower(col), T.StringType()


@register_coercer("upper")
def _upper(col, dtype):
    return F.upper(col), T.StringType()


class Normalizer:
    """Compiles the normalization rules of a schema into
    (normalized column map, violations array, output dtypes)."""

    def __init__(self, coercers: Mapping[str, CoercerFn] | None = None,
                 setters: Mapping[str, Callable] | None = None,
                 null_semantics: str = "absent"):
        self.coercers = dict(_BUILTIN_COERCERS)
        if coercers:
            self.coercers.update(coercers)
        self.setters = dict(setters or {})
        self.null_semantics = null_semantics

    # -- compile-time column-set operations ---------------------------------

    def plan_columns(self, schema: Mapping, input_cols: list[str],
                     *, purge_unknown: bool = False, key_cols: tuple = ()) -> dict[str, str]:
        """Resolve rename/purge into an {output_name: input_name} map.

        reference: rename validator.py:900-918, purge_unknown 893-898,
        purge_readonly 887-891 — all compile-time for fixed columns.
        """
        renames = {}
        for fname, rules in schema.items():
            if "rename" in rules:
                renames[fname] = rules["rename"]
        out: dict[str, str] = {}
        known_targets = set(schema) | set(key_cols)
        for col in input_cols:
            target = renames.get(col, col)
            if purge_unknown and target not in known_targets:
                continue
            out[target] = col
        return out

    # -- per-field value normalization ---------------------------------------

    def normalize_field(
        self, fname: str, rules: Mapping, value: Column, dtype: T.DataType,
        doc_path: list, spath: list,
    ) -> tuple[Column, T.DataType, Column]:
        """Returns (normalized value, output dtype, violations array)."""
        violations = []
        original, original_dtype = value, dtype

        # coerce chain (reference: validator.py:712-767)
        if "coerce" in rules:
            chain = rules["coerce"]
            if isinstance(chain, str) or callable(chain):
                chain = [chain]
            for c in chain:
                name = c if isinstance(c, str) else getattr(c, "__name__", None)
                fn = self.coercers.get(name) if isinstance(c, str) else c
                if fn is None:
                    raise SchemaError(f"coerce: no registered coercer named '{c}'")
                value, dtype = fn(value, dtype)
            # COERCION_FAILED: result NULL though input wasn't
            # (reference keeps the old value + files 0x61; validator.py:762-767)
            failed = value.isNull() & original.isNotNull()
            violations.append(
                make_violation(
                    failed, E.COERCION_FAILED, doc_path, spath + [fname, "coerce"],
                    constraint=str(rules["coerce"]),
                    value=original, value_dtype=original_dtype,
                )
            )

        # default fill (reference: validator.py:947-963 — fires on missing
        # key, or on None when the field is not nullable)
        if "default" in rules:
            default = rules["default"]
            nullable = bool(rules.get("nullable", False))
            if default is None:
                pass  # default None on a NULL column is the identity
            elif not nullable or self.null_semantics == "absent":
                value = F.coalesce(value, F.lit(default).cast(dtype))

        if "default_setter" in rules:
            setter = rules["default_setter"]
            name = setter if isinstance(setter, str) else getattr(setter, "__name__", "?")
            fn = self.setters.get(name) if isinstance(setter, str) else setter
            if fn is None:
                raise SchemaError(f"default_setter: no registered setter named '{setter}'")
            # fn builds a Column from the full row scope: fn(F) -> Column
            try:
                computed = fn(F)
            except Exception as exc:  # setter construction failed at compile
                violations.append(
                    make_violation(
                        value.isNull(), E.SETTING_DEFAULT_FAILED,
                        doc_path, spath + [fname, "default_setter"],
                        constraint=name, info=str(exc),
                    )
                )
                computed = None
            if computed is not None:
                value = F.coalesce(value, computed.cast(dtype))

        arr = collect_violations(violations) if violations else empty_violations()
        return value, dtype, arr
