"""Differential oracle: run the reference engine row-by-row and compare.

The reference (pyeve/cerberus at /root/reference) is imported directly
and driven over the SAME rows the Spark engine validates; both sides'
errors are normalized to comparable tuples.  This reproduces the
oracle protocol of SURVEY.md §5.2: per-row violation parity under
stable row ordering, plus per-row normalized-value equality.

Only used by tests / parity tooling at small scale — the reference is
single-threaded pure Python (never on the hot path).
"""

from __future__ import annotations

import sys
from collections.abc import Mapping

_REFERENCE_PATH = "/root/reference"


def load_reference():
    """Import the reference cerberus package; None when unavailable."""
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    try:
        import cerberus  # noqa

        return cerberus
    except Exception:
        return None


def _drop_nulls(value):
    if isinstance(value, Mapping):
        return {k: _drop_nulls(v) for k, v in value.items() if v is not None}
    if isinstance(value, list):
        return [_drop_nulls(v) for v in value]
    return value


def row_to_doc(row: Mapping, schema: Mapping, null_semantics: str = "absent") -> dict:
    """Convert one Spark row (as dict) to a reference document honoring
    the NULL convention (SURVEY.md §1.4):

    * 'absent' — NULL values are dropped at every mapping level
                 (Spark structs materialize all fields; a NULL struct
                 field means the key was never set)
    * 'none'   — NULL columns become present ``None`` values
    """
    if null_semantics == "absent":
        return _drop_nulls(dict(row))
    return dict(row)


# Group errors are flattened into their child leaves; logical errors
# (0x91-0x94) are kept as single leaves and their children discarded —
# matching what the Spark compiler emits.
_LOGICAL_CODES = {0x91, 0x92, 0x93, 0x94}


def flatten_reference_errors(errs) -> list[tuple]:
    """reference ValidationError list → [(doc_path, schema_path, code, rule)]"""
    out = []
    for e in errs:
        if e.code in _LOGICAL_CODES or not e.is_group_error:
            # require_all required errors carry the literal STRING
            # '__require_all__' as schema_path (validator.py:300-304)
            spath = (
                (e.schema_path,) if isinstance(e.schema_path, str)
                else tuple(str(p) for p in e.schema_path)
            )
            out.append(
                (
                    tuple(str(p) for p in e.document_path),
                    spath,
                    int(e.code),
                    e.rule,
                )
            )
        else:
            out.extend(flatten_reference_errors(e.child_errors or []))
    return out


def reference_validate(docs, schema, *, allow_unknown=True, require_all=False,
                       normalize=True, validator_cls=None,
                       ignore_none_values=False):
    """Run the reference validator over documents.

    ``validator_cls`` swaps in a Validator subclass (custom
    ``_validate_<rule>`` methods etc. — docs/customize.rst).
    Returns (per-doc error tuple lists, per-doc normalized documents).
    """
    cerberus = load_reference()
    if cerberus is None:
        raise RuntimeError("reference cerberus not importable")
    cls = validator_cls or cerberus.Validator
    v = cls(schema, allow_unknown=allow_unknown,
            require_all=require_all, ignore_none_values=ignore_none_values)
    all_errors, all_normalized = [], []
    for doc in docs:
        ok = v.validate(doc, normalize=normalize)
        all_errors.append(sorted(flatten_reference_errors(v._errors)))
        all_normalized.append(dict(v.document) if v.document is not None else None)
        del ok
    return all_errors, all_normalized


def spark_violation_tuples(violation_rows) -> list[tuple]:
    """Collected Spark violation rows → comparable tuples."""
    return sorted(
        (tuple(r["document_path"]), tuple(r["schema_path"]), int(r["code"]), r["rule"])
        for r in violation_rows
    )


def compare_per_row(spark_annotated_rows, docs, schema, *, allow_unknown=True,
                    require_all=False, normalize=True, ignore_codes=frozenset(),
                    validator_cls=None, ignore_none_values=False):
    """Compare the Spark engine's per-row violations against the
    reference, row-aligned.  Returns a list of mismatch descriptions
    (empty == parity)."""
    ref_errors, _ = reference_validate(
        docs, schema, allow_unknown=allow_unknown, require_all=require_all,
        normalize=normalize, validator_cls=validator_cls,
        ignore_none_values=ignore_none_values,
    )
    mismatches = []
    for i, (row, expected) in enumerate(zip(spark_annotated_rows, ref_errors)):
        got = spark_violation_tuples(
            [v.asDict(recursive=True) for v in row["violations"]]
        )
        got = [t for t in got if t[2] not in ignore_codes]
        expected = [t for t in expected if t[2] not in ignore_codes]
        if got != expected:
            mismatches.append(
                {"row": i, "doc": docs[i], "expected": expected, "got": got}
            )
    return mismatches
