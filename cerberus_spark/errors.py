"""Error contract: codes, messages, and the violation-row schema.

Re-expresses the error model of the reference validation engine
(reference: /root/reference/cerberus/errors.py:27-80 for codes,
errors.py:469-506 for the message table) as a flat Spark-friendly
violation-row contract.  A violation row is one error for one input row:

    (document_path: array<string>, schema_path: array<string>,
     code: int, rule: string, constraint: string, value: string,
     info: string)

Row-key columns (e.g. conv_id, turn_idx) are prepended when the
per-row ``violations`` array is exploded into the violations table.

Codes < 0x100 match the reference bit-for-bit so its test suite can be
used as a differential oracle.  Codes >= 0x100 are new, dataset-level
constraint violations the reference cannot express (uniqueness,
referential, drift, ordering) — see SURVEY.md §2.5.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class ErrorDefinition:
    """An error code bound to the rule that raises it.

    Mirrors the (code, rule) pairs of the reference engine
    (/root/reference/cerberus/errors.py:5-23).
    """

    code: int
    rule: str | None

    @property
    def is_group_error(self) -> bool:
        """Bulk-validation errors carry the 0x80 bit (errors.py:179-181)."""
        return bool(self.code & ERROR_GROUP.code)

    @property
    def is_logic_error(self) -> bool:
        """*of-rule errors carry the 0x10 bit — LOGICAL - ERROR_GROUP
        (errors.py:183-188); note logic errors are ALSO group errors."""
        return bool(self.code & (LOGICAL.code - ERROR_GROUP.code))


# -- custom ---------------------------------------------------------------
CUSTOM = ErrorDefinition(0x00, None)

# -- existence ------------------------------------------------------------
DOCUMENT_MISSING = ErrorDefinition(0x01, None)
REQUIRED_FIELD = ErrorDefinition(0x02, "required")
UNKNOWN_FIELD = ErrorDefinition(0x03, None)
DEPENDENCIES_FIELD = ErrorDefinition(0x04, "dependencies")
DEPENDENCIES_FIELD_VALUE = ErrorDefinition(0x05, "dependencies")
EXCLUDES_FIELD = ErrorDefinition(0x06, "excludes")

# -- shape ----------------------------------------------------------------
DOCUMENT_FORMAT = ErrorDefinition(0x21, None)
EMPTY_NOT_ALLOWED = ErrorDefinition(0x22, "empty")
NOT_NULLABLE = ErrorDefinition(0x23, "nullable")
BAD_TYPE = ErrorDefinition(0x24, "type")
BAD_TYPE_FOR_SCHEMA = ErrorDefinition(0x25, "schema")
ITEMS_LENGTH = ErrorDefinition(0x26, "items")
MIN_LENGTH = ErrorDefinition(0x27, "minlength")
MAX_LENGTH = ErrorDefinition(0x28, "maxlength")

# -- value ----------------------------------------------------------------
REGEX_MISMATCH = ErrorDefinition(0x41, "regex")
MIN_VALUE = ErrorDefinition(0x42, "min")
MAX_VALUE = ErrorDefinition(0x43, "max")
UNALLOWED_VALUE = ErrorDefinition(0x44, "allowed")
UNALLOWED_VALUES = ErrorDefinition(0x45, "allowed")
FORBIDDEN_VALUE = ErrorDefinition(0x46, "forbidden")
FORBIDDEN_VALUES = ErrorDefinition(0x47, "forbidden")
MISSING_MEMBERS = ErrorDefinition(0x48, "contains")

# -- normalization --------------------------------------------------------
NORMALIZATION = ErrorDefinition(0x60, None)
COERCION_FAILED = ErrorDefinition(0x61, "coerce")
RENAMING_FAILED = ErrorDefinition(0x62, "rename_handler")
READONLY_FIELD = ErrorDefinition(0x63, "readonly")
SETTING_DEFAULT_FAILED = ErrorDefinition(0x64, "default_setter")

# -- groups ---------------------------------------------------------------
ERROR_GROUP = ErrorDefinition(0x80, None)
MAPPING_SCHEMA = ErrorDefinition(0x81, "schema")
SEQUENCE_SCHEMA = ErrorDefinition(0x82, "schema")
KEYSRULES = ErrorDefinition(0x83, "keysrules")
VALUESRULES = ErrorDefinition(0x84, "valuesrules")
BAD_ITEMS = ErrorDefinition(0x8F, "items")

# -- logical --------------------------------------------------------------
LOGICAL = ErrorDefinition(0x90, None)
NONEOF = ErrorDefinition(0x91, "noneof")
ONEOF = ErrorDefinition(0x92, "oneof")
ANYOF = ErrorDefinition(0x93, "anyof")
ALLOF = ErrorDefinition(0x94, "allof")

# -- dataset-level (NEW — not in the reference) ---------------------------
DATASET = ErrorDefinition(0x100, None)
NOT_UNIQUE = ErrorDefinition(0x101, "unique")
ORPHAN_REFERENCE = ErrorDefinition(0x102, "referential")
ORDERING_VIOLATION = ErrorDefinition(0x103, "ordering")
DRIFT_DETECTED = ErrorDefinition(0x104, "drift")
STATS_BOUND = ErrorDefinition(0x105, "stats")
DUPLICATE_CONTENT = ErrorDefinition(0x106, "dedup")
SEQUENCE_VIOLATION = ErrorDefinition(0x107, "sequence")


#: Message table (reference: errors.py:469-506, verbatim format strings);
#: 0x100+ entries are new.
MESSAGES: dict[int, str] = {
    0x00: "{0}",
    0x01: "document is missing",
    0x02: "required field",
    0x03: "unknown field",
    0x04: "field '{0}' is required",
    0x05: "depends on these values: {constraint}",
    0x06: "{0} must not be present with '{field}'",
    0x21: "'{0}' is not a document, must be a dict",
    0x22: "empty values not allowed",
    0x23: "null value not allowed",
    0x24: "must be of {constraint} type",
    0x25: "must be of dict type",
    0x26: "length of list should be {0}, it is {1}",
    0x27: "min length is {constraint}",
    0x28: "max length is {constraint}",
    0x41: "value does not match regex '{constraint}'",
    0x42: "min value is {constraint}",
    0x43: "max value is {constraint}",
    0x44: "unallowed value {value}",
    0x45: "unallowed values {0}",
    0x46: "unallowed value {value}",
    0x47: "unallowed values {0}",
    0x48: "missing members {0}",
    0x61: "field '{field}' cannot be coerced: {0}",
    0x62: "field '{field}' cannot be renamed: {0}",
    0x63: "field is read-only",
    0x64: "default value for '{field}' cannot be set: {0}",
    0x81: "mapping doesn't validate subschema: {0}",
    0x82: "one or more sequence-items don't validate: {0}",
    0x83: "one or more keys of a mapping  don't validate: {0}",
    0x84: "one or more values in a mapping don't validate: {0}",
    0x85: "one or more sequence-items don't validate: {0}",
    0x91: "one or more definitions validate",
    0x92: "none or more than one rule validate",
    0x93: "no definitions validate",
    0x94: "one or more definitions don't validate",
    0x101: "duplicate key: {constraint}",
    0x102: "orphan reference: {constraint}",
    0x103: "ordering violation: {constraint}",
    0x104: "distribution drift: {constraint}",
    0x105: "column statistic out of bounds: {constraint}",
    0x107: "sequence violation: {constraint}",
}


#: Spark schema of one violation (one element of the per-row array).
VIOLATION_STRUCT = T.StructType(
    [
        T.StructField("document_path", T.ArrayType(T.StringType(), False), True),
        T.StructField("schema_path", T.ArrayType(T.StringType(), False), True),
        T.StructField("code", T.IntegerType(), True),
        T.StructField("rule", T.StringType(), True),
        T.StructField("constraint", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("info", T.StringType(), True),
    ]
)

VIOLATION_FIELD_NAMES = [f.name for f in VIOLATION_STRUCT.fields]


def format_message(code: int, *, constraint=None, value=None, field=None, info=()) -> str:
    """Render the human-readable message for a violation row.

    Driver-side formatter equivalent to the reference's BasicErrorHandler
    message rendering (errors.py:511-560); operates on violation-row
    fields instead of ValidationError objects.
    """
    template = MESSAGES.get(code, "unknown error code 0x{:x}".format(code))
    args = tuple(info) if isinstance(info, (list, tuple)) else (info,)
    try:
        return template.format(*args, constraint=constraint, value=value, field=field)
    except (IndexError, KeyError):
        return template


_LOGICAL_RULE_NAMES = ("anyof", "allof", "noneof", "oneof")


def _get(r, key):
    return (r.get(key) if isinstance(r, dict) else getattr(r, key))


def _logical_child_label(schema_path) -> str | None:
    """'anyof definition 0'-style label when the row is a *of child
    error (schema_path [..., op, i, rule]) — the reference
    BasicErrorHandler's path rewriting (errors.py:618-650)."""
    sp = list(schema_path or [])
    for j, el in enumerate(sp):
        if el in _LOGICAL_RULE_NAMES and j + 1 < len(sp) and str(sp[j + 1]).isdigit():
            return f"{el} definition {int(sp[j + 1])}"
    return None


def error_tree(violation_rows) -> dict:
    """Assemble collected violation rows into a nested Cerberus-style
    ``{field: [message | {subfield: [...]}]}`` tree (driver-side; the
    analog of BasicErrorHandler, errors.py:511-560 + the *of child path
    rewriting at errors.py:618-650: child errors of a failed logical
    rule land under '{op} definition {i}' buckets, exactly like the
    reference's ``validator.errors`` output).

    ``violation_rows`` is an iterable of Row/dict with the
    VIOLATION_STRUCT fields.  Intended for small, per-document result
    sets (debugging / parity tests) — never call on a full table.
    """
    rows = sorted(
        violation_rows,
        key=lambda r: (list(_get(r, "document_path") or []),
                       [str(p) for p in (_get(r, "schema_path") or [])]),
    )
    tree: dict = {}
    for r in rows:
        path = list(_get(r, "document_path") or [])
        msg = format_message(
            _get(r, "code"),
            constraint=_get(r, "constraint"),
            value=_get(r, "value"),
            field=path[-1] if path else None,
            info=(_get(r, "info"),) if _get(r, "info") else (),
        )
        node = tree
        for i, key in enumerate(path):
            bucket = node.setdefault(key, [])
            if i == len(path) - 1:
                label = _logical_child_label(_get(r, "schema_path"))
                if label is not None:
                    sub = next((x for x in bucket if isinstance(x, dict)), None)
                    if sub is None:
                        sub = {}
                        bucket.append(sub)
                    sub.setdefault(label, []).append(msg)
                else:
                    bucket.append(msg)
            else:
                sub = None
                for item in bucket:
                    if isinstance(item, dict):
                        sub = item
                        break
                if sub is None:
                    sub = {}
                    bucket.append(sub)
                node = sub
    return tree


class BaseErrorHandler:
    """Pluggable driver-side error formatter — the analog of the
    reference's handler ABC (reference errors.py:358-446): a handler is
    a callable collecting violation ROWS (dict/Row with the
    VIOLATION_STRUCT fields — the engine's ValidationError analog) and
    rendering them in whatever shape the caller wants.  Inject via
    ``SparkValidator(error_handler=...)`` (class, instance, or
    ``(class, config_dict)`` tuple, exactly the reference's accepted
    shapes, validator.py:194-207); ``ValidationResult.errors()`` then
    renders through it.

    Subclasses implement ``__call__`` (and usually ``add``); ``emit``/
    ``start``/``end`` are optional stream-style hooks kept for API
    parity."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, violation_rows):
        raise NotImplementedError

    def __iter__(self):
        raise NotImplementedError

    def add(self, row):
        raise NotImplementedError

    def extend(self, rows):
        for r in rows:
            self.add(r)

    def emit(self, row):
        pass

    def clear(self):
        pass

    def start(self, result):
        pass

    def end(self, result):
        pass


class BasicErrorHandler(BaseErrorHandler):
    """Default handler: renders violation rows as the reference's
    legacy nested ``{field: [message | {subfield: [...]}]}`` dict
    (reference errors.py:461-560) via :func:`error_tree`."""

    messages = MESSAGES

    def __init__(self, tree: dict | None = None):
        self.rows: list = []
        self.tree: dict = {} if tree is None else tree

    def __call__(self, violation_rows):
        self.clear()
        self.extend(violation_rows)
        return self.pretty_tree

    def __iter__(self):
        return iter(self.rows)

    def add(self, row):
        self.rows.append(row)

    def clear(self):
        self.rows = []

    @property
    def pretty_tree(self) -> dict:
        self.tree = error_tree(self.rows)
        return self.tree

    def __str__(self):
        from pprint import pformat

        return pformat(self.pretty_tree)


class ToyErrorHandler(BaseErrorHandler):
    """Reference errors.py:428-434 verbatim semantics — the test
    suite's 'must never actually render' sentinel handler."""

    def __call__(self, *args, **kwargs):
        raise RuntimeError("This is not supposed to happen.")

    def clear(self):
        pass


def init_error_handler(error_handler=BasicErrorHandler):
    """Resolve the accepted handler shapes (class | instance |
    ``(class, config)``) to an instance — the reference's
    ``__init_error_handler`` (validator.py:194-207), including the
    verbatim ``RuntimeError('Invalid error_handler.')``."""
    eh_config = {}
    if isinstance(error_handler, tuple):
        error_handler, eh_config = error_handler
    if isinstance(error_handler, type) and issubclass(error_handler,
                                                      BaseErrorHandler):
        return error_handler(**eh_config)
    if isinstance(error_handler, BaseErrorHandler):
        return error_handler
    raise RuntimeError("Invalid error_handler.")


class _TreeNode:
    __slots__ = ("errors", "descendants")

    def __init__(self):
        self.errors: list = []
        self.descendants: dict = {}


class ErrorTree:
    """Queryable trie of violation rows, keyed by a path field — the
    analog of the reference's ErrorTree/DocumentErrorTree/
    SchemaErrorTree (errors.py:210-353).  Like the reference, an error
    is stored at the node of its FULL path and every prefix node knows
    its descendants, so ``tree['x']`` / ``fetch_errors_from(('x',))``
    answer "everything wrong under x"."""

    path_field = "document_path"

    def __init__(self, violation_rows=()):
        self.root = _TreeNode()
        for r in violation_rows:
            self.add(r)

    def add(self, row) -> None:
        path = tuple(_get(row, self.path_field) or ())
        node = self.root
        for p in path:
            node = node.descendants.setdefault(str(p), _TreeNode())
        node.errors.append(row)

    def fetch_node_from(self, path):
        node = self.root
        for p in tuple(path or ()):
            node = node.descendants.get(str(p))
            if node is None:
                return None
        return node

    def fetch_errors_from(self, path) -> list:
        node = self.fetch_node_from(path)
        out: list = []

        def walk(n):
            out.extend(n.errors)
            for child in n.descendants.values():
                walk(child)

        if node is not None:
            walk(node)
        return out

    def __getitem__(self, item):
        return self.root.descendants.get(str(item))

    def __contains__(self, item):
        return str(item) in self.root.descendants


class DocumentErrorTree(ErrorTree):
    path_field = "document_path"


class SchemaErrorTree(ErrorTree):
    path_field = "schema_path"
