"""cerberus_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the declarative per-field rule language of pyeve/cerberus
(reference at /root/reference, studied in SURVEY.md) as compiled
Catalyst column predicates evaluated in a single pass, and adds
dataset-level constraints (column stats, uniqueness, referential
integrity, distribution drift) that a per-document validator cannot
express.  Built for 10^12-row tables: no per-row Python, explicit
partitioning/skew handling, mergeable sketches, resumable checkpoints.
"""

from . import errors
from .errors import BaseErrorHandler, BasicErrorHandler, ToyErrorHandler
from .dsl import (
    Registry,
    RuleSetSchema,
    SchemaError,
    rules_set_registry,
    schema_hash,
    schema_registry,
)
from .engine import SparkValidator, ValidationResult

__version__ = "0.1.0"

__all__ = [
    "SparkValidator",
    "ValidationResult",
    "BaseErrorHandler",
    "BasicErrorHandler",
    "ToyErrorHandler",
    "RuleSetSchema",
    "SchemaError",
    "Registry",
    "schema_registry",
    "rules_set_registry",
    "schema_hash",
    "errors",
]
