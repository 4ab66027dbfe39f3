"""Differential oracle: Spark engine vs reference cerberus, row-aligned.

The reference suite's semantics (test_validation.py / test_normalization.py
families named by the north star: type coercion, allowed-set, regex,
nested-schema errors) are checked by running the reference itself over
the same rows and comparing flattened violation tuples.
"""

import datetime as dt

import pytest

from cerberus_spark import SparkValidator
from cerberus_spark.oracle import compare_per_row, load_reference, row_to_doc
from cerberus_spark.sources.transcripts import TURN_SCHEMA, synthesize

cerberus = load_reference()
pytestmark = pytest.mark.skipif(cerberus is None, reason="reference not importable")


def _annotated_rows_and_docs(spark, df, schema, **kw):
    v = SparkValidator(schema, **kw)
    rows = v.annotate(df).collect()
    field_names = [c for c in df.columns]
    docs = []
    for r in rows:
        d = r.asDict(recursive=True)
        docs.append(row_to_doc({k: d[k] for k in field_names}, schema))
    return rows, docs


def test_flat_transcripts_parity(spark):
    t, _ = synthesize(2000, seed=42)
    df = spark.createDataFrame(t)
    rows, docs = _annotated_rows_and_docs(spark, df, TURN_SCHEMA)
    mismatches = compare_per_row(rows, docs, TURN_SCHEMA)
    assert mismatches == [], mismatches[:3]


def test_flat_transcripts_fail_count_deterministic(spark):
    t, _ = synthesize(2000, seed=42)
    df = spark.createDataFrame(t)
    v = SparkValidator(TURN_SCHEMA, key_cols=("conv_id", "turn_idx"))
    n, failed = v.validate(df).counts()
    assert n == 2000
    # pinned: regenerating must not silently change the workload
    n2, failed2 = v.validate(spark.createDataFrame(t)).counts()
    assert (n, failed) == (n2, failed2)
    assert 0 < failed < n


NESTED_SCHEMA = {
    "meta": {
        "type": "dict",
        "schema": {
            "lang": {"type": "string", "allowed": ["en", "de", "fr"]},
            "scores": {
                "type": "list",
                "schema": {"type": "float", "min": 0.0, "max": 1.0},
                "maxlength": 4,
            },
            "tags": {
                "type": "dict",
                "keysrules": {"type": "string", "regex": "[a-z_]+"},
                "valuesrules": {"type": "string", "empty": False},
            },
        },
    },
    "turn_idx": {"type": "integer", "anyof": [{"min": 0, "max": 9}, {"min": 100}]},
}

_NESTED_DDL = (
    "meta struct<lang:string, scores:array<double>, tags:map<string,string>>, "
    "turn_idx int"
)


def _nested_rows():
    return [
        (("en", [0.5, 0.7], {"topic": "spark"}), 5),
        (("xx", [1.5, -0.2, 0.1, 0.9, 0.3], {"Topic!": "spark"}), 50),
        (("de", [], {"ok_tag": ""}), 100),
        ((None, None, None), 3),
        (None, 12),
        (("fr", [0.0], {}), None),
    ]


def test_nested_schema_parity(spark):
    df = spark.createDataFrame(_nested_rows(), _NESTED_DDL)
    rows, docs = _annotated_rows_and_docs(spark, df, NESTED_SCHEMA)
    mismatches = compare_per_row(rows, docs, NESTED_SCHEMA)
    assert mismatches == [], mismatches


ITEMS_SCHEMA = {
    "pair": {
        "type": "list",
        "items": [{"type": "string", "minlength": 2}, {"type": "string", "allowed": ["a", "b"]}],
    }
}


def test_items_parity(spark):
    rows = [(["xy", "a"],), (["q", "z"],), (["only-one"],), (None,)]
    df = spark.createDataFrame(rows, "pair array<string>")
    annotated, docs = _annotated_rows_and_docs(spark, df, ITEMS_SCHEMA)
    mismatches = compare_per_row(annotated, docs, ITEMS_SCHEMA)
    assert mismatches == [], mismatches


LOGICAL_SCHEMA = {
    "n": {"type": "integer", "oneof": [{"min": 0, "max": 10}, {"min": 5}]},
    "m": {"type": "integer", "noneof": [{"allowed": [13]}, {"min": 1000}]},
}


def test_logical_parity(spark):
    rows = [(3, 1), (7, 13), (50, 2000), (-1, 0), (None, None)]
    df = spark.createDataFrame(rows, "n int, m int")
    annotated, docs = _annotated_rows_and_docs(spark, df, LOGICAL_SCHEMA)
    mismatches = compare_per_row(annotated, docs, LOGICAL_SCHEMA)
    assert mismatches == [], mismatches


EXCL_SCHEMA = {
    "cash": {"type": "integer", "excludes": "card", "required": True},
    "card": {"type": "integer", "required": True},
}


def test_excludes_parity(spark):
    rows = [(1, None), (None, 2), (1, 2), (None, None)]
    df = spark.createDataFrame(rows, "cash int, card int")
    annotated, docs = _annotated_rows_and_docs(spark, df, EXCL_SCHEMA)
    mismatches = compare_per_row(annotated, docs, EXCL_SCHEMA)
    assert mismatches == [], mismatches


def test_normalization_parity(spark):
    """coerce + default: per-row normalized-value equality vs reference."""
    schema = {
        "name": {"type": "string", "coerce": "strip"},
        "lang": {"type": "string", "default": "en"},
        "score": {"type": "float", "coerce": "to_float"},
    }
    rows = [("  padded  ", None, "3.5"), ("x", "de", "0.25"), (None, "fr", None)]
    df = spark.createDataFrame(rows, "name string, lang string, score string")

    from cerberus_spark.oracle import reference_validate

    coercers = {"strip": lambda s: s.strip(), "to_float": float}
    ref_schema = {
        "name": {"type": "string", "coerce": coercers["strip"]},
        "lang": {"type": "string", "default": "en"},
        "score": {"type": "float", "coerce": coercers["to_float"]},
    }
    v = SparkValidator(schema)
    got = [r.asDict() for r in v.normalized(df).collect()]
    docs = [row_to_doc(dict(zip(df.columns, r)), schema) for r in rows]
    _, ref_norm = reference_validate(docs, ref_schema)
    for g, r in zip(got, ref_norm):
        for k, rv in (r or {}).items():
            assert g[k] == rv, (g, r)


def test_per_turn_text_equality_under_stable_ordering(spark):
    """North-star check: per-turn normalized text equality vs the
    reference under stable (conv_id, turn_idx) ordering."""
    if cerberus is None:
        pytest.skip("reference not importable")
    schema = dict(TURN_SCHEMA)
    schema["text"] = {**TURN_SCHEMA["text"], "coerce": "strip"}
    t, _ = synthesize(1500, seed=7)
    t["text"] = t["text"].map(lambda s: None if s is None else "  " + s + " ")
    df = spark.createDataFrame(t)
    v = SparkValidator(schema, key_cols=("conv_id", "turn_idx"))
    got = (
        v.normalized(df)
        .orderBy("conv_id", "turn_idx", "ts")
        .select("conv_id", "turn_idx", "text")
        .collect()
    )

    ref_schema = {**schema, "text": {**TURN_SCHEMA["text"], "coerce": str.strip}}
    from cerberus_spark.oracle import reference_validate

    rows = t.sort_values(["conv_id", "turn_idx", "ts"]).to_dict("records")
    docs = [row_to_doc({k: None if v != v else v for k, v in r.items()}
                       if any(x != x for x in r.values()) else r, ref_schema)
            for r in rows]
    # row_to_doc drops NaN/None; pandas NaN needs the guard above
    _, ref_norm = reference_validate(docs, ref_schema)
    assert len(got) == len(ref_norm)
    for g, r in zip(got, ref_norm):
        assert g.text == (r or {}).get("text"), (g.conv_id, g.turn_idx, g.text, r)


def test_transcripts_fixture_in_sync():
    """The committed flagship fixture parquet equals a fresh
    synthesize(5000, seed=42) — guards against editing the synthesizer
    without rerunning scripts/make_transcripts_fixture.py (the DuckDB
    flagship oracle reads the committed file)."""
    import os

    import pyarrow.parquet as pq

    fix = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "transcripts_oracle.parquet")
    got = pq.read_table(fix).to_pandas()
    want, _ = synthesize(5000, seed=42)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == 5000
    import pandas as pd
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
