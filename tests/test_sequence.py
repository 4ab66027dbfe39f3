"""Conversation-sequence grammar checks vs DuckDB (operators/sequence.py).

The reference has no cross-row rules (validator.py validates one
document at a time), so the oracle here is DuckDB window SQL over the
same frame with the ordering pinned ASC NULLS FIRST on both engines.
"""

import datetime
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cerberus_spark.operators.sequence import sequence_summary, sequence_violations

T0 = datetime.datetime(2024, 1, 1)

ROLES = ["system", "user", "assistant", "tool", "bogus"]

_ORACLE_SQL = """
WITH o AS (
  SELECT conv, idx, role, ts,
         lag(1) OVER w IS NOT NULL AS has_prev,
         lag(role) OVER w AS prev_role,
         lag(idx) OVER w AS prev_idx,
         lag(ts) OVER w AS prev_ts
  FROM t
  WINDOW w AS (PARTITION BY conv
               ORDER BY idx ASC NULLS FIRST, ts ASC NULLS FIRST,
                        rid ASC NULLS FIRST))
SELECT conv, idx, 'first_role' AS con FROM o
 WHERE NOT has_prev AND role NOT IN ({first})
UNION ALL
SELECT conv, idx, 'transition' FROM o
 WHERE has_prev AND ({trans})
UNION ALL
SELECT conv, idx, 'contiguous' FROM o
 WHERE CASE WHEN NOT has_prev THEN idx != 0 ELSE idx != prev_idx + 1 END
UNION ALL
SELECT conv, idx, 'monotone_ts' FROM o
 WHERE has_prev AND ts < prev_ts
"""


def _dirty_table(rng, n):
    rows = []
    for i in range(n):
        conv = f"c{rng.randrange(8)}"
        idx = rng.randrange(-2, 12) if rng.random() < 0.3 else rng.randrange(8)
        role = None if rng.random() < 0.08 else rng.choice(ROLES)
        ts = (None if rng.random() < 0.08
              else T0 + datetime.timedelta(seconds=rng.randrange(10_000)))
        rows.append((i, conv, idx, role, ts))
    return pd.DataFrame(rows, columns=["rid", "conv", "idx", "role", "ts"]).astype(
        {"ts": "datetime64[us]"}
    )


@pytest.mark.parametrize("seed", range(5))
def test_sequence_fuzz_vs_duckdb(spark, seed):
    """Random dirty tables (NULL roles/ts, negative + duplicate idx)
    against a random transition grammar; all four rules at once."""
    rng = random.Random(4000 + seed)
    pdf = _dirty_table(rng, rng.randrange(60, 200))
    first = rng.sample(ROLES[:4], k=rng.randrange(1, 3))
    trans = {
        src: rng.sample(ROLES[:4], k=rng.randrange(1, 4))
        for src in rng.sample(ROLES[:4], k=rng.randrange(1, 5))
    }
    got = sequence_violations(
        spark.createDataFrame(pdf), conv_col="conv", idx_col="idx",
        role_col="role", ts_col="ts", first_roles=first, transitions=trans,
        contiguous=True, monotone_ts=True, order_tie=("ts", "rid"),
    ).select("conv", "idx", "constraint").collect()

    con = duckdb.connect()
    con.register("t", pdf)
    tsql = " OR ".join(
        "(prev_role = '{s}' AND role NOT IN ({a}))".format(
            s=s, a=",".join(f"'{r}'" for r in allowed))
        for s, allowed in trans.items()
    )
    want = con.sql(_ORACLE_SQL.format(
        first=",".join(f"'{r}'" for r in first), trans=tsql)).fetchall()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)), (
        f"seed={seed} first={first} trans={trans}")


def test_sequence_summary_agrees_with_violations(spark):
    """The per-conversation scorecard must count exactly the violation
    rows, and seq_ok must be true iff a conversation emits none."""
    rng = random.Random(99)
    pdf = _dirty_table(rng, 150)
    kw = dict(conv_col="conv", idx_col="idx", role_col="role", ts_col="ts",
              first_roles=["system"],
              transitions={"system": ["user"], "user": ["assistant", "tool"]},
              contiguous=True, monotone_ts=True, order_tie=("ts", "rid"))
    df = spark.createDataFrame(pdf)
    viol = (sequence_violations(df, **kw)
            .groupBy("conv", "constraint").count().collect())
    summ = {r["conv"]: r.asDict() for r in sequence_summary(
        df, **{k: v for k, v in kw.items() if k != "keys"}).collect()}
    got = {(r["conv"], r["constraint"]): r["count"] for r in viol}
    assert summ  # every conv present
    for conv, row in summ.items():
        for lab in ("first_role", "transition", "contiguous", "monotone_ts"):
            assert row[f"n_{lab}"] == got.get((conv, lab), 0), (conv, lab)
        assert row["n_violations"] == sum(
            got.get((conv, lab), 0)
            for lab in ("first_role", "transition", "contiguous", "monotone_ts"))
        assert row["seq_ok"] == (row["n_violations"] == 0)
        assert row["n_turns"] == (pdf["conv"] == conv).sum()


def test_single_conversation_first_row_only(spark):
    """A 1-turn conversation: only first_role / contiguous can fire."""
    df = spark.createDataFrame(
        pd.DataFrame([("c0", 3, "user", T0)],
                     columns=["conv", "idx", "role", "ts"]))
    rows = sequence_violations(
        df, conv_col="conv", idx_col="idx", role_col="role", ts_col="ts",
        first_roles=["system"], transitions={"user": ["assistant"]},
        contiguous=True, monotone_ts=True,
    ).select("constraint").collect()
    assert sorted(r[0] for r in rows) == ["contiguous", "first_role"]


def test_null_role_three_valued_logic(spark):
    """NULL roles neither pass nor fail membership rules (SQL semantics,
    identical to the DuckDB twin by construction); the per-row
    required rule is responsible for flagging them."""
    df = spark.createDataFrame(
        pd.DataFrame([("c0", 0, None, T0),
                      ("c0", 1, "user", T0),
                      ("c0", 2, None, T0)],
                     columns=["conv", "idx", "role", "ts"]))
    rows = sequence_violations(
        df, conv_col="conv", idx_col="idx", role_col="role", ts_col="ts",
        first_roles=["system"], transitions={"user": ["assistant"]},
        contiguous=True, monotone_ts=True,
    ).select("idx", "constraint").collect()
    # idx=0 NULL role: first_role predicate is NULL -> no row.
    # idx=2 NULL role after 'user': NOT IN -> NULL -> no transition row.
    assert rows == []


def test_sequence_plan_single_exchange(spark):
    """All four rules in one window pass: exactly one hash exchange on
    the conversation key, no join, no extra sort stages beyond the
    window's own — the operator must not re-shuffle per rule."""
    df = spark.read.parquet("tests/fixtures/transcripts_oracle.parquet")
    plan = (
        sequence_violations(
            df, first_roles=["system"],
            transitions={"system": ["user"]},
            contiguous=True, monotone_ts=True,
            order_tie=("ts", "role", "text", "tool"),
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan
    assert plan.count("Window") == 1


def test_sequence_summary_plan_no_second_exchange(spark):
    """The summary groupBy rides the window's conv partitioning — the
    aggregate must not add a second hash exchange."""
    df = spark.read.parquet("tests/fixtures/transcripts_oracle.parquet")
    plan = (
        sequence_summary(
            df, first_roles=["system"], transitions={"system": ["user"]},
            contiguous=True, monotone_ts=True,
            order_tie=("ts", "role", "text", "tool"),
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_monotone_requires_ts(spark):
    df = spark.createDataFrame(
        pd.DataFrame([("c0", 0, "system")], columns=["conv", "idx", "role"]))
    with pytest.raises(ValueError, match="monotone_ts"):
        sequence_violations(df, conv_col="conv", idx_col="idx",
                            role_col="role", ts_col=None, monotone_ts=True)
    with pytest.raises(ValueError, match="no sequence rules"):
        sequence_violations(df, conv_col="conv", idx_col="idx",
                            role_col="role", ts_col=None)


def test_streaming_sequence_parity_with_batch(spark, tmp_path):
    """On in-order input the stateful streaming grammar operator emits
    exactly the batch operator's rows, including breaches that span a
    micro-batch boundary (maxFilesPerTrigger=1 → one batch per file)."""
    import datetime as dt

    from cerberus_spark.streaming.validate_stream import (
        sequence_violations_stream,
    )

    base = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    src = str(tmp_path / "seq_src")
    ddl = "conv_id string, turn_idx int, role string, ts timestamp"
    rules = dict(
        first_roles=["system"],
        transitions={"system": ["user"], "user": ["assistant"],
                     "assistant": ["user"]},
        contiguous=True, monotone_ts=True,
    )
    # batch 1: c1 clean so far; c2 starts with wrong first role + idx 2
    b1 = [("c1", 0, "system", base), ("c1", 1, "user", base + sec),
          ("c2", 2, "user", base)]
    # batch 2: c1 assistant->assistant breach ACROSS the boundary
    # (turn 2 ok, turn 3 illegal), plus a ts regression; c2 idx gap;
    # c3 NULL role first (three-valued logic: no first_role row)
    b2 = [("c1", 2, "assistant", base + 2 * sec),
          ("c1", 3, "assistant", base + 1 * sec),
          ("c2", 5, "assistant", base + 2 * sec),
          ("c3", 0, None, base)]
    for batch in (b1, b2):
        spark.createDataFrame(batch, ddl).coalesce(1).write.mode(
            "append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (sequence_violations_stream(stream, **rules)
         .writeStream.outputMode("append").format("memory")
         .queryName("seq_stream").start())
    try:
        q.processAllAvailable()
        got = {(r.conv_id, r.turn_idx, r.constraint, r.value)
               for r in spark.sql("select * from seq_stream").collect()}
    finally:
        q.stop()

    want = {(r["conv_id"], r["turn_idx"], r["constraint"], r["value"])
            for r in sequence_violations(
                spark.read.parquet(src), **rules).collect()}
    assert got == want
    # sanity: the cross-batch transition breach is in there
    assert ("c1", 3, "transition", "assistant->assistant") in want
    assert ("c1", 3, "monotone_ts", str(base + sec)) in want
