"""Temporal operators (operators/temporal.py): as-of join + sessionization.

Differential against DuckDB's native ASOF JOIN / window SQL on the
sf0.001 events table (which contains NULL user_id and NULL ts rows, so
the null paths are exercised by real data), plus boundary pins and a
plan-shape assertion (the as-of join must be ONE window pass, never a
range cross-product).
"""

import datetime

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from cerberus_spark.operators.temporal import asof_join, session_stats, sessionize

SF = "/root/testdata/sf0.001"
EV = f"{SF}/events.parquet"


def _events(spark):
    return spark.read.parquet(EV)


def _purchases(spark):
    return (
        _events(spark)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
    )


def _norm(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("strict", [False, True])
def test_asof_join_matches_duckdb(spark, strict):
    got = asof_join(
        _events(spark).select("event_id", "user_id", "ts"),
        _purchases(spark),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["value"],
        strict=strict,
    ).select("event_id", "ts_asof", "value_asof")
    op = ">" if strict else ">="
    want = duckdb.sql(
        f"""
        SELECT l.event_id, r.ts AS ts_asof, r.value AS value_asof
        FROM '{EV}' l
        ASOF LEFT JOIN (
          SELECT user_id, ts, value FROM '{EV}' WHERE event_type = 'purchase'
        ) r ON l.user_id = r.user_id AND l.ts {op} r.ts
        """
    ).fetchall()
    assert _norm(got.collect()) == _norm(want)


def test_asof_tolerance_voids_stale_matches(spark):
    tol = 3600.0
    got = asof_join(
        _events(spark).select("event_id", "user_id", "ts"),
        _purchases(spark),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["value"],
        tolerance_sec=tol,
    ).select("event_id", "ts_asof", "value_asof")
    want = duckdb.sql(
        f"""
        SELECT event_id,
               CASE WHEN ok THEN ts_asof END AS ts_asof,
               CASE WHEN ok THEN value_asof END AS value_asof
        FROM (
          SELECT l.event_id, r.ts AS ts_asof, r.value AS value_asof,
                 l.ts - r.ts <= INTERVAL '3600' SECOND AS ok
          FROM '{EV}' l
          ASOF LEFT JOIN (
            SELECT user_id, ts, value FROM '{EV}' WHERE event_type = 'purchase'
          ) r ON l.user_id = r.user_id AND l.ts >= r.ts
        )
        """
    ).fetchall()
    assert _norm(got.collect()) == _norm(want)
    # tolerance must actually void something on this data
    n_voided = duckdb.sql(
        f"""
        SELECT count(*) FROM '{EV}' l
        ASOF JOIN (SELECT user_id, ts, value FROM '{EV}'
                   WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        WHERE l.ts - r.ts > INTERVAL '3600' SECOND
        """
    ).fetchone()[0]
    assert n_voided > 0


def test_asof_null_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    left = spark.createDataFrame(
        [
            Row(k="a", t=ts(10), lid=1),
            Row(k=None, t=ts(10), lid=2),  # NULL key → passes through, no match
            Row(k="a", t=None, lid=3),  # NULL ts → passes through, no match
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", t=ts(5), v=1.0),
            Row(k=None, t=ts(1), v=2.0),  # NULL key → dropped from right
            Row(k="a", t=None, v=3.0),  # NULL ts → dropped from right
        ]
    )
    got = {
        r.lid: (r.t_asof, r.v_asof)
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", payload=["v"]
        ).collect()
    }
    assert got[1] == (ts(5), 1.0)
    assert got[2] == (None, None)
    assert got[3] == (None, None)


def test_asof_right_tie_break(spark):
    """Equal right timestamps: with a tie column the LARGEST tie value
    wins (last in ascending window order); deterministic by pin."""
    t0 = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([Row(k="a", t=t0 + datetime.timedelta(seconds=9))])
    right = spark.createDataFrame(
        [Row(k="a", t=t0, seq=2, v=20.0), Row(k="a", t=t0, seq=1, v=10.0)]
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        payload=["v"], right_tie="seq",
    ).collect()
    assert out[0].v_asof == 20.0


# DuckDB twin of sessionize(): NULLS FIRST matches Spark's asc default,
# and the COALESCE(..., TRUE) matches the engine's "NULL ts opens its
# own session" rule (Spark: false|NULL → NULL → coalesce(…,1)).
def _sessionize_sql(gap_sec):
    return f"""
      WITH o AS (
        SELECT event_id, user_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts NULLS FIRST, event_id) AS prev
        FROM '{EV}')
      SELECT event_id, user_id,
             CAST(SUM(CASE WHEN COALESCE(prev IS NULL
                                OR ts - prev >= INTERVAL '{int(gap_sec)}' SECOND,
                                TRUE) THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id
                        ORDER BY ts NULLS FIRST, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                  AS INTEGER) AS session_idx
      FROM o
    """


def test_sessionize_matches_duckdb(spark):
    got = sessionize(
        _events(spark), "user_id", "ts", 900.0, order_tie="event_id"
    ).select("event_id", "user_id", "session_idx")
    want = duckdb.sql(_sessionize_sql(900)).fetchall()
    assert _norm(got.collect()) == _norm(want)
    # the gap must actually split on this data
    assert got.agg(F.max("session_idx")).first()[0] > 0


def test_sessionize_exact_gap_boundary(spark):
    """A gap of exactly gap_sec STARTS a new session (session_window
    spans [first, last+gap)); one second less does not."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(k="a", t=t0, eid=0),
        Row(k="a", t=t0 + datetime.timedelta(seconds=899), eid=1),
        Row(k="a", t=t0 + datetime.timedelta(seconds=899 + 900), eid=2),
    ]
    out = {
        r.eid: r.session_idx
        for r in sessionize(
            spark.createDataFrame(rows), "k", "t", 900.0, order_tie="eid"
        ).collect()
    }
    assert out == {0: 0, 1: 0, 2: 1}


def test_session_stats_agrees_with_sessionize(spark):
    """The JVM session_window aggregate and the row-level labeler must
    describe the same sessions: aggregating sessionize() labels yields
    exactly session_stats() rows (null-ts rows excluded — session_window
    drops them)."""
    ev = _events(spark).filter(F.col("ts").isNotNull())
    via_labels = (
        sessionize(ev, "user_id", "ts", 900.0, order_tie="event_id")
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    via_window = session_stats(ev, "user_id", "ts", 900.0).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    assert _norm(via_labels.collect()) == _norm(via_window.collect())


def test_asof_plan_is_single_window_no_range_join(spark):
    """The as-of join must compile to union + ONE window pass — never a
    key-equijoin with a range filter (cross product on hot keys) or a
    nested-loop join."""
    plan = (
        asof_join(
            _events(spark).select("event_id", "user_id", "ts"),
            _purchases(spark),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            payload=["value"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") >= 1
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, f"unexpected {bad} in as-of plan"
    assert plan.count("Exchange hashpartitioning") == 1
