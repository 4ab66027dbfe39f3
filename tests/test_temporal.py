"""Temporal operators (operators/temporal.py): as-of join + sessionization.

Differential against DuckDB's native ASOF JOIN / window SQL on the
sf0.001 events table (no NULL keys/timestamps there — the null paths
are covered by the synthetic cases here and by the randomized nulls in
test_temporal_fuzz.py), plus boundary pins and a plan-shape assertion
(the as-of join must be ONE window pass, never a range cross-product).
"""

import datetime

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from cerberus_spark.operators import temporal
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


def test_asof_right_tie_non_numeric(spark):
    """The tie column rides natively (r5 ADVICE): a STRING tie must
    break ties by its own ordering — the old ``cast('long')`` turned it
    into NULL (non-ANSI), silently restoring the nondeterminism the
    parameter exists to prevent.  A right row with a NULL tie loses to
    any non-NULL tie."""
    t0 = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([Row(k="a", t=t0 + datetime.timedelta(seconds=9))])
    right = spark.createDataFrame(
        [Row(k="a", t=t0, tag="r2", v=20.0),
         Row(k="a", t=t0, tag=None, v=5.0),
         Row(k="a", t=t0, tag="r1", v=10.0)]
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        payload=["v"], right_tie="tag",
    ).collect()
    assert out[0].v_asof == 20.0  # max string tag wins; NULL tag loses


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


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------


def _purchase_windows(spark):
    ev = _events(spark)
    return ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL '1' DAY")).alias("w_end"),
        F.col("event_id").alias("purchase_id"),
    )


def _range_pairs_sql(distinct=False):
    sel = "DISTINCT l.event_id" if distinct else "l.event_id, r.event_id AS purchase_id"
    return f"""
        SELECT {sel}
        FROM '{EV}' l
        JOIN (SELECT user_id, event_id, ts AS s, ts + INTERVAL '1' DAY AS e
              FROM '{EV}' WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.s AND l.ts <= r.e
    """


@pytest.mark.parametrize("bucket_sec", [3600, 6 * 3600, 7 * 24 * 3600])
def test_range_join_matches_duckdb(spark, bucket_sec):
    """Bucketized point-in-interval join ≡ plain inequality join, at
    bucket widths smaller than, comparable to, and much larger than the
    1-day interval (explode factor 25×, 5×, 2×)."""
    import duckdb

    got = temporal.range_join(
        _events(spark).select("event_id", "user_id", "ts"),
        _purchase_windows(spark),
        on="user_id",
        left_ts="ts",
        right_start="w_start",
        right_end="w_end",
        payload=["purchase_id"],
        bucket_sec=bucket_sec,
    ).select("event_id", F.col("purchase_id_rng").alias("purchase_id"))
    want = duckdb.sql(_range_pairs_sql()).fetchall()
    assert _norm(got.collect()) == _norm(want)


def test_range_join_semi_and_exclusive_end(spark):
    import duckdb

    semi = temporal.range_join(
        _events(spark).select("event_id", "user_id", "ts"),
        _purchase_windows(spark),
        on="user_id",
        left_ts="ts",
        right_start="w_start",
        right_end="w_end",
        payload=[],
        bucket_sec=6 * 3600,
        how="left_semi",
    )
    want = duckdb.sql(_range_pairs_sql(distinct=True)).fetchall()
    assert sorted(r.event_id for r in semi.collect()) == sorted(
        w[0] for w in want
    )
    # end_inclusive=False excludes exact-end matches (w_start itself is an
    # exact-boundary hit on the purchase's own row, so counts differ)
    n_incl = temporal.range_join(
        _events(spark).select("event_id", "user_id", "ts"),
        _purchase_windows(spark),
        on="user_id", left_ts="ts", right_start="w_start",
        right_end="w_end", payload=[], bucket_sec=6 * 3600,
    ).count()
    n_excl_start = duckdb.sql(
        f"""SELECT count(*) FROM '{EV}' l
            JOIN (SELECT user_id, ts AS s, ts + INTERVAL '1' DAY AS e
                  FROM '{EV}' WHERE event_type='purchase') r
            ON l.user_id = r.user_id AND l.ts >= r.s AND l.ts < r.e"""
    ).fetchone()[0]
    n_excl = temporal.range_join(
        _events(spark).select("event_id", "user_id", "ts"),
        _purchase_windows(spark),
        on="user_id", left_ts="ts", right_start="w_start",
        right_end="w_end", payload=[], bucket_sec=6 * 3600,
        end_inclusive=False,
    ).count()
    assert n_excl == n_excl_start <= n_incl


def test_range_join_max_buckets_guard(spark):
    """A pathological interval (wider than max_buckets × bucket_sec)
    fails loudly executor-side instead of exploding the shuffle."""
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        temporal.range_join(
            _events(spark).select("event_id", "user_id", "ts"),
            _purchase_windows(spark),
            on="user_id",
            left_ts="ts",
            right_start="w_start",
            right_end="w_end",
            payload=["purchase_id"],
            bucket_sec=60,
            max_buckets=10,
        ).count()
    assert "max_buckets" in str(ei.value)


def test_range_join_plan_is_equi_join(spark):
    plan = (
        temporal.range_join(
            _events(spark).select("event_id", "user_id", "ts"),
            _purchase_windows(spark),
            on="user_id",
            left_ts="ts",
            right_start="w_start",
            right_end="w_end",
            payload=["purchase_id"],
            bucket_sec=6 * 3600,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"unexpected {bad} in range-join plan"
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_session_stats_streaming_equals_batch(spark, tmp_path):
    """The docstring claim, substantiated: session_stats uses the exact
    operator the streaming path uses, so running the SAME gap over the
    same rows as a 5-micro-batch stream (watermark + append mode, state
    merged across batches) finalizes exactly the batch result.

    Watermark delay (40d) exceeds the data span (30d) so no row is ever
    late-dropped; a far-future sentinel row advances the watermark past
    every real session end so append mode flushes them all.
    """
    import datetime as dt

    from cerberus_spark.operators.temporal import session_stats

    # watermarks require TIMESTAMP (not the parquet's TIMESTAMP_NTZ);
    # session TZ is pinned UTC so the cast is value-preserving
    ev = _events(spark).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    src = str(tmp_path / "sess_src")
    # 4 data chunks → 4 micro-batches with cross-batch session state
    ev.repartition(4).write.parquet(src)
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = [(int(-999), max_ts + dt.timedelta(days=100), int(-1))]
    spark.createDataFrame(sentinel, ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "40 days")
    )
    agg = session_stats(stream, "user_id", "ts", 900.0)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _norm(
            spark.sql(
                "SELECT user_id, session_start, session_end, n_events "
                "FROM sess_stream WHERE user_id >= 0"
            ).collect()
        )
    finally:
        q.stop()
    want = _norm(
        session_stats(ev, "user_id", "ts", 900.0)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    )
    assert got == want and len(got) > 0
