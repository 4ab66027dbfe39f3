"""Temporal operators the reference cannot express (SURVEY.md §2.5).

The reference validates one document at a time and has no cross-row
notion of time (/root/reference/cerberus/validator.py:1009-1049); a
transcripts pipeline at scale constantly needs two cross-row temporal
primitives, so the engine adds them Spark-first:

* as-of join     — enrich every left row with the most recent right row
                   at-or-before (or strictly-before) its timestamp, per
                   key.  Implemented as union-merge + one window pass:
                   tag each side, union on (key, ts, side), and take
                   ``last(payload, ignorenulls=True)`` over an
                   unbounded-preceding window.  That is ONE hash
                   exchange on the key followed by a per-key sort —
                   never the key-equijoin + range-filter cross product
                   (which explodes on hot keys), and never a broadcast
                   of the full right table.  At 100 TB both sides
                   shuffle once, partial sorts spill, and AQE handles
                   skewed keys like any other exchange.
* sessionization — gap-based session assignment.  Two forms:
                   ``session_stats`` aggregates with the built-in
                   ``F.session_window`` (JVM-native session merge, one
                   shuffle, map-side partial merge — also the exact
                   operator the streaming path uses, so batch and
                   streaming share semantics); ``sessionize`` labels
                   every ROW with its (key-scoped) session index via
                   lag + running count when downstream needs per-row
                   session ids.  Boundary semantics are pinned
                   identical: a gap of exactly ``gap`` STARTS a new
                   session (session_window spans [first, last+gap)).

Both are deterministic under ties only if the caller supplies a
tie-break column (``right_tie`` / ``order_tie``); with none, Spark's
window sort on equal (ts) rows is plan-dependent, exactly like any SQL
``ROW_NUMBER`` without a full ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join", "sessionize", "session_stats"]


def _interval(seconds: float) -> Column:
    """Day-time interval literal of ``seconds`` (fractional OK)."""
    return F.expr(f"INTERVAL '{float(seconds)}' SECOND")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    *,
    strict: bool = False,
    tolerance_sec: float | None = None,
    right_tie: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach ``payload`` columns from the most
    recent right row with ``right_ts <= left_ts`` (``<`` when
    ``strict``), matching on the ``on`` key(s).  Rows with no match
    keep NULL payloads (left-join semantics).

    ``tolerance_sec`` additionally voids matches older than the given
    number of seconds (payloads become NULL, the left row survives).

    Output columns: every left column, then ``{right_ts}{suffix}``
    (the matched right timestamp) and ``{p}{suffix}`` for each payload
    column — suffixing keeps the output schema collision-free even
    when left and right share column names.

    Right rows with a NULL key or NULL timestamp can never be "the
    most recent row before t" — they are dropped from the right side
    up front (same as SQL inequality-join semantics, where NULL
    comparisons are never true).  Left rows with NULL key/timestamp
    pass through with NULL payloads.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # at equal timestamps: non-strict ⇒ right row is visible to the left
    # row (sorts before it); strict ⇒ it is not (sorts after it)
    left_side, right_side = (1, 0) if not strict else (0, 1)

    rp = right
    for k in [*keys, right_ts]:
        rp = rp.filter(F.col(k).isNotNull())
    pay = F.struct(
        F.col(right_ts).alias("__mt"),
        *[F.col(p).alias(p) for p in payload],
    )
    # the tie column rides NATIVELY (no cast): a long cast would turn a
    # non-numeric tie into NULL under non-ANSI semantics — restoring
    # exactly the nondeterminism the parameter exists to prevent — or
    # throw at runtime under ANSI.  Any orderable type works (Catalyst
    # rejects unorderable ones, e.g. maps, at analysis time with a
    # clear error); ties only discriminate among RIGHT rows at equal
    # (ts, side), so left rows carry NULL (sorts first — a right row
    # with a NULL tie loses to any non-NULL tie, matching the long
    # path's NULL ordering).
    tie = F.col(right_tie) if right_tie else F.lit(0)
    rsel = rp.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(right_side).alias("__side"),
        tie.alias("__tie"),
        pay.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    lsel = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(rsel.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(rsel.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc_nulls_first(), "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        lsel.unionByName(rsel)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == left_side)
    )
    if tolerance_sec is not None:
        # interval arithmetic, not an epoch cast: works for TIMESTAMP and
        # TIMESTAMP_NTZ alike, with no session-timezone/DST dependence
        in_tol = (F.col("__t") - F.col("__m.__mt")) <= _interval(tolerance_sec)
        merged = merged.withColumn(
            "__m", F.when(in_tol, F.col("__m"))
        )
    return merged.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m.__mt").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{p}").alias(f"{p}{suffix}") for p in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    payload: Sequence[str],
    *,
    bucket_sec: float = 3600.0,
    max_buckets: int = 10_000,
    end_inclusive: bool = True,
    how: str = "inner",
    suffix: str = "_rng",
) -> DataFrame:
    """Point-in-interval join: pair every left row whose ``left_ts``
    falls inside a right row's ``[right_start, right_end]`` interval
    (half-open when ``end_inclusive=False``), matching on the ``on``
    key(s).  ``how='inner'`` emits one row per (left, interval) match;
    ``how='left_semi'`` keeps each left row once if ANY interval
    contains it.

    Spark's naive plan for ``l.ts BETWEEN r.s AND r.e`` with only a
    range predicate is a nested-loop cross product.  This instead
    BUCKETIZES time: each interval explodes into the ``bucket_sec``-wide
    epoch buckets it covers, each point computes its single bucket, and
    the join becomes an EQUI-join on (key..., bucket) + a residual
    range filter — shuffle-partitionable, AQE/skew-handled like any
    hash join, no cross product (plan-pinned in tests).  A point's
    bucket is covered by every interval containing it (epoch
    truncation is monotonic), so matches are exact, and each match is
    produced exactly once (the point lives in exactly ONE bucket).

    ``bucket_sec`` trades explode factor against join selectivity:
    buckets-per-interval = duration/bucket_sec + 1, guarded by
    ``max_buckets`` (executor-side ``raise_error``, so a pathological
    interval fails loudly instead of OOM-ing the shuffle).  NULL
    key/ts/bounds rows never match (SQL semantics): inner drops them,
    left_semi drops the left row.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"range_join: how must be inner|left_semi, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    w = int(bucket_sec)
    if w <= 0:
        raise ValueError("range_join: bucket_sec must be positive")

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(w))

    seq = F.sequence(bucket(F.col(right_start)), bucket(F.col(right_end)))
    n_over = F.size(seq) > max_buckets
    rexp = (
        right.filter(
            F.lit(True)
            & F.col(right_start).isNotNull()
            & F.col(right_end).isNotNull()
            & (F.col(right_start) <= F.col(right_end))
        )
        .withColumn(
            "__b",
            F.when(
                n_over,
                F.raise_error(
                    F.format_string(
                        "range_join: interval spans %s buckets > max_buckets=%s"
                        " — raise bucket_sec or max_buckets",
                        F.size(seq).cast("string"),
                        F.lit(str(max_buckets)),
                    )
                ).cast("array<bigint>"),
            ).otherwise(seq),
        )
        .withColumn("__b", F.explode("__b"))
        .select(
            *[F.col(k).alias(f"__rk_{k}") for k in keys],
            "__b",
            F.col(right_start).alias("__s"),
            F.col(right_end).alias("__e"),
            *[F.col(p).alias(f"__p_{p}") for p in payload],
        )
    )
    lb = left.withColumn("__b", bucket(F.col(left_ts)))
    upper = (
        F.col(left_ts) <= F.col("__e")
        if end_inclusive
        else F.col(left_ts) < F.col("__e")
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__rk_{k}"))
    cond = cond & (lb["__b"] == rexp["__b"]) & (F.col(left_ts) >= F.col("__s")) & upper
    if how == "left_semi":
        return lb.join(rexp, cond, "left_semi").drop("__b")
    return (
        lb.join(rexp, cond, "inner")
        .select(
            *[F.col(c) for c in left.columns],
            F.col("__s").alias(f"{right_start}{suffix}"),
            F.col("__e").alias(f"{right_end}{suffix}"),
            *[F.col(f"__p_{p}").alias(f"{p}{suffix}") for p in payload],
        )
    )


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    ts_col: str,
    gap_sec: float,
    *,
    order_tie: str | None = None,
    out_col: str = "session_idx",
) -> DataFrame:
    """Label every row with a key-scoped session index (0-based, in
    time order): a row starts a new session when it is the key's first
    row or arrives ``>= gap_sec`` after the previous row.  The
    boundary is pinned to ``F.session_window`` semantics (a session
    spans ``[first, last + gap)``, so a gap of exactly ``gap_sec``
    splits) and cross-checked in tests.

    One hash exchange on the key + per-key sort; the two stacked
    window functions (lag, running sum) share the single sort.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col)] + ([F.col(order_tie)] if order_tie else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # NULL timestamps carry no gap evidence: each such row opens its own
    # session (coalesce keeps the running sum advancing instead of
    # silently merging them into the neighbour's session).
    is_new = F.coalesce(
        (
            prev.isNull()
            | ((F.col(ts_col) - prev) >= _interval(gap_sec))
        ).cast("long"),
        F.lit(1),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, (F.sum(is_new).over(wrun) - 1).cast("int"))


def session_stats(
    df: DataFrame,
    key: str | Sequence[str],
    ts_col: str,
    gap_sec: float,
    *,
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-session aggregates via the built-in ``session_window`` —
    the JVM-native gap-merge operator (map-side partial session merge,
    one shuffle) and the exact operator the streaming path would use
    with a watermark, so batch and streaming session semantics are
    identical by construction.

    Returns one row per (key..., session) with ``session_start`` /
    ``session_end`` (min/max event time — NOT the padded window end),
    ``n_events``, plus any caller ``aggs``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    win = F.session_window(F.col(ts_col), f"{gap_sec} seconds")
    return (
        df.groupBy(*[F.col(k) for k in keys], win)
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            *aggs,
        )
        .drop("session_window")
    )
