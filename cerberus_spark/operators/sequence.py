"""Conversation-sequence grammar checks (dataset-level, transcripts).

The reference validates one document at a time
(/root/reference/cerberus/validator.py:1009-1049) — it can say "this
turn's role is in the allowed set" but not "an assistant turn never
follows an assistant turn" or "turn_idx is dense from 0".  These are
*sequence* constraints over the turns of one conversation, and they are
the natural next dataset-level rule family for the transcripts payload
(conv_id, turn_idx, role, text, tool, ts).

Spark-first shape: ONE window pass per conversation —
``Window.partitionBy(conv).orderBy(idx, *tie)`` with ``lag`` of the
role / index / timestamp columns — then every enabled grammar rule is a
Column predicate over (previous row, current row).  Violations are
emitted as a single ``array_compact + explode`` projection, so the
whole operator is one hash exchange + one sort regardless of how many
rules are enabled (plan-pinned in tests/test_sequence.py).  The window
partitioning IS the north rule's explicit conv_id partitioning; AQE
handles long-tail (hot conversation) skew.

Ordering must be TOTAL for the checks to be deterministic when the
data itself is dirty (duplicate (conv, turn_idx) rows are exactly what
we're hunting): callers pass ``order_tie`` columns that make the sort
key unique.  All orderings are ASC NULLS FIRST on both engines (DuckDB
oracles must pin NULLS FIRST explicitly — its default is NULLS LAST).

Null semantics follow SQL three-valued logic: a predicate only emits a
violation when it is TRUE, so e.g. a NULL role neither passes nor fails
a transition rule here (the per-row ``required``/``allowed`` rules
already flag it).  This keeps the Spark and DuckDB twins identical by
construction.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .. import errors as E
from .dataset import _violation_struct

__all__ = ["sequence_violations", "sequence_summary"]


def _lagged(
    df: DataFrame,
    conv_col: str,
    idx_col: str,
    role_col: str,
    ts_col: str | None,
    order_tie: Sequence[str],
    keys: Sequence[str],
) -> DataFrame:
    """Project the narrow frame and attach lag columns in one window."""
    order_cols = [idx_col, *order_tie]
    w = W.partitionBy(conv_col).orderBy(
        *[F.col(c).asc_nulls_first() for c in order_cols]
    )
    need = dict.fromkeys(
        [*keys, conv_col, idx_col, role_col, *([ts_col] if ts_col else []),
         *order_tie]
    )
    out = df.select(*need).withColumns(
        {
            # NULL only on the first row of a conversation (lag of a
            # constant) — lag(role) can't distinguish "first row" from
            # "previous role was NULL"
            "_has_prev": F.lag(F.lit(1)).over(w).isNotNull(),
            "_prev_role": F.lag(role_col).over(w),
            "_prev_idx": F.lag(idx_col).over(w),
        }
    )
    if ts_col:
        out = out.withColumn("_prev_ts", F.lag(ts_col).over(w))
    return out


def _checks(
    lagged_cols: Mapping[str, str],
    first_roles: Sequence[str] | None,
    transitions: Mapping[str, Sequence[str]] | None,
    contiguous: bool,
    monotone_ts: bool,
) -> list[tuple[Column, Column]]:
    """(predicate, violation_struct) per enabled rule, over the lagged frame."""
    idx_col = lagged_cols["idx"]
    role_col = lagged_cols["role"]
    ts_col = lagged_cols.get("ts")
    has_prev = F.col("_has_prev")
    role = F.col(role_col)
    idx = F.col(idx_col)
    out: list[tuple[Column, Column]] = []
    if first_roles is not None:
        cond = ~has_prev & ~role.isin(*first_roles)
        out.append((cond, _violation_struct(
            E.SEQUENCE_VIOLATION, F.array(F.lit(role_col)),
            ["__dataset__", "sequence"], "first_role", role,
            F.lit(",".join(first_roles)),
        )))
    if transitions:
        cond = F.lit(False)
        for src, allowed in transitions.items():
            bad = (F.col("_prev_role") == src) & ~role.isin(*allowed)
            cond = cond | bad
        cond = has_prev & cond
        out.append((cond, _violation_struct(
            E.SEQUENCE_VIOLATION, F.array(F.lit(role_col)),
            ["__dataset__", "sequence"], "transition",
            F.concat(F.col("_prev_role"), F.lit("->"), role),
        )))
    if contiguous:
        cond = F.when(~has_prev, idx != 0).otherwise(
            idx != F.col("_prev_idx") + 1
        )
        out.append((cond, _violation_struct(
            E.SEQUENCE_VIOLATION, F.array(F.lit(idx_col)),
            ["__dataset__", "sequence"], "contiguous", idx,
            F.col("_prev_idx").cast("string"),
        )))
    if monotone_ts:
        if not ts_col:
            raise ValueError("monotone_ts requires ts_col")
        cond = has_prev & (F.col(ts_col) < F.col("_prev_ts"))
        out.append((cond, _violation_struct(
            E.SEQUENCE_VIOLATION, F.array(F.lit(ts_col)),
            ["__dataset__", "sequence"], "monotone_ts", F.col(ts_col),
            F.col("_prev_ts").cast("string"),
        )))
    if not out:
        raise ValueError("no sequence rules enabled")
    return out


def sequence_violations(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str | None = "ts",
    first_roles: Sequence[str] | None = None,
    transitions: Mapping[str, Sequence[str]] | None = None,
    contiguous: bool = False,
    monotone_ts: bool = False,
    order_tie: Sequence[str] = (),
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """One SEQUENCE_VIOLATION (0x107) row per grammar breach.

    Rules (each optional, all evaluated in the same single window pass):

    * ``first_roles`` — the first turn of a conversation must have a
      role in this set (``constraint='first_role'``).
    * ``transitions`` — mapping source-role → allowed next roles; a
      turn whose predecessor's role is a key and whose own role is not
      in the allowed set violates (``constraint='transition'``,
      value ``'src->dst'``).  Roles absent from the mapping are
      unconstrained as sources.
    * ``contiguous`` — turn_idx must be exactly 0,1,2,… in sort order:
      the first row must be 0 and each successor must be prev+1
      (``constraint='contiguous'``; flags duplicates, gaps and
      negatives in one rule).
    * ``monotone_ts`` — ``ts`` must not regress vs the previous turn
      (``constraint='monotone_ts'``).

    Returns ``keys...`` (default ``(conv_col, idx_col)``) + the
    violation-row contract fields, unionable with every other
    dataset-level check.
    """
    keys = list(keys or (conv_col, idx_col))
    lag = _lagged(df, conv_col, idx_col, role_col, ts_col, order_tie, keys)
    checks = _checks(
        {"idx": idx_col, "role": role_col, "ts": ts_col},
        first_roles, transitions, contiguous, monotone_ts,
    )
    arr = F.array_compact(F.array(
        *[F.when(cond, v) for cond, v in checks]
    ))
    return (
        lag.select(*keys, F.explode(arr).alias("v"))
        .select(*keys, "v.*")
    )


def sequence_summary(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str | None = "ts",
    first_roles: Sequence[str] | None = None,
    transitions: Mapping[str, Sequence[str]] | None = None,
    contiguous: bool = False,
    monotone_ts: bool = False,
    order_tie: Sequence[str] = (),
) -> DataFrame:
    """Per-conversation grammar scorecard — same rules as
    :func:`sequence_violations`, aggregated in the same pass.

    Returns one row per conversation: ``(conv_col, n_turns,
    n_<constraint>...  one count column per enabled rule, n_violations,
    seq_ok)``.  The window sort feeds a partial (map-side combined)
    hash aggregate on the already-co-partitioned conv key, so the
    summary costs no second exchange.
    """
    lag = _lagged(df, conv_col, idx_col, role_col, ts_col, order_tie,
                  keys=(conv_col,))
    checks = _checks(
        {"idx": idx_col, "role": role_col, "ts": ts_col},
        first_roles, transitions, contiguous, monotone_ts,
    )
    labels = []
    if first_roles is not None:
        labels.append("first_role")
    if transitions:
        labels.append("transition")
    if contiguous:
        labels.append("contiguous")
    if monotone_ts:
        labels.append("monotone_ts")
    aggs = [F.count(F.lit(1)).alias("n_turns")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{lab}")
        for (cond, _v), lab in zip(checks, labels)
    ]
    agg = lag.groupBy(conv_col).agg(*aggs)
    total = sum((F.col(f"n_{lab}") for lab in labels), F.lit(0))
    return agg.withColumns({
        "n_violations": total.cast("long"),
        "seq_ok": total == 0,
    })
