"""End-to-end corpus assembly: the full validated-to-trainer chain.

The reference stops at "this document is valid"; a training pipeline
continues: drop conversations that fail per-turn rules or the
conversation grammar, near-dedup at conversation granularity, scrub
PII, assign content-addressed train/val/test splits, and pack turns
into token budgets.  ``build_corpus`` composes the engine's tested
operators into that chain — every step is a lazy DataFrame transform,
so Catalyst sees ONE plan per output and the caller decides what to
materialize (write, count, or inspect).

Scale shape: the chain's shuffles are the operators' own documented
exchanges (validation adds none; grammar + rn/packing hash on
``conv_col``; dedup shuffles the tiny pair graph, not the corpus);
filters are anti/semi joins against SMALL per-conversation verdict
tables, which AQE broadcasts.  Nothing here collects to the driver.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W, functions as F

from .engine import SparkValidator
from .functions import text as T
from .functions.dedup import dedup_near
from .functions.pii import redact_pii
from .operators import pipeline as P

__all__ = ["CorpusBuild", "build_corpus"]


_REP_FIELD = re.compile(r"^(?:top(\d+)gram_char_frac|dup(\d+)gram_char_frac"
                        r"|dup_line_frac|dup_line_char_frac)$")


def _quality_filter(conv_text: DataFrame, conv_col: str, text_col: str,
                    bounds: Mapping) -> DataFrame:
    """conv ids whose conversation text satisfies every (min, max)
    bound.  Signal registry: tokens, quality_score, and the repetition
    fields; repetition runs ONE Arrow pass computing exactly the
    requested n-gram orders."""
    top_ns, dup_ns, cols = [], [], []
    for name in bounds:
        if name == "tokens":
            cols.append(T.token_count(F.col(text_col)).alias(name))
        elif name == "quality_score":
            cols.append(T.quality_score(F.col(text_col)).alias(name))
        elif (m := _REP_FIELD.match(name)):
            if m.group(1):
                top_ns.append(int(m.group(1)))
            elif m.group(2):
                dup_ns.append(int(m.group(2)))
        else:
            raise ValueError(f"unknown quality signal: {name!r}")
    scored = conv_text.select(conv_col, text_col, *cols)
    if top_ns or dup_ns or "dup_line_frac" in bounds \
            or "dup_line_char_frac" in bounds:
        from .functions.repetition import repetition_signals_udf

        rep = repetition_signals_udf(sorted(set(top_ns)),
                                     sorted(set(dup_ns)))
        scored = scored.withColumn("_rep", rep(F.col(text_col))) \
                       .select("*", "_rep.*").drop("_rep")
    pred = F.lit(True)
    for name, (lo, hi) in bounds.items():
        if lo is not None:
            pred = pred & (F.col(name) >= lo)
        if hi is not None:
            pred = pred & (F.col(name) <= hi)
    return scored.filter(pred).select(conv_col)


@dataclass
class CorpusBuild:
    """Lazy outputs of :func:`build_corpus` (nothing is computed until
    the caller acts on a field)."""

    #: surviving turns — validated, grammar-clean, dedup'd, redacted,
    #: with ``split`` and ``rn`` (1-based position in the packing order)
    turns: DataFrame
    #: per-turn rule violation rows (the full pre-filter corpus)
    violations: DataFrame
    #: per-conversation grammar scorecard, or None if no rules given
    seq_summary: DataFrame | None
    #: (conv_col, rn, idx, n_tok, pack_id) per surviving turn, or None
    #: if no budget given; join to ``turns`` on (conv, rn)
    packs: DataFrame | None


def build_corpus(
    df: DataFrame,
    schema: Mapping,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    order_tie: Sequence[str] = (),
    sequence_rules: Mapping | None = None,
    quality_bounds: Mapping[str, tuple] | None = None,
    dedup_threshold: float | None = 0.6,
    dedup_kw: Mapping | None = None,
    redact: bool = True,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05)),
    split_seed: str = "",
    mixture_col: str | None = None,
    mixture_temperature: float = 1.0,
    pack_budget: int | None = None,
    validator_kw: Mapping | None = None,
) -> CorpusBuild:
    """Run the full corpus-assembly chain over a transcripts table.

    Filter policy is conversation-granular throughout: a conversation
    with ANY rule-failing turn, any grammar violation, or a
    lower-id near-duplicate is dropped whole — a half-dropped
    conversation is worse training data than none.  ``sequence_rules``
    takes :func:`~cerberus_spark.operators.sequence.sequence_summary`
    keyword arguments (first_roles / transitions / contiguous /
    monotone_ts); ``dedup_kw`` forwards to LSH candidate generation
    (num_perm / bands / bucket_cap).  ``quality_bounds`` maps signal
    names to (min, max) bounds (None = unbounded) evaluated on the
    CONVERSATION'S concatenated text — ``tokens``, ``quality_score``,
    and the repetition family by field name (``dup_line_frac``,
    ``dup_line_char_frac``, ``top{n}gram_char_frac``,
    ``dup{n}gram_char_frac``); a conversation outside any bound is
    dropped whole, BEFORE near-dedup (garbage must not become a
    cluster's kept representative).  ``mixture_col`` turns on
    temperature-flattened domain resampling (share ∝ p^(1/T)) at
    conversation granularity — a conversation's stratum is its
    lowest-``idx_col`` turn's value, so mixed-stratum conversations
    stay whole."""
    validator = SparkValidator(schema, key_cols=(conv_col, idx_col),
                               **dict(validator_kw or {}))
    res = validator.validate(df)
    violations = res.violations

    # conversations with no failing turn (bool_and: one conv_col agg)
    ok_convs = (
        res.annotated.groupBy(conv_col)
        .agg(F.bool_and("passed").alias("_ok"))
        .filter("_ok").select(conv_col)
    )
    turns = df.join(ok_convs, conv_col, "left_semi")

    seq_summary = None
    if sequence_rules:
        from .operators.sequence import sequence_summary

        seq_summary = sequence_summary(
            turns, conv_col=conv_col, idx_col=idx_col,
            order_tie=order_tie, **dict(sequence_rules))
        turns = turns.join(
            seq_summary.filter(F.col("seq_ok")).select(conv_col),
            conv_col, "left_semi")

    conv_text = None
    if dedup_threshold is not None or quality_bounds:
        conv_text = T.conversation_text(
            turns, conv_col, text_col,
            order_cols=(idx_col, *order_tie))

    if quality_bounds:
        ok_quality = _quality_filter(conv_text, conv_col, text_col,
                                     quality_bounds)
        turns = turns.join(ok_quality, conv_col, "left_semi")
        if dedup_threshold is not None:
            # dedup sees only quality-passing conversations (a garbage
            # conv must not become a cluster's kept representative)
            conv_text = conv_text.join(ok_quality, conv_col, "left_semi")

    if dedup_threshold is not None:
        kept = dedup_near(conv_text, conv_col, text_col,
                          threshold=dedup_threshold,
                          **dict(dedup_kw or {}))
        turns = turns.join(kept.select(conv_col), conv_col, "left_semi")

    if redact:
        turns = turns.withColumn(text_col, redact_pii(F.col(text_col)))

    if mixture_col is not None:
        # conversation-granular: resample on the conv's OWN stratum
        # value per turn would split conversations whose turns differ —
        # flatten the stratum to the conversation's first value first
        conv_strata = (
            turns.groupBy(conv_col)
            .agg(F.min_by(mixture_col, idx_col).alias("_stratum")))
        # NOT split_seed verbatim: sharing the bucket stream with
        # split_assign would correlate the two stages — a thinned
        # stratum's survivors occupy a bucket PREFIX, which the split
        # thresholds would then carve non-proportionally (a hard-thinned
        # domain would land ~entirely in 'train')
        kept = P.mixture_resample(
            conv_strata, "_stratum", conv_col,
            temperature=mixture_temperature, seed=split_seed + "/mixture",
        ).select(conv_col)
        turns = turns.join(kept, conv_col, "left_semi")

    turns = P.split_assign(turns, conv_col, splits, seed=split_seed)
    w = W.partitionBy(conv_col).orderBy(
        *[F.col(c).asc_nulls_first() for c in (idx_col, *order_tie)])
    turns = turns.withColumn("rn", F.row_number().over(w))

    packs = None
    if pack_budget is not None:
        packs = P.pack_sequences(
            turns, conv_col, idx_col, text_col,
            budget=pack_budget, order_tie=order_tie)

    return CorpusBuild(turns=turns, violations=violations,
                       seq_summary=seq_summary, packs=packs)
