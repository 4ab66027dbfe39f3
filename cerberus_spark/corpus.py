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

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W, functions as F

from .engine import SparkValidator
from .functions import text as T
from .functions.dedup import dedup_near
from .functions.pii import redact_pii
from .operators import pipeline as P

__all__ = ["CorpusBuild", "build_corpus"]


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
    (num_perm / bands / bucket_cap).  ``mixture_col`` turns on
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

    if dedup_threshold is not None:
        conv_text = T.conversation_text(
            turns, conv_col, text_col,
            order_cols=(idx_col, *order_tie))
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
