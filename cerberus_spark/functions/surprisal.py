"""Unigram-surprisal quality scoring: rank documents by how unlikely
their tokens are under a unigram language model — the cheap tier of
the CCNet/Wikipedia-LM filtering recipe (Wenzek et al. 2020 use a
5-gram KenLM; the unigram cut catches gibberish, encoding noise, and
vocabulary outliers at a fraction of the cost, with no model artifact
to ship: the corpus can score itself).

Spec (shared verbatim with the DuckDB oracle):

* Tokens: engine-wide (functions/text.words — lowercase, ASCII
  edge-strip, ``\\s+`` split).
* Model: add-alpha smoothed unigram over the training corpus,
  ``p(tok) = (c_tok + alpha) / (total + alpha * V)``; out-of-vocab
  tokens score ``alpha / (total + alpha * V)``.
* QUANTIZED log-probs: ``lp_q6 = floor(ln(p) * 1e6)`` (integer
  micro-nats).  Per-document sums are then BIGINT sums — exactly
  associative, so the result is independent of partitioning, row
  order, and engine float-summation order.  A raw double sum would
  differ in the last bits between any two plans, let alone two
  engines; the quantization IS the spec, not an approximation note
  (1e-6 nats ≪ any filtering threshold anyone sets).
* ``surprisal`` (mean negative log-prob, nats/token) =
  ``(-sum_q / n_tok) / 1e6`` — two double divisions in fixed order.
  Documents with no tokens score 0.0 with n_tok = 0.

Scale shape:

* Training: explode → per-token count with map-side partial combine
  (ONE shuffle whose width is the vocabulary, not the corpus);
  total/V reduce to one row and re-attach via broadcast cross-join.
* Scoring: per-doc token counts aggregate FIRST (shuffle on
  (id, tok) — this collapses hot-token multiplicity inside each doc,
  the skew that would otherwise dominate the model join), then join
  the model on tok.  The model of a 100 TB corpus (10^8-10^9 types)
  is too big to broadcast — the join shuffles on tok and AQE's
  skew-join splits the stopword keys; pass ``broadcast_model=True``
  when the vocabulary is known-small (fixtures, capped vocabs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import words

__all__ = ["unigram_model", "surprisal_report"]

_Q = 1_000_000.0


def _model_from_counts(counts: DataFrame,
                       alpha: float) -> tuple[DataFrame, DataFrame]:
    """(model, stats) from a (tok, _c) token-count table."""
    stats = counts.agg(
        F.sum("_c").alias("total"), F.count(F.lit(1)).alias("v"))
    denom = F.col("total") + F.lit(alpha) * F.col("v")
    stats = stats.select(
        "total", "v",
        F.floor(F.log(F.lit(alpha) / denom) * _Q)
        .cast("long").alias("oov_q6"))
    model = (counts.crossJoin(F.broadcast(stats))
             .select("tok",
                     F.floor(F.log((F.col("_c") + F.lit(alpha))
                                   / (F.col("total")
                                      + F.lit(alpha) * F.col("v"))) * _Q)
                     .cast("long").alias("lp_q6")))
    return model, stats


def unigram_model(train: DataFrame, text_col: str = "text",
                  alpha: float = 1.0) -> tuple[DataFrame, DataFrame]:
    """Train the smoothed unigram model.

    Returns ``(model, stats)``: model = (tok, lp_q6 bigint), stats =
    one row (total bigint, v bigint, oov_q6 bigint) carrying the
    out-of-vocab score for foreign corpora."""
    toks = train.select(F.explode(words(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    return _model_from_counts(counts, alpha)


def surprisal_report(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     train: DataFrame | None = None,
                     alpha: float = 1.0,
                     broadcast_model: bool = False) -> DataFrame:
    """Per-document mean unigram surprisal (nats/token, spec above):
    ``(id_col, n_tok, surprisal)`` for every input row.  ``train``
    defaults to ``df`` itself (self-scoring — no OOV by
    construction)."""
    dt = (df.select(id_col, F.explode(words(F.col(text_col))).alias("tok"))
            .groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("_n")))
    if train is None:
        # self-scoring: the model's token counts are a further
        # aggregation of dt — NOT a second corpus scan.  dt MUST be
        # persisted here: it feeds four plan consumers (scoring join,
        # model counts, and the stats row twice via the cross-joins),
        # and Catalyst re-expands an unpersisted subtree per consumer —
        # measured 4 full explode+tokenize passes over the corpus.
        # The cached table is (id, tok)-distinct counts, far smaller
        # than the text it replaces, spillable (MEMORY_AND_DISK).
        dt = dt.persist()
        counts = dt.groupBy("tok").agg(F.sum("_n").alias("_c"))
        model, stats = _model_from_counts(counts, alpha)
    else:
        model, stats = unigram_model(train, text_col, alpha)
    if broadcast_model:
        model = F.broadcast(model)
    scored = (dt.join(model, "tok", "left")
              .crossJoin(F.broadcast(stats.select("oov_q6")))
              .groupBy(id_col)
              .agg(F.sum(F.coalesce("lp_q6", "oov_q6") * F.col("_n"))
                   .alias("_sum_q"),
                   F.sum("_n").alias("n_tok")))
    base = df.select(id_col)
    return (base.join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
                    F.coalesce(
                        (-F.col("_sum_q")) / F.col("n_tok") / F.lit(_Q),
                        F.lit(0.0)).alias("surprisal")))
