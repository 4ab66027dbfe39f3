"""BM25 keyword ranking over a document corpus.

Retrieval is a first-class training-data-pipeline need (targeted
corpus slicing, eval-set mining, quality spot-checks); the reference
engine has no ranking affordance (SURVEY §2 — its query surface stops
at validation + projection), so this module is additive scope built
Spark-first:

* Term frequencies are pure Column algebra over the shared ``words()``
  tokenizer — ``size(filter(tokens, t -> t = term))`` per query term,
  one whole-stage-codegen projection, no explode, no Python.
* Corpus statistics (N, avgdl, per-term document frequency) reduce in
  ONE map-combined aggregation to a single row that broadcast-joins
  back onto the scored projection — the corpus itself never shuffles.
* Top-k is a global ``TakeOrderedAndProject`` (per-partition heaps +
  driver merge of k rows), never a full sort.

The scoring expression is the Lucene BM25 form
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (non-negative for any df)
with the classic saturation/length normalization
``tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.  Terms are summed in
caller order on both engines, so a DuckDB twin running the identical
expression tree reproduces the doubles bit-for-bit.

At 100 TB: the stats pass and the scoring pass are two scans of the
(id, text) columns.  Both prune to two columns and both are pure
projections + one 1-row aggregate, so the operator is scan-bound; a
caller issuing MANY queries over the same corpus should materialize
``words()`` + lengths once (or build an inverted index — out of scope
here) rather than re-tokenizing per call.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .text import words


def _term_freq(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_scores(df: DataFrame, id_col: str, text_col: str,
                terms: Sequence[str], k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """Score every document that matches ≥1 query term.

    Returns ``(id_col, score)`` — only matching docs (a zero score
    means no term hit, and at corpus scale emitting every non-matching
    row would be an antifeature).  NULL/empty text never matches.
    """
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    toks = words(F.col(text_col))
    tf_cols = [_term_freq(toks, t).alias(f"_tf{i}")
               for i, t in enumerate(terms)]
    base = df.select(F.col(id_col),
                     F.size(toks).alias("_dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("double")
          .alias(f"_df{i}") for i in range(len(terms))])
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5)))
        tf = F.col(f"_tf{i}").cast("double")
        score = score + idf * (
            tf * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b)
                                 + F.lit(b) * F.col("_dl") / F.col("_avgdl"))))
    matched = sum((F.col(f"_tf{i}") for i in range(len(terms))),
                  F.lit(0))
    return (scored.filter(matched > 0)
            .select(id_col, score.alias("score")))


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              terms: Sequence[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75) -> DataFrame:
    """Top-k BM25 ranking, deterministic (ties break on ascending id).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a
    per-partition bounded heap and a k-row driver merge; nothing
    resembling a full sort or collect at any corpus size.
    """
    s = bm25_scores(df, id_col, text_col, terms, k1=k1, b=b)
    return s.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
