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


_JAVA_REGEX_META = set("\\.[](){}*+?^$|")


def _re_quote(term: str) -> str:
    """Escape Java-regex metacharacters (letters/digits stay bare —
    backslash-escaping an alphanumeric is a Java regex class/error)."""
    return "".join("\\" + c if c in _JAVA_REGEX_META else c
                   for c in term)


def _term_freq(toks: Column, term: str) -> Column:
    # size(toks) - size(array_remove(toks, term)) counts tokens equal
    # to term exactly like size(filter(toks, t -> t = term)) (split
    # yields no NULL elements), but array_remove is codegen-able where
    # the filter lambda is CodegenFallback — with whole-stage codegen
    # the repeated `split(regexp_replace(lower(...)))` tokenization
    # subtree is then eliminated as a common subexpression instead of
    # being re-evaluated per term (measured 13.3s -> ~3s on the sf1.0
    # flat-BM25 head, guide §4.1: prefer built-ins over lambdas).
    return F.size(toks) - F.size(F.array_remove(toks, term))


def bm25_scores(df: DataFrame, id_col: str, text_col: str,
                terms: Sequence[str], k1: float = 1.2,
                b: float = 0.75, delta: float = 0.0) -> DataFrame:
    """Score every document that matches ≥1 query term.

    Returns ``(id_col, score)`` — only matching docs (a zero score
    means no term hit, and at corpus scale emitting every non-matching
    row would be an antifeature).  NULL/empty text never matches.

    ``delta > 0`` gives BM25+ (Lv & Zhai 2011, "Lower-bounding term
    frequency normalization"): each MATCHING term's saturation gets a
    constant ``+ delta``, so very long documents cannot normalize a
    genuine occurrence below a floor.  A constant add in the same
    expression tree — the per-term contribution stays gated on
    ``tf > 0``, so non-matching terms still contribute exactly 0.
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
    # The old post-projection filter (Σ_tf > 0) was pushed below the
    # projection by Catalyst, and FilterExec does no subexpression
    # elimination — every row paid |terms|+ extra full tokenizations
    # inside the filter condition (measured: 10.6s of the sf1.0 head's
    # 12s).  ``(^|\s)term(\s|$)`` on lower(text) is EXACTLY "term
    # occurs as a whitespace token" (tokens are maximal ``\S+`` runs of
    # the lowercased text; Java \s here = the same ASCII class the
    # tokenizer splits on), so pre-filtering with one anchored regex
    # keeps the identical row set while (a) pushing a cheap predicate
    # to the scan and (b) tokenizing only matching rows on the scoring
    # pass.  Terms containing whitespace (or empty) can never equal a
    # token and are excluded from the alternation.
    matchable = [t for t in terms
                 if t and not any(c in " \t\n\x0b\x0c\r" for c in t)]
    if matchable:
        pat = ("(^|\\s)("
               + "|".join(_re_quote(t) for t in matchable)
               + ")(\\s|$)")
        pre = F.lower(F.coalesce(F.col(text_col), F.lit(""))).rlike(pat)
    else:
        pre = F.lit(False)
    scored = df.filter(pre).select(
        F.col(id_col), F.size(toks).alias("_dl"), *tf_cols
    ).crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5)))
        tf = F.col(f"_tf{i}").cast("double")
        sat = (tf * F.lit(k1 + 1.0)
               / (tf + F.lit(k1) * (F.lit(1.0 - b)
                                    + F.lit(b) * F.col("_dl")
                                    / F.col("_avgdl"))))
        if delta:
            # BM25+ lower bound applies to MATCHING terms only
            score = score + F.when(tf > 0, idf * (sat + F.lit(delta))) \
                .otherwise(F.lit(0.0))
        else:
            score = score + idf * sat
    return scored.select(id_col, score.alias("score"))


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              terms: Sequence[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75, delta: float = 0.0) -> DataFrame:
    """Top-k BM25 ranking, deterministic (ties break on ascending id).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a
    per-partition bounded heap and a k-row driver merge; nothing
    resembling a full sort or collect at any corpus size.
    """
    s = bm25_scores(df, id_col, text_col, terms, k1=k1, b=b, delta=delta)
    return s.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# inverted index — the MANY-queries scale path
# ---------------------------------------------------------------------------
#
# The flat operators above re-tokenize the corpus per query call; a
# caller issuing many queries should pay tokenization ONCE.  The index
# is three parquet relations:
#
#   postings/   (tb, term, doc_id, tf, dl)  partitioned by tb =
#               pmod(xxhash64(term), term_buckets) — a query reads
#               ONLY its terms' partitions (partition pruning at the
#               file listing, before any I/O), and dl is denormalized
#               onto the posting row (one int) so scoring needs NO
#               join against a corpus-sized doc-length table.
#   stats/      one row (n, avgdl) — the corpus constants.
#
# Query cost is therefore ∝ the query terms' posting lists, not the
# corpus: a pruned scan, two tiny broadcast joins (per-term df ≤
# |terms| rows, stats 1 row), ONE exchange on doc_id over candidate
# rows only, and a TakeOrderedAndProject.  Scores are BIT-IDENTICAL
# to the flat path: the same expression tree per term, summed in
# caller order via per-term pivot columns (each term's contribution
# is a single value per doc, so the pivot sum is exact).


def write_text_index(df: DataFrame, path: str, id_col: str = "doc_id",
                     text_col: str = "text",
                     term_buckets: int = 256,
                     positions: bool = False) -> None:
    """Build the inverted index (two corpus scans — postings and the
    stats row — and one shuffle; build-time cost, amortized across
    every query served from the index).

    ``term_buckets`` bounds the partition count (a raw
    ``partitionBy(term)`` would mint one directory per vocabulary
    type — 10^8-10^9 dirs at corpus scale, a filesystem DoS); 256-4096
    buckets keep listings cheap while still pruning ~all I/O for
    few-term queries.

    ``positions=True`` adds each posting's sorted token-position array
    (``pos``) — the payload phrase queries need.  Roughly doubles the
    posting row; leave it off unless phrases are served.  Recorded in
    the stats row alongside term_buckets."""
    toks = words(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc_id"),
                     toks.alias("_toks"), F.size(toks).alias("dl"))
    if positions:
        postings = (base.select("doc_id", "dl",
                                F.posexplode("_toks").alias("p", "term"))
                    .groupBy("doc_id", "dl", "term")
                    .agg(F.count(F.lit(1)).alias("tf"),
                         F.sort_array(F.collect_list("p")).alias("pos"))
                    .withColumn("tb", F.pmod(F.xxhash64("term"),
                                             F.lit(term_buckets))))
    else:
        postings = (base.select("doc_id", "dl",
                                F.explode("_toks").alias("term"))
                    .groupBy("doc_id", "dl", "term")
                    .agg(F.count(F.lit(1)).alias("tf"))
                    .withColumn("tb", F.pmod(F.xxhash64("term"),
                                             F.lit(term_buckets))))
    (postings.write.mode("overwrite").partitionBy("tb")
     .parquet(f"{path}/postings"))
    # term_buckets is PINNED in the stats row: a query must enumerate
    # tb partitions with the exact bucket count the postings were laid
    # out with, or it silently drops terms — the probe reads the
    # layout from the index, never from a caller parameter (the same
    # meta-pinning guard as the band/embedding stores)
    (base.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
     .withColumn("term_buckets", F.lit(term_buckets))
     .withColumn("positions", F.lit(bool(positions)))
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/stats"))


def bm25_topk_indexed(spark, path: str, terms: Sequence[str],
                      k: int = 10, k1: float = 1.2,
                      b: float = 0.75, delta: float = 0.0,
                      phrase: bool = False) -> DataFrame:
    """Top-k BM25 from a :func:`write_text_index` index — identical
    output (bit-for-bit doubles) to :func:`bm25_topk` on the indexed
    corpus, at per-query cost ∝ the terms' posting lists.  The
    partition layout (``term_buckets``) comes from the index's own
    stats row, so queries can never enumerate the wrong partitions.

    ``delta`` is the BM25+ lower bound (see :func:`bm25_scores`) —
    postings exist only for matching terms, so the pivot gates it
    naturally.  ``phrase=True`` treats ``terms`` as an ORDERED,
    ADJACENT phrase: only documents containing the exact token
    sequence are ranked (df/idf statistics stay per-term — the
    standard phrase-query semantics).  Needs a positions index
    (``write_text_index(..., positions=True)``); adjacency is checked
    on the per-term position arrays gathered in the same pivot that
    collects the score columns — no extra join, no text touched."""
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    srow = spark.read.parquet(f"{path}/stats").first()
    tb = srow.asDict().get("term_buckets")
    if tb is None:
        raise ValueError(
            f"text index at {path} has no term_buckets in its stats "
            f"row (pre-layout-pin index) — rebuild with "
            f"write_text_index")
    if phrase:
        if len(terms) < 2:
            raise ValueError("a phrase needs at least two terms")
        if not srow.asDict().get("positions"):
            raise ValueError(
                f"text index at {path} has no positions payload — "
                f"rebuild with write_text_index(..., positions=True) "
                f"to serve phrase queries")
    buckets = sorted({_spark_term_bucket(t, int(tb)) for t in terms})
    p = (spark.read.parquet(f"{path}/postings")
         .filter(F.col("tb").isin(buckets) & F.col("term").isin(list(terms))))
    dfreq = p.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df"))
    stats = (spark.read.parquet(f"{path}/stats")
             .select(F.col("n").cast("double").alias("_n"),
                     F.col("avgdl").alias("_avgdl")))
    scored = (p.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats)))
    # one pivot column per term: each is a single posting row per doc,
    # so summing the when() picks that exact double (or NULL → 0.0)
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5)))
    tf = F.col("tf").cast("double")
    sat = (tf * F.lit(k1 + 1.0)
           / (tf + F.lit(k1) * (F.lit(1.0 - b)
                                + F.lit(b) * F.col("dl")
                                / F.col("_avgdl"))))
    contrib = idf * (sat + F.lit(delta)) if delta else idf * sat
    aggs = [F.sum(F.when(F.col("term") == t, contrib)).alias(f"_c{i}")
            for i, t in enumerate(terms)]
    if phrase:
        aggs += [F.first(F.when(F.col("term") == t, F.col("pos")),
                         ignorenulls=True).alias(f"_p{i}")
                 for i, t in enumerate(terms)]
    per_doc = scored.groupBy("doc_id").agg(*aggs)
    if phrase:
        # exists p in pos(term0) with p+i in pos(term_i) for all i —
        # evaluated on the gathered int arrays, pure Column algebra
        def _adj(p0):
            cond = F.lit(True)
            for i in range(1, len(terms)):
                cond = cond & F.array_contains(F.col(f"_p{i}"),
                                               p0 + F.lit(i))
            return cond

        match = F.exists(F.col("_p0"), _adj)
        for i in range(len(terms)):
            match = F.col(f"_p{i}").isNotNull() & match
        per_doc = per_doc.filter(match)
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    return (per_doc.select("doc_id", score.alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def _spark_term_bucket(term: str, term_buckets: int) -> int:
    """Driver-side twin of ``pmod(xxhash64(term), term_buckets)`` so
    the query can enumerate its partitions without a Spark job."""
    try:
        import xxhash  # pragma: no cover - not in this image
        h = xxhash.xxh64(term.encode(), seed=42).intdigest()
        return (h - (1 << 64) if h >= (1 << 63) else h) % term_buckets
    except ImportError:
        return _xxhash64_py(term.encode()) % term_buckets


def _xxhash64_py(data: bytes, seed: int = 42) -> int:
    """Pure-python xxhash64 (Collet's public spec) matching Spark's
    ``xxhash64()`` (seed 42), reduced mod 2^64 with signed pmod
    semantics applied by the caller.  Only runs driver-side on the
    query TERMS (a handful of short strings)."""
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed
        v4 = (seed - P1) & M
        while i <= n - 32:
            v1 = (rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                        * P2) & M, 31) * P1) & M
            v2 = (rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                        * P2) & M, 31) * P1) & M
            v3 = (rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                        * P2) & M, 31) * P1) & M
            v4 = (rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                        * P2) & M, 31) * P1) & M
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        h ^= (rotl((int.from_bytes(data[i:i + 8], "little") * P2) & M,
                   31) * P1) & M
        h = (rotl(h, 27) * P1 + P4) & M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    # Spark's xxhash64 returns a SIGNED long; the caller's Python %
    # already has pmod semantics on negatives
    return (h - (1 << 64) if h >= (1 << 63) else h)
