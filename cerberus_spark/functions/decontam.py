"""Benchmark decontamination: flag corpus documents that share word
n-grams with a benchmark/eval set (the standard pre-training hygiene
pass — e.g. GPT-3 appendix C, PaLM §7, Dolma §4 all ship a variant).

The reference engine (pyeve/cerberus) has no corpus-level notion at
all; this operator extends the same violation-report shape (one row
per document, explicit evidence counts) to cross-dataset leakage.

Semantics
---------
A document is *contaminated* when at least ``min_matches`` of its
DISTINCT word ``n``-grams appear anywhere in the benchmark set.
Tokenization is the engine-wide spec (functions/text.words: lowercase,
edge-strip, ASCII ``\\s+`` split); n-grams are STRICT — a text with
fewer than ``n`` words contains no n-gram and can never match (unlike
dedup.shingles, which degrades short texts to their full word join:
there the goal is recall on near-dups, here a sub-n-gram "match"
would be fabricated evidence).

Scale shape (the part that matters at 100 TB)
---------------------------------------------
* The benchmark side is SMALL by construction (eval sets are MBs, the
  corpus is TBs).  Its distinct n-gram hashes are built once and
  ``F.broadcast`` to every executor — the corpus NEVER shuffles on
  n-gram: the join is a map-side broadcast hash semi-probe that
  pipelines into the corpus scan.
* Join keys are a 64-bit hash of the n-gram string (blake2b-8,
  computed in the same Arrow pass that builds the grams), not the
  string —
  8 bytes per probe instead of ~8·word_len, and the broadcast table
  is a long hash set.  At 10^12 corpus n-grams the 64-bit birthday
  term contributes ~1e-8 false-match probability per document —
  documented precision trade, same one dedup's pre-hashed shingles
  (_sh64_df) already makes.
* Per-doc match counts partially aggregate map-side before the ONLY
  shuffle, which carries just (doc_id, count) for matching docs.
  The final report join is doc_id↔doc_id where the matched side is
  tiny → AQE broadcasts it.
* n-gram generation runs in the Arrow batch path (dedup's shingle UDF
  machinery): the Column ``transform(sequence, slice, concat_ws)``
  HOF is CodegenFallback — measured 8-16× slower on this exact shape
  (see functions/dedup.py:197).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark import Broadcast
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["ngrams_strict_udf", "ngram_hashes_udf",
           "contamination_report",
           "contamination_report_broadcast", "collect_benchmark_grams",
           "excise_contamination", "decontaminate"]

_WS_RE = re.compile(r"\s+", re.ASCII)
#: ASCII edge-strip — Python's str.strip() is unicode-wide and would
#: diverge from the engine tokenization spec (same caveat as
#: dedup.shingles_udf) on e.g. NBSP-edged text
_EDGE_RE = re.compile(r"^\s+|\s+$", re.ASCII)


def _words(t: str) -> list[str]:
    """The engine tokenization (functions/text.words) in Python:
    ASCII edge-strip, ASCII ``\\s+`` split, drop empties."""
    return [w for w in _WS_RE.split(_EDGE_RE.sub("", t)) if w]


def _grams_of(t: str | None, n: int) -> list[str]:
    if t is None:
        return []
    ws = _words(t.lower())
    if len(ws) < n:
        return []
    return list(dict.fromkeys(
        " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)))


def _gram_hash(g: str) -> int:
    """64-bit gram hash (blake2b-8) — the join key both corpus and
    benchmark sides share.  Computed in Python on both sides, so the
    pairing is consistent by construction; collisions carry the same
    ~s²/2⁶⁴ birthday term the module header documents."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(),
        "big", signed=True)


def ngrams_strict_udf(n: int) -> Column:
    """Factory: Arrow-batched DISTINCT strict word n-grams.

    Mirrors functions/text.words tokenization exactly (lowercase,
    ASCII edge-strip, ASCII whitespace split); texts with fewer than
    ``n`` words yield an EMPTY array (no degenerate short-gram
    fallback)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _ng(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _grams_of(t, n))

    return _ng


def ngram_hashes_udf(n: int) -> Column:
    """Like :func:`ngrams_strict_udf` but emits the 64-bit gram hashes
    (array<long>) — 8 bytes per gram instead of the gram string, so
    downstream persists/joins carry longs, never text."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _ngh(s: pd.Series) -> pd.Series:
        return s.map(lambda t: [_gram_hash(g) for g in _grams_of(t, n)])

    return _ngh


def _doc_grams(df: DataFrame, id_cols: list[str], text_col: str,
               n: int, persist: bool) -> DataFrame:
    """(id_cols..., n_ngrams, _ghs array<long>) — one Arrow pass.

    Without the persist, this frame's THREE consumers (the explode
    branch, the explode's Catalyst-inferred ``size > 0`` pushdown
    filter, and the report's per-doc gram count) each re-run the
    Python n-gram UDF over the corpus — measured as 3 ArrowEvalPython
    nodes in the executed plan.  The cached column is the HASHES
    (8 bytes/gram), not the gram strings (~n× the document text —
    a storage blowup, not a cache)."""
    out = df.select(
        *id_cols, ngram_hashes_udf(n)(F.col(text_col)).alias("_ghs")
    ).withColumn("n_ngrams", F.size("_ghs"))
    return out.persist() if persist else out


def benchmark_ngram_hashes(bench: DataFrame, text_col: str = "text",
                           n: int = 8) -> DataFrame:
    """Distinct 64-bit n-gram hashes of the benchmark set — one column
    ``g``.  Small enough to broadcast; persist it yourself if probing
    several corpora."""
    return (bench
            .select(F.explode(ngram_hashes_udf(n)(F.col(text_col)))
                    .alias("g"))
            .distinct())


def contamination_report(
    df: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_matches: int = 1,
    persist_grams: bool = True,
) -> DataFrame:
    """Per-document contamination report over the full corpus.

    Returns one row per input document:
    ``(id_col, n_ngrams, n_matched, contaminated)`` where ``n_ngrams``
    is the document's distinct strict n-gram count, ``n_matched`` how
    many of those appear in the benchmark set, and ``contaminated``
    whether ``n_matched >= min_matches``.

    CACHE LIFETIME: with ``persist_grams=True`` (default) the per-doc
    gram-hash frame stays pinned until the ContextCleaner GCs the
    report's plan — correct for one-shot reports, but a BATCH LOOP
    (e.g. a per-epoch ingest calling this every micro-batch) would
    accumulate one cached relation per call.  Loop callers should pass
    ``persist_grams=False`` (pays the UDF 3× per call, but nothing
    pins) or use :func:`contamination_report_broadcast`, the stateless
    zero-cache form built for exactly that shape.
    """
    bg = benchmark_ngram_hashes(bench, bench_text_col or text_col, n)
    grams = _doc_grams(df, [id_col], text_col, n, persist_grams)
    dg = grams.select(id_col, F.explode("_ghs").alias("g"))
    matched = (dg.join(F.broadcast(bg), "g")
                 .groupBy(id_col)
                 .agg(F.count("*").alias("n_matched")))
    base = grams.select(id_col, "n_ngrams")
    return (base.join(matched, id_col, "left")
            .select(
                id_col, "n_ngrams",
                F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
                (F.coalesce("n_matched", F.lit(0)) >= min_matches)
                .alias("contaminated")))


def collect_benchmark_grams(bench: DataFrame, text_col: str = "text",
                            n: int = 8) -> set:
    """Driver-side distinct gram strings of the eval set — collect ONCE
    and reuse across batches/streams via
    ``contamination_report_broadcast(grams_set=...)``."""
    return set(
        r[0] for r in
        bench.select(F.explode(ngrams_strict_udf(n)(F.col(text_col)))
                     .alias("g")).distinct().collect())


def contamination_report_broadcast(
    df: DataFrame,
    bench: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_matches: int = 1,
    grams_set: set | Broadcast | None = None,
) -> DataFrame:
    """Shuffle-free variant of :func:`contamination_report`: the
    benchmark's distinct gram STRINGS are collected once and shipped
    as a Spark broadcast variable; one Arrow UDF computes each doc's
    distinct-gram and matched counts against the in-memory set.

    Same semantics (gram strings compare exactly — no 64-bit hash
    approximation), different scale trade: ZERO exchanges — a pure
    projection — at the cost of holding the eval grams on every
    executor in Python (eval sets are MBs; fine).  Because it is
    stateless it is the STREAMING form: append-mode safe on a
    readStream frame, where the join+groupBy of the batch form would
    demand watermarked aggregation.  The driver-side collect is of the
    BENCHMARK only, never the corpus; pass ``grams_set``
    (:func:`collect_benchmark_grams`) to skip even that — e.g. once per
    stream instead of once per micro-batch."""
    if grams_set is None:
        if bench is None:
            raise ValueError("pass either bench or grams_set")
        grams_set = collect_benchmark_grams(
            bench, bench_text_col or text_col, n)
    # an already-shipped Broadcast handle is reused as-is — a per-call
    # sc.broadcast would re-serialize the eval grams to every executor
    # on every call (every micro-batch, for streaming callers)
    bc = (grams_set if isinstance(grams_set, Broadcast)
          else df.sparkSession.sparkContext.broadcast(grams_set))

    @F.pandas_udf(T.StructType([
        T.StructField("n_ngrams", T.IntegerType()),
        T.StructField("n_matched", T.IntegerType())]))
    def _probe(s: pd.Series) -> pd.DataFrame:
        bg = bc.value
        rows = []
        for t in s:
            if t is None:
                rows.append((0, 0))
                continue
            ws = _words(t.lower())
            gs = ({" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
                  if len(ws) >= n else set())
            rows.append((len(gs), sum(1 for g in gs if g in bg)))
        return pd.DataFrame(rows, columns=["n_ngrams", "n_matched"])

    out = df.select(id_col, _probe(F.col(text_col)).alias("_c"))
    return out.select(
        id_col, "_c.n_ngrams", "_c.n_matched",
        (F.col("_c.n_matched") >= min_matches).alias("contaminated"))


def excise_contamination(
    df: DataFrame,
    bench: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    grams_set: set | Broadcast | None = None,
    out_col: str = "text_clean",
) -> DataFrame:
    """SURGICAL decontamination: instead of dropping a contaminated
    document, remove exactly the words covered by benchmark-matching
    n-grams and keep the rest — the span-level policy most production
    pipelines prefer (dropping a 50k-word doc over one quoted eval
    sentence wastes the other 49,990 words).

    Returns every input row as ``(id_col, out_col, n_removed)``:
    ``out_col`` is the original-case words NOT covered by any matched
    n-gram, re-joined with single spaces (whitespace is normalized —
    the output is tokenizer-bound text, not a byte-preserving edit);
    overlapping matched windows never double-count (positional
    coverage, same construction as repetition's dup-gram fraction).
    Matching is on the engine's lowercased tokens; the REBUILD keeps
    each surviving word's original form.  NULL text stays NULL.

    Scale: same zero-exchange shape as
    :func:`contamination_report_broadcast` — one Arrow projection
    probing the broadcast gram set; ``grams_set`` skips the per-call
    benchmark collect."""
    if grams_set is None:
        if bench is None:
            raise ValueError("pass either bench or grams_set")
        grams_set = collect_benchmark_grams(
            bench, bench_text_col or text_col, n)
    # an already-shipped Broadcast handle is reused as-is — a per-call
    # sc.broadcast would re-serialize the eval grams to every executor
    # on every call (every micro-batch, for streaming callers)
    bc = (grams_set if isinstance(grams_set, Broadcast)
          else df.sparkSession.sparkContext.broadcast(grams_set))

    @F.pandas_udf(T.StructType([
        T.StructField("clean", T.StringType()),
        T.StructField("n_removed", T.IntegerType())]))
    def _excise(s: pd.Series) -> pd.DataFrame:
        bg = bc.value
        rows = []
        for t in s:
            if t is None:
                rows.append((None, 0))
                continue
            ws = _words(t)
            lc = [w.lower() for w in ws]
            covered = [False] * len(ws)
            for i in range(len(lc) - n + 1):
                if " ".join(lc[i:i + n]) in bg:
                    for j in range(i, i + n):
                        covered[j] = True
            kept = [w for w, c in zip(ws, covered) if not c]
            rows.append((" ".join(kept), sum(covered)))
        return pd.DataFrame(rows, columns=["clean", "n_removed"])

    out = df.select(id_col, _excise(F.col(text_col)).alias("_e"))
    return out.select(id_col, F.col("_e.clean").alias(out_col),
                      "_e.n_removed")


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_matches: int = 1,
) -> DataFrame:
    """Drop contaminated documents (full rows of the survivors).

    The contaminated-id set is tiny relative to the corpus, so the
    anti-join broadcasts under AQE; the corpus itself never shuffles.
    """
    bad = (contamination_report(df, bench, id_col, text_col,
                                bench_text_col, n, min_matches)
           .filter("contaminated").select(id_col))
    return df.join(bad, id_col, "left_anti")
