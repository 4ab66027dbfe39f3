"""Corpus-assembly operators for training-data pipelines.

The reference stops at per-document validation; a pipeline that feeds a
trainer also has to SPLIT the corpus (train/val/test), SAMPLE it
(per-stratum fractions), TRUNCATE long conversations, and PACK turns
into fixed token budgets.  These four live here.  Everything except the
non-associative packing scan is a pure Catalyst expression; all
randomness is derived from content hashes, so every operator is
deterministic, re-runnable, and cluster-size-invariant — a resumed or
re-sharded job assigns every row to the same split/sample/pack.

Cross-engine hash spec (shared with functions/dedup.py:517-521): a
row's bucket is the first 8 hex digits of ``md5(key || '\\x1f' || seed)``
read as an unsigned 32-bit int, mod ``n_buckets``.  Spark computes it
as ``conv(substr(md5(x),1,8),16,10)``, DuckDB as
``('0x' || substr(md5(x),1,8))::BIGINT`` — bit-identical, so the DuckDB
oracles replay assignments exactly.

Scale notes:

* ``split_assign`` / ``stratified_sample`` are stateless per-row
  projections/filters — no shuffle at all; they pipeline into the scan.
* ``tail_turns`` / ``pack_sequences`` shuffle ONCE on conv_id (the
  north rule's explicit conversation partitioning); AQE handles
  hot-conversation skew.  Packing is a per-conversation greedy scan —
  non-associative, so it runs in ``applyInPandas`` (Arrow-batched; the
  per-group loop touches two ints per turn).  Token counts are computed
  JVM-side (functions/text.token_count) BEFORE the UDF so Python never
  touches text.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from ..functions import text as T

__all__ = [
    "hash_bucket", "split_assign", "stratified_sample",
    "mixture_resample", "tail_turns", "pack_sequences",
    "chunk_documents",
]

#: separator between key and seed inside the hashed string — a control
#: char that cannot appear in keys, so ('ab','c') and ('a','bc') differ
_SEP = "\x1f"


def hash_bucket(key: Column, n_buckets: int = 10_000,
                seed: str = "") -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from md5(key‖seed).

    NULL key → NULL bucket (callers decide the policy; split_assign
    sends NULLs to the LAST split so nothing is silently dropped)."""
    # NOT concat_ws (it silently skips NULLs — a NULL key would hash
    # like an empty one instead of propagating)
    h = F.md5(F.concat(key.cast("string"), F.lit(_SEP + seed)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % n_buckets).cast("int")


def split_assign(
    df: DataFrame,
    key: str | Column,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05)),
    n_buckets: int = 10_000,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    Weights are normalized and mapped to integer bucket thresholds
    (floor of the cumulative weight), so the split boundaries are exact
    integers — both engines compare with the same ``<``.  Keyed on a
    stable id (e.g. conv_id) the assignment is content-addressed:
    adding rows never moves existing ones across splits."""
    total = sum(w for _, w in splits)
    bucket = hash_bucket(F.col(key) if isinstance(key, str) else key,
                         n_buckets, seed)
    cum, expr = 0.0, None
    for name, w in splits[:-1]:
        cum += w / total
        cond = bucket < int(cum * n_buckets)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(splits[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key: str | Column,
    fractions: dict[str, float],
    strata_col: str,
    n_buckets: int = 10_000,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its hash
    bucket falls below ``floor(fraction * n_buckets)`` for its stratum.

    Unlike ``df.sample``/``sampleBy`` (seeded per-partition RNG — the
    kept set changes with partitioning), this is content-addressed and
    therefore stable across cluster sizes and reruns.  Strata missing
    from ``fractions`` (and NULL strata) are dropped — an explicit
    allowlist, matching ``sampleBy`` semantics."""
    bucket = hash_bucket(F.col(key) if isinstance(key, str) else key,
                         n_buckets, seed)
    s = F.col(strata_col)
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        keep = keep | ((s == stratum) & (bucket < int(frac * n_buckets)))
    return df.filter(keep)


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    key: str | Column,
    temperature: float = 1.0,
    n_buckets: int = 10_000,
    seed: str = "",
    rate_col: str = "mix_rate",
) -> DataFrame:
    """Temperature-flattened domain mixing by deterministic downsample.

    The standard multilingual/domain recipe (mT5 §3.1, XLM-R §3):
    target share q_d ∝ p_d^(1/T) where p_d is stratum d's empirical
    share.  Realized as downsampling ONLY — keep rate
    r_d = p_d^(1/T-1) / max_e p_e^(1/T-1), so the largest-rate stratum
    keeps everything and the resampled corpus follows q exactly in
    expectation (r_d·c_d ∝ p_d^(1/T)).  T=1 keeps every row; T→∞
    approaches uniform shares.  Rows are kept by the same
    content-addressed md5 bucket as split_assign — deterministic,
    partitioning-invariant, and stable under corpus growth within a
    stratum-count snapshot.  NULL strata are dropped (explicit
    allowlist, like stratified_sample).

    Scale: the stratum-count aggregate is map-side-combined into a
    tiny table (|domains| rows); rates derive from it with two
    broadcast cross-joins and join back to the corpus as a BROADCAST
    hash join — the corpus itself never shuffles.  Output carries
    ``rate_col`` for observability.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    # the exponent is computed ONCE driver-side so engines replaying
    # the spec (DuckDB oracle) share the exact double
    expo = 1.0 / temperature - 1.0
    strata = F.col(strata_col)
    counts = (df.filter(strata.isNotNull())
                .groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n")))
    tot = counts.agg(F.sum("_n").alias("_tot"))
    w = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_w", F.pow(F.col("_n") / F.col("_tot"), F.lit(expo)))
    mx = w.agg(F.max("_w").alias("_mx"))
    # floor() quantizes the keep rate to 1/n_buckets steps; a stratum
    # whose rate falls BELOW 1/n_buckets would floor to threshold 0 and
    # silently vanish — the opposite of "downsample toward q".  That is
    # a resolution failure, not a sampling decision: fail loudly and
    # tell the caller to raise n_buckets (md5 buckets support up to
    # ~4e9).  The guard evaluates on the |domains|-row rate table only.
    raw_thr = F.floor(F.col("_w") / F.col("_mx") * n_buckets)
    thr = F.when(
        (F.col("_w") > 0) & (raw_thr < 1),
        F.raise_error(F.concat(
            F.lit("mixture_resample: stratum "), F.col(strata_col),
            F.lit(f" keep rate < 1/{n_buckets}; raise n_buckets")))
        .cast("bigint"),
    ).otherwise(raw_thr)
    rates = (w.crossJoin(F.broadcast(mx))
             .select(strata_col,
                     (F.col("_w") / F.col("_mx")).alias(rate_col),
                     thr.cast("int").alias("_thr")))
    bucket = hash_bucket(F.col(key) if isinstance(key, str) else key,
                         n_buckets, seed)
    return (df.join(F.broadcast(rates), strata_col)
            .filter(bucket < F.col("_thr"))
            .drop("_thr"))


def _order_cols(idx_col: str, order_tie: Sequence) -> list[Column]:
    """Ordering columns for the conversation window.  ``order_tie``
    entries may be names OR Column expressions — the production
    tiebreak for dirty data is ``F.xxhash64('text')``, which keeps the
    total order deterministic while the shuffle carries an 8-byte hash
    instead of the document text (the lexicographic default exists for
    oracle replay, where DuckDB must order by the same visible value)."""
    return [F.col(idx_col),
            *(F.col(c) if isinstance(c, str) else c for c in order_tie)]


def _order(idx_col: str, order_tie: Sequence) -> list[Column]:
    return [c.asc_nulls_first() for c in _order_cols(idx_col, order_tie)]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard retrieval/embedding-pipeline primitive (chunk → embed →
    ANN index; the chunk, not the document, is the similarity unit).

    Returns ``(id_col, chunk_idx, n_tok, chunk_text)``: chunk ``i``
    covers tokens ``[i·stride, i·stride + chunk_tokens)`` of the
    engine-wide ``words()`` token stream, ``stride = chunk_tokens −
    overlap``.  The last chunk may be short; a chunk is emitted only if
    it STARTS inside the document, so every token is covered and no
    empty trailing chunk appears.  Token-less documents (NULL/empty
    text) emit no chunks — no evidence, no unit to embed.  Chunk text
    is the tokens rejoined with single spaces: chunking is defined over
    the token stream, so original inter-token whitespace is not
    preserved (the same normalization every tokenizer-based chunker
    applies).

    Scale shape: one projection — tokenize, ``sequence()`` over the
    chunk count, ``explode``, ``slice`` + ``array_join`` — all JVM
    expressions with no lambda HOF, no Python, and NO shuffle; it
    pipelines into the parquet scan and fans out ~n_tok/stride rows per
    document.  Deterministic and partitioning-invariant by
    construction (pure per-row math)."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = T.words(F.col(text_col))
    n_tok = F.size("_toks")
    # chunks whose start i*stride < n_tok  →  ceil(n_tok / stride)
    n_chunks = F.ceil(n_tok / F.lit(float(stride))).cast("int")
    base = (df.select(F.col(id_col), toks.alias("_toks"))
            .filter(F.size("_toks") > 0)
            .select(id_col, "_toks",
                    F.explode(F.sequence(F.lit(0), n_chunks - 1))
                    .alias("chunk_idx")))
    piece = F.slice(F.col("_toks"),
                    F.col("chunk_idx") * stride + 1, chunk_tokens)
    return base.select(
        id_col, "chunk_idx", F.size(piece).alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"))


def tail_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    k: int = 8,
    order_tie: Sequence = (),
) -> DataFrame:
    """Keep the LAST ``k`` turns of each conversation (context-window
    truncation).  One window pass on the conv_id exchange; ordering
    must be total (pass ``order_tie`` — names or Columns, e.g.
    ``F.xxhash64('text')`` to keep the shuffle text-free) for dirty
    data with duplicate turn_idx.  Adds ``rn_desc`` (1 = final turn)
    so callers can re-anchor positions after the cut."""
    # exact mirror of the ascending total order: same column priority,
    # DESC NULLS LAST, so rn_desc ranks are the reverse of rn ranks
    w = W.partitionBy(conv_col).orderBy(
        *[c.desc_nulls_last() for c in _order_cols(idx_col, order_tie)])
    return (df.withColumn("rn_desc", F.row_number().over(w))
            .filter(F.col("rn_desc") <= k))


def pack_sequences(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    budget: int = 2048,
    order_tie: Sequence = (),
) -> DataFrame:
    """Greedy token-budget packing: walk each conversation's turns in
    total order, accumulate whitespace-token counts
    (functions/text.token_count — NULL/empty text counts 0), and start
    a new pack when adding the turn would exceed ``budget`` and the
    current pack is non-empty.  A single turn longer than the budget
    gets a pack of its own (never split, never dropped).

    Returns (conv_col, rn, idx_col, n_tok, pack_id): ``rn`` is the
    1-based position in the total order (the packing key for dirty
    data where turn_idx repeats), ``pack_id`` is 0-based per
    conversation.

    The scan is non-associative (each decision depends on the running
    remainder), so it cannot be a window cumsum; it runs in Python —
    but NOT as per-group ``applyInPandas``: conversations are short, so
    one pandas frame per group is all fixed overhead (measured 7k
    rows/s on 20-turn conversations).  Instead the rn window's own
    physical layout is reused — its exchange hashes on ``conv_col`` and
    its sort is exactly ``(conv_col, rn)``, so rows reach the workers
    conversation-contiguous and in pack order — and ONE ``mapInPandas``
    scan walks each partition, carrying (conv, acc, pack) state across
    Arrow batch boundaries.  Same single exchange, ~50× the per-row
    throughput; the Arrow batches carry three ints per turn, no text
    (rn and token counts are computed JVM-side).

    That layout reuse is an implementation-detail contract with
    Catalyst (plan-pinned, but not an API guarantee), so the scan
    carries a runtime guard: each conversation's ``rn`` values must
    arrive as the exact sequence 1,2,3,… — any re-plan that reorders,
    splits, or interleaves conversations breaks that invariant and
    raises ``RuntimeError`` instead of silently mis-packing (the guard
    is two int compares per turn; see ``_make_pack_walker``)."""
    w = W.partitionBy(conv_col).orderBy(*_order(idx_col, order_tie))
    slim = df.select(
        conv_col,
        F.row_number().over(w).alias("rn"),
        F.col(idx_col),
        T.token_count(F.col(text_col)).alias("n_tok"),
    )

    # StructType.add mutates in place — build a fresh schema so slim's
    # cached schema object is not corrupted
    out_schema = StructType(
        list(slim.schema.fields) + [StructField("pack_id", IntegerType())])

    return slim.mapInPandas(_make_pack_walker(conv_col, budget), out_schema)


def _make_pack_walker(conv_col: str, budget: int):
    """The per-partition greedy packing scan (module-level factory so
    tests can drive it with forged out-of-order frames)."""

    def pack_partition(batches):
        cur_conv = object()  # sentinel unequal to any key (incl. None)
        acc = pack = 0
        cur_rn = 0
        for pdf in batches:
            convs = pdf[conv_col].tolist()
            toks = pdf["n_tok"].tolist()
            rns = pdf["rn"].tolist()
            out = np.empty(len(toks), dtype=np.int32)
            for i, (conv, tok, rn) in enumerate(zip(convs, toks, rns)):
                if conv != cur_conv:
                    cur_conv, acc, pack = conv, 0, 0
                    cur_rn = 0
                # ORDER GUARD: rn is row_number over exactly this
                # conversation's rows, so a correct layout delivers the
                # strict sequence 1,2,3,… per conversation within one
                # partition.  A re-planned upstream (extra exchange,
                # dropped sort, conversation split across partitions)
                # breaks the sequence — fail loudly, never mis-pack.
                if rn != cur_rn + 1:
                    raise RuntimeError(
                        f"pack_sequences: rows for {conv_col}={conv!r} "
                        f"arrived out of order (rn={rn} after "
                        f"rn={cur_rn}) — the upstream window's physical "
                        f"layout no longer reaches mapInPandas intact; "
                        f"packing would be silently wrong")
                cur_rn = rn
                if acc > 0 and acc + tok > budget:
                    pack += 1
                    acc = tok
                else:
                    acc += tok
                out[i] = pack
            yield pdf.assign(pack_id=out)

    return pack_partition
