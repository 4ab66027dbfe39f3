"""Exact-substring dedup: document pairs sharing a VERBATIM run of at
least ``min_len`` tokens (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better" — the substring tier above MinHash:
set-overlap similarity is blind to a long copied passage embedded in
two otherwise-different documents, yet that passage is exactly what a
language model memorizes).

The reference engine (pyeve/cerberus) is document-local and has no
cross-document notion; this extends the engine's dedup family
(functions/dedup.py) with the substring-granular tier.

Semantics (shared verbatim with the DuckDB oracle)
--------------------------------------------------
``(id_a, id_b, n_shared)`` with ``id_a < id_b`` for every pair of
documents whose tokenizations (functions/text.words spec: lowercase,
ASCII edge-strip, ASCII ``\\s+`` split) share ≥1 identical contiguous
run of ``min_len`` tokens; ``n_shared`` counts the DISTINCT shared
``min_len``-gram strings.  Sharing a run of length R ≥ min_len is
EXACTLY equivalent to sharing an L-token-gram (every length-L window
of the run is one), so the oracle is a plain L-gram self-join.

Scale shape (why not just self-join all L-grams)
------------------------------------------------
A direct L-gram self-join shuffles ~n_tokens rows per document.
Winnowing (Schleimer et al. 2003, the MOSS fingerprinter) cuts the
candidate side by the window factor with a RECALL GUARANTEE: over the
k-gram hash sequence, every sliding window of w = min_len - k + 1
consecutive k-grams selects its MINIMUM hash as a fingerprint.  Two
documents sharing an L-token run share an identical window of w
consecutive k-grams, whose minimum is the same value — both documents
provably emit it, so candidate recall is 1 (modulo 64-bit hash
collisions, the same documented birthday term as the MinHash path).
Expected fingerprint density is 2/(w+1) — at min_len=20, k=5 that is
~8× fewer rows through the shuffle than the naive L-gram join.

* ONE Arrow pass per document emits (winnow fingerprints, distinct
  L-gram hashes) — 8-byte longs, never gram strings.
* Candidates: explode fingerprints → bucket join with the exact cap +
  head-pairing convention of minhash_lsh_candidates (degenerate
  boilerplate fingerprints stay bounded, nothing silently dropped).
* Verify: candidate ids only (left-semi) join their L-gram hash sets;
  a pair survives iff the intersection is non-empty — candidate-
  proportional work, exact w.r.t. the hash relation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F
from pyspark.sql import types as T

from .decontam import _gram_hash, _words

__all__ = ["winnow_hashes_udf", "substring_dup_pairs",
           "dedup_substrings"]


def _gram_hash_seq(ws: list[str], n: int) -> np.ndarray:
    """POSITIONAL (non-distinct) n-gram hashes — one per window, in
    document order; empty when the text has fewer than n words."""
    if len(ws) < n:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (_gram_hash(" ".join(ws[i:i + n])) for i in range(len(ws) - n + 1)),
        dtype=np.int64, count=len(ws) - n + 1)


def winnow_hashes_udf(min_len: int, k: int) -> Column:
    """Factory: Arrow-batched ``struct<fps: array<long>, lgs:
    array<long>>`` — the distinct winnow fingerprints (window
    w = min_len - k + 1 minima over the k-gram hash sequence) and the
    distinct ``min_len``-gram hashes.  Both empty for texts shorter
    than ``min_len`` tokens (they cannot contain an L-run)."""
    if not (1 <= k <= min_len):
        raise ValueError(f"need 1 <= k <= min_len, got k={k}, "
                         f"min_len={min_len}")
    w = min_len - k + 1
    out_t = T.StructType([
        T.StructField("fps", T.ArrayType(T.LongType())),
        T.StructField("lgs", T.ArrayType(T.LongType())),
    ])

    @F.pandas_udf(out_t)
    def _wf(s: pd.Series) -> pd.DataFrame:
        fps_out, lgs_out = [], []
        for t in s:
            ws = _words(t.lower()) if t is not None else []
            if len(ws) < min_len:
                fps_out.append([])
                lgs_out.append([])
                continue
            kg = _gram_hash_seq(ws, k)
            # sliding-window minima: value-level selection is enough
            # for the recall guarantee (identical windows share their
            # minimum VALUE); unique() collapses repeats
            mins = np.lib.stride_tricks.sliding_window_view(kg, w).min(1)
            fps_out.append(np.unique(mins).tolist())
            lgs_out.append(np.unique(_gram_hash_seq(ws, min_len)).tolist())
        return pd.DataFrame({"fps": fps_out, "lgs": lgs_out})

    return _wf


def substring_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                        min_len: int = 20, k: int = 5,
                        bucket_cap: int = 200) -> DataFrame:
    """``(id_a, id_b, n_shared)`` — module-header semantics.  One
    Arrow pass, fingerprint-bucket candidates (capped, head-paired),
    L-gram-hash intersection verify on candidates only."""
    from pyspark import StorageLevel

    hashed = (df.select(F.col(id_col).alias("_id"),
                        winnow_hashes_udf(min_len, k)(F.col(text_col))
                        .alias("h"))
              .select("_id", "h.fps", "h.lgs")
              .persist(StorageLevel.MEMORY_AND_DISK))

    fp = hashed.select("_id", F.explode("fps").alias("fp"))
    ranked = fp.withColumn(
        "_rn", F.row_number().over(W.partitionBy("fp").orderBy("_id")))
    buckets = (ranked.filter(F.col("_rn") <= bucket_cap)
               .groupBy("fp")
               .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
               .filter(F.size("ids") > 1))
    pairs = buckets.select(
        F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(x as id_a, y as id_b))))")).alias("p")
    ).select("p.id_a", "p.id_b")
    heads = ranked.filter(F.col("_rn") == 1).select(
        "fp", F.col("_id").alias("id_a"))
    overflow = (ranked.filter(F.col("_rn") > bucket_cap)
                .select("fp", F.col("_id").alias("id_b"))
                .join(heads, "fp")
                .filter(F.col("id_a") != F.col("id_b"))
                .select(F.least("id_a", "id_b").alias("id_a"),
                        F.greatest("id_a", "id_b").alias("id_b")))
    cands = pairs.unionByName(overflow).distinct()

    # verify: L-gram hash intersection, candidate ids only (left-semi
    # keeps the explode candidate-proportional); grams are DISTINCT
    # per doc by construction, so count(*) per pair = |intersection|
    cand_ids = (cands.select(F.col("id_a").alias("_id"))
                .unionByName(cands.select(F.col("id_b").alias("_id")))
                .distinct())
    lg = (hashed.join(F.broadcast(cand_ids), "_id", "left_semi")
          .select("_id", F.explode("lgs").alias("g")))
    a = lg.select(F.col("_id").alias("id_a"), "g")
    b = lg.select(F.col("_id").alias("id_b"), "g")
    return (cands.join(a, "id_a").join(b, ["id_b", "g"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared")))


def dedup_substrings(df: DataFrame, id_col: str, text_col: str,
                     min_len: int = 20, k: int = 5,
                     **kw) -> DataFrame:
    """Keep one document per substring-sharing group (connected
    components over verified pairs, min id survives) — the
    whole-document drop policy; span-level excision of the shared run
    is the decontam module's excise shape, not this one's."""
    from .dedup import connected_components

    pairs = substring_dup_pairs(df, id_col, text_col, min_len=min_len,
                                k=k, **kw)
    comps = connected_components(pairs)
    drop = (comps.filter(F.col("node") != F.col("comp"))
            .select(F.col("node").alias(id_col)))
    return df.join(drop, id_col, "left_anti")
