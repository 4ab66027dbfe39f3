"""Near-dedup scale probe with a collision-free corpus generator.

Round-4's one-off probe accidentally generated an exact-dup-heavy corpus
(two id ranges collided → 1.96M true pairs), so its 350 s wall measured
an output-bound pathological case.  This round's generator is provably
collision-free: every base doc's word sequence is keyed by xxhash64 of
its OWN doc_id over a 50k vocabulary (distinct ids → distinct
sequences with overwhelming probability, and zero exact dups), and the
ONLY near-dups are the planted ones — doc N+i repeats doc i's sequence
with ~1/20 of words perturbed (3-shingle Jaccard ≈ 0.74, comfortably
over the 0.6 threshold but far from 1.0).

Everything is generated JVM-side (spark.range + hash Column algebra):
no driver-side corpus, no Python in the generator, so the probe
measures ngram_jaccard_pairs itself.

Usage: python scripts/dedup_scale_probe.py [n_docs] [n_planted]
Defaults: 200_000 base docs, 10_000 planted near-dups, PRODUCTION caps
(bucket_cap=200, num_perm=32, bands=8, threshold=0.6).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def corpus(spark, n_docs: int, n_planted: int):
    """(doc_id, text): n_docs distinct docs + n_planted near-dups of
    docs [0, n_planted) with ids offset by n_docs."""
    vocab = 50_000

    def words_expr(key_col, perturb):
        # per-doc length 30..129 words; word j = 'w<h>' with
        # h = xxhash64(key, j) mod vocab.  The planted variant swaps
        # ~1/20 positions to a disjoint vocabulary range.
        n_words = (F.pmod(F.xxhash64(key_col, F.lit(-1)), F.lit(100)) + 30)
        def word(j):
            base = F.concat(F.lit("w"), F.pmod(F.xxhash64(key_col, j), F.lit(vocab)))
            if not perturb:
                return base
            alt = F.concat(F.lit("p"), F.pmod(F.xxhash64(key_col, j, F.lit(7)),
                                              F.lit(vocab)))
            return F.when(F.pmod(F.xxhash64(key_col, j, F.lit(13)),
                                 F.lit(20)) == 0, alt).otherwise(base)
        return F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), n_words - 1), word))

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), words_expr(F.col("id"), False).alias("text"))
    planted = spark.range(n_planted).select(
        (F.col("id") + n_docs).alias("doc_id"),
        words_expr(F.col("id"), True).alias("text"))
    return base.unionByName(planted)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dedup_scale_probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cerberus_spark.functions import dedup

    docs = corpus(spark, n_docs, n_planted).repartition(int(cpus)).persist()
    total = docs.count()  # materialize so the probe excludes generation

    t0 = time.time()
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.6,
        num_perm=32, bands=8, bucket_cap=200,
    ).persist()
    n_pairs = pairs.count()
    wall = time.time() - t0

    planted_found = pairs.filter(
        (F.col("id_b") == F.col("id_a") + n_docs) & (F.col("id_a") < n_planted)
    ).count()
    extras = n_pairs - planted_found

    # Ground-truth denominator: the perturbation is binomial, so a SHORT
    # doc with an unlucky draw can fall genuinely below the threshold —
    # that is not an LSH miss.  Recall counts only planted pairs whose
    # TRUE shingle Jaccard clears the threshold (computed exactly on the
    # n_planted pairs — trivial).
    a = docs.filter(F.col("doc_id") < n_planted).select(
        F.col("doc_id").alias("pid"), dedup.shingles(F.col("text")).alias("sa"))
    b = docs.filter(F.col("doc_id") >= n_docs).select(
        (F.col("doc_id") - n_docs).alias("pid"),
        dedup.shingles(F.col("text")).alias("sb"))
    truth = a.join(b, "pid").select(
        "pid", dedup.jaccard(F.col("sa"), F.col("sb")).alias("j")
    ).filter(F.col("j") >= 0.6).persist()
    found_ids = pairs.filter(
        (F.col("id_b") == F.col("id_a") + n_docs) & (F.col("id_a") < n_planted)
    ).select(F.col("id_a").alias("pid"), F.lit(1).alias("hit"))
    # recall stratified by TRUE Jaccard: banded MinHash has an inherent
    # S-curve — P(candidate) = 1-(1-j^r)^bands — so near-threshold pairs
    # are probabilistically missed by DESIGN (r=4, b=8: ~67% at j=0.60,
    # ~98.5% at j=0.80).  Per-band recall vs that formula separates
    # "banding behaving as the math says" from an implementation bug;
    # aggregate recall alone cannot.
    strat = (truth.join(found_ids, "pid", "left")
             .groupBy(F.floor(F.col("j") * 10).alias("band10"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("found"))
             .orderBy("band10").collect())
    eligible = sum(r["n"] for r in strat)
    by_band = {
        f"j[{r['band10'] / 10:.1f},{(r['band10'] + 1) / 10:.1f})": {
            "n": r["n"], "found": int(r["found"]),
            "recall": round(int(r["found"]) / r["n"], 3),
            "expected": round(1 - (1 - ((r["band10"] + 0.5) / 10) ** 4) ** 8, 3),
        }
        for r in strat
    }
    print({
        "docs": total, "planted": n_planted, "wall_sec": round(wall, 1),
        "pairs_found": n_pairs, "planted_found": planted_found,
        "planted_eligible": eligible,
        "recall": round(planted_found / max(eligible, 1), 4),
        "recall_by_true_jaccard": by_band,
        "non_planted_pairs": extras,
        "docs_per_sec": round(total / wall, 1),
    })


if __name__ == "__main__":
    main()
