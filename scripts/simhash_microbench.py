"""SimHash micro-benchmark (VERDICT r2 item 5 'Done' criterion).

Compares three implementations over a 100k-doc synthetic corpus
(~40 words/doc) at local[8]:

  old   — the round-2 per-word blake2b pandas UDF (row loop over words,
          one hashlib call per token) — reproduced here for comparison
  udf   — the round-3 vectorized pandas UDF (md5 per UNIQUE word per
          Arrow batch + numpy segment sums)
  col   — the round-3 pure-Column path (explode → md5 chunks → 64
          bit-tally sums, JVM codegen, map-side partial agg)

Prints one JSON line with wall seconds (best of 3) per impl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T

N_DOCS = 100_000
WORDS_PER_DOC = 40
VOCAB = 5_000


@F.pandas_udf(T.LongType())
def simhash64_old(text: pd.Series) -> pd.Series:
    """Round-2 implementation (per-word blake2b, per-row Python loop)."""
    import hashlib

    def word_hash(w):
        return np.uint64(int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"))

    out = np.zeros(len(text), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(text):
        if not t:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for w in str(t).lower().split():
            bits = (word_hash(w) >> shifts) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        sig = np.uint64(0)
        for b in range(64):
            if acc[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from cerberus_spark.functions import dedup

    rng = np.random.default_rng(42)
    vocab = [f"w{i:05d}" for i in range(VOCAB)]
    texts = [" ".join(rng.choice(vocab, WORDS_PER_DOC)) for _ in range(N_DOCS)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    src = "/tmp/simhash_bench_corpus"
    df.write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)

    def time_best(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            e = time.time() - t0
            best = e if best is None or e < best else best
        return round(best, 2)

    results = {}
    results["old_blake2b_udf"] = time_best(
        lambda: docs.select(simhash64_old(F.col("text")).alias("s"))
        .agg(F.count("s")).collect())
    results["new_vectorized_udf"] = time_best(
        lambda: docs.select(dedup.simhash64(F.col("text")).alias("s"))
        .agg(F.count("s")).collect())
    results["new_column_path"] = time_best(
        lambda: dedup.simhash_signatures(docs, "doc_id", "text")
        .agg(F.count("_sig")).collect())
    results["speedup_udf"] = round(
        results["old_blake2b_udf"] / results["new_vectorized_udf"], 2)
    results["speedup_col"] = round(
        results["old_blake2b_udf"] / results["new_column_path"], 2)
    results.update(n_docs=N_DOCS, words_per_doc=WORDS_PER_DOC)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
