"""Per-epoch cost probe for the streaming corpus ingest's cross-batch
dedup (r5 VERDICT item 1): the r5 design re-shingled the ENTIRE kept
corpus every micro-batch (per-epoch cost grows with everything kept so
far — total ingest compute quadratic in stream length); the r6 band
store (functions/dedup.py: write_band_store / cross_dup_pairs_stored)
persists each epoch's (band, bhash, id) rows and shingle hashes at
commit, so later epochs probe columnar longs instead of re-tokenizing
text.

This probe runs N_EPOCHS equal-size batches through BOTH paths and
reports per-epoch wall:

* ``stored``  — dedup_against_store(batch, store, max_epoch=e) then
  write_band_store(survivors) — the shipped ingest shape.
* ``reshingle`` — dedup_against(batch, all prior batches read back
  from parquet) — the r5 shape, for contrast.

Expected: ``reshingle`` epoch wall grows ~linearly with the kept
corpus; ``stored`` stays flat (batch + candidates + a columnar long
scan).  Results land in BENCH/ingest_scale_probe.json.

Invocation: ``python scripts/ingest_scale_probe.py`` (env knobs:
IPROBE_BATCH rows/epoch, IPROBE_EPOCHS, IPROBE_CPUS).
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("IPROBE_BATCH", 30_000))
EPOCHS = int(os.environ.get("IPROBE_EPOCHS", 5))
CPUS = int(os.environ.get("IPROBE_CPUS", 16))
DUP_PCT = 2  # % of each batch near-duplicating epoch-0 content


def synth_batch(spark, epoch):
    """Deterministic hash-derived batch: ids are epoch-disjoint;
    DUP_PCT% of rows in epochs >= 1 reuse an epoch-0 row's word
    sequence plus a short tail (true cross-epoch near-dups)."""
    from pyspark.sql import functions as F

    base = spark.range(BATCH).select(
        (F.col("id") + epoch * 10_000_000).alias("doc_id"),
        F.col("id").alias("_i"))
    # seed id: dup rows re-derive epoch 0's words for the same _i
    is_dup = (epoch > 0) & (F.pmod(F.col("_i"), 100) < DUP_PCT)
    seed = F.when(is_dup, F.col("_i")).otherwise(
        F.col("_i") + epoch * 10_000_000)
    h = F.xxhash64(seed.cast("string"))
    n_words = (F.lit(15) + F.pmod(h, F.lit(36))).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.substring(
            F.md5(F.pmod(h + j * F.lit(2654435761),
                         F.lit(50_000)).cast("string")), 1, 8))
    text = F.when(
        is_dup, F.concat(F.concat_ws(" ", words), F.lit(" tail tail")),
    ).otherwise(F.concat_ws(" ", words))
    return base.select("doc_id", text.alias("text"))


def main():
    from pyspark.sql import SparkSession, functions as F

    from cerberus_spark.functions import dedup as D

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("ingest_scale_probe")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.python.sql.dataFrameDebugging.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_probe_")
    store = f"{work}/band_store"
    kw = dict(threshold=0.8, num_perm=32, bands=8)

    # materialize every batch once up front (the synth HOF is the slow
    # part — it must not pollute either path's timing)
    for e in range(EPOCHS):
        synth_batch(spark, e).write.mode("overwrite") \
            .parquet(f"{work}/batch/epoch={e}")

    result = {"batch_rows": BATCH, "epochs": EPOCHS, "cpus": CPUS,
              "stored": [], "reshingle": [], "dropped_stored": [],
              "dropped_reshingle": []}

    # ---- stored path (the shipped ingest shape) ----
    for e in range(EPOCHS):
        batch = spark.read.parquet(f"{work}/batch/epoch={e}")
        t0 = time.time()
        if e == 0:
            surv = batch
        else:
            surv = D.dedup_against_store(batch, store, "doc_id", "text",
                                         max_epoch=e, **kw)
        surv.write.mode("overwrite").parquet(f"{work}/kept/epoch={e}")
        kept = spark.read.parquet(f"{work}/kept/epoch={e}")
        D.write_band_store(kept, store, e, "doc_id", "text",
                           num_perm=32, bands=8)
        wall = time.time() - t0
        n_kept = kept.count()
        result["stored"].append(round(wall, 2))
        result["dropped_stored"].append(BATCH - n_kept)
        print(f"stored   epoch {e}: {wall:6.2f}s  dropped "
              f"{BATCH - n_kept}", flush=True)

    # ---- r5 re-shingle path (for contrast) ----
    shutil.rmtree(f"{work}/kept")
    for e in range(EPOCHS):
        # the ref is re-read by PARENT path each epoch; without this,
        # the probe's own persisted ref-side frames from earlier epochs
        # are sameResult-substituted for the new (larger) scan and the
        # arm silently measures a stale 1-epoch ref — flat walls, and
        # correct-looking drops only because the planted dups all
        # target epoch-0 content (caught live in r7; the SHIPPED stored
        # path is immune by explicit-path reads, this arm is the
        # contrast harness)
        spark.catalog.clearCache()
        batch = spark.read.parquet(f"{work}/batch/epoch={e}")
        t0 = time.time()
        if e == 0:
            surv = batch
        else:
            ref = spark.read.parquet(f"{work}/kept")
            surv = D.dedup_against(batch, ref, "doc_id", "text", **kw)
        surv.write.mode("overwrite").parquet(f"{work}/kept/epoch={e}")
        wall = time.time() - t0
        n_kept = spark.read.parquet(f"{work}/kept/epoch={e}").count()
        result["reshingle"].append(round(wall, 2))
        result["dropped_reshingle"].append(BATCH - n_kept)
        print(f"reshingle epoch {e}: {wall:6.2f}s  dropped "
              f"{BATCH - n_kept}", flush=True)

    # identical drop decisions is part of the claim
    result["drops_match"] = (result["dropped_stored"]
                             == result["dropped_reshingle"])
    out = os.path.join(REPO, "BENCH", "ingest_scale_probe.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
