"""Store-scan pruning probe for the r7 bhash-bucketed band store
(functions/dedup.py: write_band_store(band_buckets=...) /
cross_dup_pairs_stored): the r6 verdict's last corpus-proportional
ingest term was the probe's full columnar scan of the bands table.
With the bands sub-partitioned by ``pb = pmod(bhash, B)`` a probe
statically prunes its store READ to the batch's touched pb dirs.

This probe builds ONE reference corpus into two stores — flat
(band_buckets=0, the r6 layout) and bucketed — then probes both with
batches of several sizes and reports:

* probe wall (best-of-2) on each layout,
* touched pb dirs / total dirs and touched BYTES / total bytes — the
  store I/O the pruned scan is allowed to read (partition pruning is
  plan-level: the unit test pins the pb IN (...) partition filter;
  here we report the byte mass behind it),
* pair identity between the layouts (the correctness half).

Expected shape: touched fraction ≈ 1 − (1 − 1/B)^n for n distinct
batch band-keys — a trickle batch reads a few percent of the store,
a bulk batch degrades to ~full scan (and matches the flat wall).

Invocation: ``python scripts/bucket_prune_probe.py`` (env knobs:
BPROBE_REF rows, BPROBE_CPUS, BPROBE_BUCKETS).
Results land in BENCH/bucket_prune_probe.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_ROWS = int(os.environ.get("BPROBE_REF", 300_000))
CPUS = int(os.environ.get("BPROBE_CPUS", 16))
BUCKETS = int(os.environ.get("BPROBE_BUCKETS", 256))
BATCHES = [int(x) for x in os.environ.get(
    "BPROBE_BATCHES", "10,100,1000,10000").split(",")]


def synth(spark, n, id_base):
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        (F.col("id") + id_base).alias("doc_id"), F.col("id").alias("_i"))
    h = F.xxhash64((F.col("_i") + id_base).cast("string"))
    n_words = (F.lit(15) + F.pmod(h, F.lit(36))).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.substring(
            F.md5(F.pmod(h + j * F.lit(2654435761),
                         F.lit(50_000)).cast("string")), 1, 8))
    return base.select("doc_id", F.concat_ws(" ", words).alias("text"))


def dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    from pyspark.sql import SparkSession, functions as F

    from cerberus_spark.functions import dedup as D
    from cerberus_spark.functions.text import words as words_col

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("bucket_prune_probe")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.python.sql.dataFrameDebugging.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bucket_prune_probe_")
    kw = dict(threshold=0.8, num_perm=32, bands=8)

    ref = synth(spark, REF_ROWS, 0)
    ref.write.mode("overwrite").parquet(f"{work}/ref")
    ref = spark.read.parquet(f"{work}/ref")

    stores = {}
    for name, bb in (("flat", 0), ("bucketed", BUCKETS)):
        t0 = time.time()
        D.write_band_store(ref, f"{work}/{name}", 0, "doc_id", "text",
                           num_perm=32, bands=8, band_buckets=bb)
        stores[name] = round(time.time() - t0, 2)
        print(f"build {name}: {stores[name]}s", flush=True)

    total_bytes = dir_bytes(f"{work}/bucketed/bands")
    total_dirs = len([d for d in os.listdir(f"{work}/bucketed/bands/epoch=0")
                      if d.startswith("pb=")])
    result = {"ref_rows": REF_ROWS, "cpus": CPUS, "buckets": BUCKETS,
              "build_walls": stores,
              "bands_total_bytes": total_bytes,
              "bands_total_dirs": total_dirs, "probes": []}

    for nb in BATCHES:
        batch = synth(spark, nb, 900_000_000)
        # plant a couple of true dups so pairs are non-empty
        planted = ref.orderBy("doc_id").limit(2) \
            .select((F.col("doc_id") + 950_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" tail")).alias("text"))
        batch = batch.unionByName(planted)
        batch.write.mode("overwrite").parquet(f"{work}/batch")
        batch = spark.read.parquet(f"{work}/batch")

        walls = {}
        pairs = {}
        for name in ("flat", "bucketed"):
            best = None
            for _ in range(2):
                t0 = time.time()
                got = sorted(
                    (r.id_new, r.id_ref, round(r.jaccard, 9))
                    for r in D.cross_dup_pairs_stored(
                        batch, f"{work}/{name}", "doc_id", "text",
                        **kw).collect())
                e = time.time() - t0
                best = e if best is None or e < best else best
            walls[name] = round(best, 2)
            pairs[name] = got

        # touched pb set exactly as the probe computes it
        from cerberus_spark.functions.dedup import (_band_structs,
                                                    _sh64_df,
                                                    _sig_from_sh64)
        nf = batch.filter(F.size(words_col(F.col("text"))) > 0)
        touched = (
            _sig_from_sh64(_sh64_df(nf, "doc_id", "text", 3), 32)
            .select(F.explode(_band_structs(32, 8)).alias("bb"))
            .select(F.pmod(F.col("bb.bhash"), F.lit(BUCKETS))
                    .cast("int").alias("pb"))
            .distinct().collect())
        touched_pb = {r["pb"] for r in touched}
        touched_bytes = sum(
            dir_bytes(f"{work}/bucketed/bands/epoch=0/pb={p}")
            for p in touched_pb
            if os.path.isdir(f"{work}/bucketed/bands/epoch=0/pb={p}"))
        row = {"batch_rows": nb,
               "wall_flat": walls["flat"],
               "wall_bucketed": walls["bucketed"],
               "touched_dirs": len(touched_pb),
               "touched_bytes": touched_bytes,
               "scan_fraction": round(touched_bytes / total_bytes, 4),
               "pairs_match": pairs["flat"] == pairs["bucketed"],
               "n_pairs": len(pairs["bucketed"])}
        result["probes"].append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(REPO, "BENCH", "bucket_prune_probe.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
