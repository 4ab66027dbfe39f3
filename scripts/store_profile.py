"""Phase-by-phase wall profile of write_band_store +
cross_dup_pairs_stored at bench scale (guide §1: measure first).
Read-only diagnostic — not part of the bench contract."""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("store_profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark import StorageLevel

    from cerberus_spark.functions import dedup as DD
    from cerberus_spark.functions.dedup import (
        _band_structs, _check_store_meta, _read_epochs, _sh64_df,
        _sig_from_sh64, words,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 10 < 3)
    new = docs.filter(F.col("doc_id") % 10 >= 3)

    def t(label, fn):
        t0 = time.time()
        out = fn()
        print(f"  {label:45s} {time.time()-t0:6.2f}s", flush=True)
        return out

    for rep in range(2):
        print(f"rep {rep}:", flush=True)
        store = tempfile.mkdtemp(prefix="prof_band_store_")
        k, num_perm, bands = 3, 32, 8

        # ---- build phases --------------------------------------------
        t("meta", lambda: _check_store_meta(spark, store, k, num_perm,
                                            bands, create=True))
        sh64 = _sh64_df(ref.filter(F.size(words(F.col("text"))) > 0),
                        "doc_id", "text", k).persist(StorageLevel.MEMORY_AND_DISK)
        t("hashes write (shingle UDF + write)",
          lambda: sh64.write.mode("overwrite").parquet(
              f"{store}/hashes/epoch=0"))
        sig = _sig_from_sh64(sh64, num_perm)
        band_rows = (sig.select("_id",
                                F.explode(_band_structs(num_perm, bands))
                                .alias("bb"))
                     .select("_id", "bb.band", "bb.bhash"))
        bb = 256
        n_tasks = max(1, min(bb, spark.sparkContext.defaultParallelism))
        t("bands write (sig agg + partitioned write)",
          lambda: (band_rows
                   .withColumn("pb", F.pmod(F.col("bhash"), F.lit(bb))
                               .cast("int"))
                   .repartition(n_tasks, "pb")
                   .sortWithinPartitions("pb", "bhash")
                   .write.mode("overwrite").partitionBy("pb")
                   .parquet(f"{store}/bands/epoch=0")))
        sh64.unpersist()
        spark.catalog.refreshByPath(store)

        # ---- probe phases --------------------------------------------
        t("probe: meta read", lambda: _check_store_meta(
            spark, store, k, num_perm, bands, create=False))
        ref_hashes = t("probe: hashes listing", lambda: _read_epochs(
            spark, f"{store}/hashes", None))
        nf = new.filter(F.size(words(F.col("text"))) > 0)
        sh64_new = _sh64_df(nf, "doc_id", "text", k) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        bands_new = (_sig_from_sh64(sh64_new, num_perm)
                     .select("_id",
                             F.explode(_band_structs(num_perm, bands))
                             .alias("bb"))
                     .select(F.col("_id").alias("id_new"), "bb.band",
                             "bb.bhash")
                     ).persist(StorageLevel.MEMORY_AND_DISK)
        touched_pb = t("probe: touched_pb collect (new banding)",
                       lambda: {r[0] for r in bands_new.select(
                           F.pmod(F.col("bhash"), F.lit(bb)).cast("int")
                           .alias("pb")).distinct().collect()})
        print(f"    touched {len(touched_pb)}/{bb} buckets", flush=True)
        ref_bands = t("probe: bands listing", lambda: _read_epochs(
            spark, f"{store}/bands", None))
        from pyspark.sql import Window as W
        ref_bands = ref_bands.drop("pb")
        touched = bands_new.select("band", "bhash").distinct()
        ref_touched = ref_bands.join(F.broadcast(touched),
                                     ["band", "bhash"], "left_semi") \
            .select("band", "bhash", F.col("_id").alias("id_ref"))
        bucket_cap = 200
        rn_new = bands_new.withColumn(
            "_rn", F.row_number().over(
                W.partitionBy("band", "bhash").orderBy("id_new")))
        rn_ref = ref_touched.withColumn(
            "_rn", F.row_number().over(
                W.partitionBy("band", "bhash").orderBy("id_ref")))
        newb = rn_new.filter(F.col("_rn") <= bucket_cap) \
            .select("band", "bhash", "id_new")
        refb = rn_ref.filter(F.col("_rn") <= bucket_cap) \
            .select("band", "bhash", "id_ref")
        pairs = newb.join(refb, ["band", "bhash"]).select("id_new", "id_ref")
        ref_heads = rn_ref.filter(F.col("_rn") == 1) \
            .select("band", "bhash", "id_ref")
        overflow = (rn_new.filter(F.col("_rn") > bucket_cap)
                    .select("band", "bhash", "id_new")
                    .join(ref_heads, ["band", "bhash"])
                    .select("id_new", "id_ref"))
        cands = pairs.unionByName(overflow).distinct() \
            .persist(StorageLevel.MEMORY_AND_DISK)
        t("probe: candidate gen (windows + joins + distinct)",
          lambda: cands.count())
        cand_ids = cands.select("id_ref").distinct()
        ref_cand = (ref_hashes
                    .join(F.broadcast(cand_ids),
                          ref_hashes["_id"] == cand_ids["id_ref"],
                          "left_semi")
                    .select(F.col("_id").alias("id_ref"), "_sh64")
                    .persist(StorageLevel.MEMORY_AND_DISK))
        t("probe: ref_cand materialize (store hashes semi)",
          lambda: ref_cand.count())
        cand_new_ids = cands.select("id_new").distinct()
        a = (sh64_new
             .join(F.broadcast(cand_new_ids),
                   sh64_new["_id"] == cand_new_ids["id_new"], "left_semi")
             .select(F.col("_id").alias("id_new"), "_sh64"))
        inter = (cands.join(a, "id_new").join(ref_cand, ["id_ref", "_sh64"])
                 .groupBy("id_new", "id_ref")
                 .agg(F.count(F.lit(1)).alias("_inter")))
        na = a.groupBy("id_new").agg(F.count(F.lit(1)).alias("_na"))
        nb = ref_cand.groupBy("id_ref").agg(F.count(F.lit(1)).alias("_nb"))
        out = (inter.join(na, "id_new").join(nb, "id_ref")
               .select("id_new", "id_ref",
                       (F.col("_inter")
                        / (F.col("_na") + F.col("_nb") - F.col("_inter")))
                       .alias("jaccard"))
               .filter(F.col("jaccard") >= 0.6))
        t("probe: verify + score (noop)",
          lambda: out.write.format("noop").mode("overwrite").save())

        # end-to-end for reference
        t("probe: FULL cross_dup_pairs_stored (noop)",
          lambda: DD.cross_dup_pairs_stored(
              new, store, "doc_id", "text", threshold=0.6)
          .write.format("noop").mode("overwrite").save())
        for df in (sh64_new, bands_new, cands, ref_cand):
            df.unpersist()
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
