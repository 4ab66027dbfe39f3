"""Scale + N→4N parallelism probe for the round-6 operators: BM25
(flat scan and inverted-index query), DSIR importance weights, and
token-window chunking.

Same protocol as textops/temporal/embedding probes: a deterministic
Spark-side synthetic corpus (no driver data, no RNG), two parallelism
levels, best-of-REPS walls plus the executor-CPU decomposition
(CPU-seconds are co-tenant-invariant; the wall/CPU gap on one box is
the shared memory-bus stall a real 4N-executor cluster does not have).

The BM25 pair is the interesting contrast: the FLAT path re-tokenizes
the corpus per query (scan-bound, scales with corpus), while the
INDEXED query reads only its terms' posting-list partitions — its wall
should be corpus-size-INsensitive, which is the whole argument for the
index at 100 TB.  ``index_build`` is reported separately (one-time,
amortized).

Invocation: ``python scripts/newops_scale_probe.py`` runs levels in
NPROBE_LEVELS (default "4,16"); with NPROBE_CPUS set it runs one level
and prints one JSON line.
"""

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("NPROBE_ROWS", 1_000_000))
REPS = int(os.environ.get("NPROBE_REPS", 2))

#: query terms = actual synth vocabulary members (md5 prefixes of the
#: type id), computed driver-side with the same hash
TERMS = [hashlib.md5(str(k).encode()).hexdigest()[:8]
         for k in (7, 1234, 49_999)]


def synth(spark, n):
    """(doc_id, text, domain) — identical recipe to
    textops_scale_probe.synth (hash-derived 50k-type vocabulary)."""
    from pyspark.sql import functions as F

    h = F.xxhash64(F.col("id"))
    n_words = (F.lit(10) + F.pmod(h, F.lit(41))).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.substring(
            F.md5(F.pmod(h + j * F.lit(2654435761),
                         F.lit(50_000)).cast("string")), 1, 8))
    dom = F.pmod(h, F.lit(100))
    domain = (F.when(dom < 60, "web").when(dom < 85, "code")
              .when(dom < 95, "books").otherwise("wiki"))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        domain.alias("domain"))


def _metrics(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.loads(r.read())
    return {
        "cpu_ns": sum(s.get("executorCpuTime", 0) for s in stages),
        "run_ms": sum(s.get("executorRunTime", 0) for s in stages),
    }


def run_level(cpus: int) -> dict:
    from pyspark.sql import SparkSession, functions as F

    from cerberus_spark.functions import dsir as DS
    from cerberus_spark.functions import ranking as RK
    from cerberus_spark.operators import pipeline as P

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"newops_probe_{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                f"-XX:ActiveProcessorCount={cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth(spark, N_ROWS).persist()
    docs.count()
    target = docs.filter(F.col("domain") == "wiki").persist()
    target.count()
    idx = tempfile.mkdtemp(prefix=f"nprobe_idx_{cpus}_")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        # two corpus scans (stats row + scoring projection), 1-row
        # broadcast, TakeOrderedAndProject — the per-query flat cost
        "bm25_flat": lambda: noop(RK.bm25_topk(
            docs, "doc_id", "text", TERMS, k=10)),
        # one tokenize+explode shuffle into term-bucketed parquet —
        # the one-time cost the index amortizes
        "index_build": lambda: RK.write_text_index(
            docs, idx, "doc_id", "text"),
        # pruned posting-list scan + tiny broadcasts + one candidate
        # exchange — should NOT scale with corpus size
        "bm25_indexed_query": lambda: noop(RK.bm25_topk_indexed(
            spark, idx, TERMS, k=10)),
        # Arrow featurize (uni+bi md5 buckets) + ≤10k-row broadcast
        # ratio + one int exchange on doc_id
        "dsir_weights": lambda: noop(DS.dsir_report(
            docs, target, "doc_id", "text")),
        # stateless JVM projection — the linear floor
        "chunk": lambda: noop(P.chunk_documents(
            docs, chunk_tokens=32, overlap=8)),
    }

    def _drop_job_caches():
        # dsir_report persists its feature frame per call; drop all
        # then re-pin the synth inputs so reps don't accumulate
        spark.catalog.clearCache()
        docs.persist().count()
        target.persist().count()

    timings = {}
    for name, job in jobs.items():
        job()  # warm-up (codegen/JIT/Arrow worker spin-up)
        _drop_job_caches()
        best, best_m = None, None
        reps, cpu_reps = [], []
        for _ in range(REPS):
            m0 = _metrics(spark)
            t0 = time.time()
            job()
            e = time.time() - t0
            m1 = _metrics(spark)
            _drop_job_caches()
            cpu_s = (m1["cpu_ns"] - m0["cpu_ns"]) / 1e9
            run_s = (m1["run_ms"] - m0["run_ms"]) / 1e3
            reps.append(round(e, 2))
            cpu_reps.append(round(cpu_s, 1))
            if best is None or e < best:
                best, best_m = e, {"cpu_s": round(cpu_s, 1),
                                   "run_s": round(run_s, 1)}
        timings[name] = {
            "best_sec": round(best, 2), "reps": reps,
            "cpu_s_reps": cpu_reps,
            "best_cpu_s": best_m["cpu_s"], "best_run_s": best_m["run_s"],
            "threads_fed": round(best_m["run_s"] / best, 1)
            if best > 0 else None,
            "rows_per_sec": round(N_ROWS / best) if best > 0 else None,
        }
    spark.stop()
    return {"cpus": cpus, "n_rows": N_ROWS, "timings": timings}


def main():
    if os.environ.get("NPROBE_CPUS"):
        print(json.dumps(run_level(int(os.environ["NPROBE_CPUS"]))))
        return
    levels = [int(c) for c in
              os.environ.get("NPROBE_LEVELS", "4,16").split(",")]
    out_path = os.path.join(REPO, "BENCH", "newops_scale_probe.json")
    result = {"n_rows": N_ROWS, "levels": {}}

    def _write():
        lv = result["levels"]
        effs = {}
        for c in sorted(int(k) for k in lv):
            hi = str(4 * c)
            if hi in lv:
                effs[f"{c}_to_{4*c}"] = {
                    op: round(lv[str(c)]["timings"][op]["best_sec"]
                              / (lv[hi]["timings"][op]["best_sec"] * 4),
                              3)
                    for op in lv[str(c)]["timings"]}
        result["efficiency"] = effs
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)

    for cpus in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, NPROBE_CPUS=str(cpus)),
            capture_output=True, text=True, timeout=3600, check=True)
        result["levels"][str(cpus)] = json.loads(
            out.stdout.strip().splitlines()[-1])
        _write()  # write-through per level
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
