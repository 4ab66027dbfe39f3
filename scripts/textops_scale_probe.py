"""Scale + N→4N parallelism probe for the text-analysis family
(functions/decontam.py, repetition.py, surprisal.py and
operators/pipeline.mixture_resample).

Synthesizes a 2M-document corpus DETERMINISTICALLY and Spark-side
(10-50 words per doc drawn from a 50k-type vocabulary, a skewed 4-way
domain column, and a ~0.1% benchmark slice for decontamination), then
measures each operator's wall at two parallelism levels with the same
executor-CPU decomposition as the pipeline/temporal probes
(CPU-seconds are co-tenant-invariant; the wall/CPU gap is the shared
memory-bus stall a real 4N-executor cluster does not have).

Invocation: ``python scripts/textops_scale_probe.py`` runs the levels
in TPROBE_LEVELS (default "4,16"); with TPROBE_CPUS set it runs one
level and prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("TPROBE_ROWS", 1_000_000))
REPS = int(os.environ.get("TPROBE_REPS", 2))


def synth(spark, n):
    """(doc_id, text, domain): hash-derived words — deterministic,
    partitioning-invariant, no driver-side data."""
    from pyspark.sql import functions as F

    h = F.xxhash64(F.col("id"))
    n_words = (F.lit(10) + F.pmod(h, F.lit(41))).cast("int")
    # word_j = md5 prefix of a 50k-type id; the transform HOF is slow
    # (CodegenFallback) but runs ONCE into the persisted synth table
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

    from cerberus_spark.functions import decontam as DC
    from cerberus_spark.functions import repetition as R
    from cerberus_spark.functions import surprisal as SP
    from cerberus_spark.operators import pipeline as P

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"textops_probe_{cpus}")
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
    bench = docs.filter(F.col("doc_id") % 1009 == 0).persist()
    bench.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        # broadcast gram probe + one tiny count shuffle (production
        # path: the gram frame persists, so the Arrow shingler runs
        # once per pass instead of 3x)
        "contamination": lambda: noop(DC.contamination_report(
            docs, bench, "doc_id", "text", n=3)),
        # stateless Arrow projection — the linear-scaling floor
        "repetition": lambda: noop(R.repetition_report(
            docs, top_ns=(2, 3, 4), dup_ns=(5, 10))),
        # vocab shuffle + (doc,tok) agg + model join
        "surprisal": lambda: noop(SP.surprisal_report(docs)),
        # two tiny aggs + broadcast rate join
        "mixture_resample": lambda: noop(P.mixture_resample(
            docs, "domain", "doc_id", temperature=2.0, seed="probe")),
    }
    def _drop_job_caches():
        # contamination_report persists its gram frame per call; drop
        # everything EXCEPT the synth inputs so reps don't accumulate
        # cached copies (then re-pin the inputs)
        spark.catalog.clearCache()
        docs.persist().count()
        bench.persist().count()

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
            m1 = _metrics(spark)  # read BEFORE the cache re-pin below
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
            "threads_fed": round(best_m["run_s"] / best, 1),
            "rows_per_sec": round(N_ROWS / best),
        }
    spark.stop()
    return {"cpus": cpus, "n_rows": N_ROWS, "timings": timings}


def main():
    if os.environ.get("TPROBE_CPUS"):
        print(json.dumps(run_level(int(os.environ["TPROBE_CPUS"]))))
        return
    levels = [int(c) for c in
              os.environ.get("TPROBE_LEVELS", "4,16").split(",")]
    out_path = os.path.join(REPO, "BENCH", "textops_scale_probe.json")

    def _write(prior):
        all_effs = {}
        for c in sorted(int(k) for k in prior):
            if str(4 * c) in prior:
                all_effs[f"{c}_to_{4*c}"] = {
                    op: round(
                        (prior[str(4 * c)]["timings"][op]["rows_per_sec"]
                         / prior[str(c)]["timings"][op]["rows_per_sec"])
                        / 4, 3)
                    for op in prior[str(c)]["timings"]
                    if op in prior[str(4 * c)]["timings"]
                }
        with open(out_path, "w") as f:
            json.dump({"levels": prior, "efficiency": all_effs}, f,
                      indent=1)
        return all_effs

    prior = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("levels", {})
        # levels are only comparable at the same corpus size
        prior = {k: v for k, v in prior.items()
                 if v.get("n_rows") == N_ROWS}
    all_effs = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, TPROBE_CPUS=str(cpus)),
            capture_output=True, text=True, timeout=3600,
        )
        lines = [l for l in out.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"level cpus={cpus} failed:\n{out.stdout[-2000:]}\n"
                f"{out.stderr[-2000:]}")
        prior[str(cpus)] = json.loads(lines[-1])
        # write-through after EVERY level: a dead level (co-tenant OOM
        # of a python worker, subprocess timeout) must not discard the
        # levels that already ran
        all_effs = _write(prior)
    print(json.dumps({"efficiency": all_effs, "levels_run": levels},
                     indent=1))


if __name__ == "__main__":
    main()
