"""Scale + N→4N parallelism probe for the corpus-assembly operators
(operators/pipeline.py, functions/pii.py).

Synthesizes a 10M-turn transcripts-shaped table DETERMINISTICALLY and
Spark-side (500k conversations × 20 turns; text = hash-derived words,
10-50 whitespace tokens per turn, PII planted on ~6% of turns so the
scrub chain does real work), then measures the four operators' walls at
two parallelism levels per the sandbox's north-rule protocol, with the
same executor-CPU decomposition as the temporal probe (CPU-seconds are
co-tenant-invariant; the wall/CPU gap is the shared-memory-bus stall
term that a real 4N-executor cluster does not have).

Invocation: ``python scripts/pipeline_scale_probe.py`` runs the levels
in PPROBE_LEVELS (default "4,16" — the pair the sf10 full-pass sweep
showed is bandwidth-clean on this box); with PPROBE_CPUS set it runs a
single level and prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("PPROBE_ROWS", 10_000_000))
TURNS_PER_CONV = 20
REPS = int(os.environ.get("PPROBE_REPS", 3))


def synth(spark, n):
    from pyspark.sql import functions as F

    h = F.xxhash64(F.col("id"))
    word = F.substring(F.md5(F.col("id").cast("string")), 1, 8)
    base_text = F.repeat(
        F.concat(word, F.lit(" ")),
        (F.lit(10) + F.pmod(h, F.lit(41))).cast("int"),
    )
    text = F.when(
        F.pmod(h, F.lit(17)) == 0,
        F.concat(base_text,
                 F.lit("user@example.com 10.1.2.3 call 415-555-0133")),
    ).otherwise(base_text)
    return spark.range(n).select(
        F.concat(F.lit("c-"), (F.col("id") / TURNS_PER_CONV)
                 .cast("long").cast("string")).alias("conv_id"),
        F.pmod(F.col("id"), F.lit(TURNS_PER_CONV)).cast("int")
        .alias("turn_idx"),
        text.alias("text"),
    )


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

    from cerberus_spark.functions import pii
    from cerberus_spark.operators import pipeline as P

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pipeline_probe_{cpus}")
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

    ev = synth(spark, N_ROWS).persist()
    ev.count()  # materialize once so walls measure the operator, not synth

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    sig = pii.pii_signals(F.col("text"))
    jobs = {
        # stateless projections — the linear-scaling floor
        "redact_pii": lambda: noop(ev.select(
            "conv_id", "turn_idx",
            *[c.alias(k) for k, c in sig.items()])),
        "split_assign": lambda: noop(
            P.split_assign(ev, "conv_id", seed="probe")),
        # one window exchange
        "tail_turns": lambda: noop(
            P.tail_turns(ev, "conv_id", "turn_idx", k=8)),
        # window exchange + Arrow applyInPandas greedy scan
        "pack_sequences": lambda: noop(
            P.pack_sequences(ev, "conv_id", "turn_idx", "text",
                             budget=512)),
    }
    timings = {}
    for name, job in jobs.items():
        job()  # warm-up (codegen/JIT/Arrow worker spin-up)
        best, best_m = None, None
        reps, cpu_reps = [], []
        for _ in range(REPS):
            m0 = _metrics(spark)
            t0 = time.time()
            job()
            e = time.time() - t0
            m1 = _metrics(spark)
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
    return {"cpus": cpus, "n_rows": N_ROWS,
            "turns_per_conv": TURNS_PER_CONV, "timings": timings}


def main():
    if os.environ.get("PPROBE_CPUS"):
        print(json.dumps(run_level(int(os.environ["PPROBE_CPUS"]))))
        return
    levels = [int(c) for c in
              os.environ.get("PPROBE_LEVELS", "4,16").split(",")]
    results = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, PPROBE_CPUS=str(cpus)),
            capture_output=True, text=True, timeout=3600,
        )
        lines = [l for l in out.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"level cpus={cpus} failed:\n{out.stdout[-2000:]}\n"
                f"{out.stderr[-2000:]}")
        results[cpus] = json.loads(lines[-1])
    out_path = os.path.join(REPO, "BENCH", "pipeline_scale_probe.json")
    prior = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("levels", {})
    prior.update({str(k): v for k, v in results.items()})
    all_effs = {}
    for c in sorted(int(k) for k in prior):
        if str(4 * c) in prior:
            all_effs[f"{c}_to_{4*c}"] = {
                op: round(
                    (prior[str(4 * c)]["timings"][op]["rows_per_sec"]
                     / prior[str(c)]["timings"][op]["rows_per_sec"]) / 4, 3)
                for op in prior[str(c)]["timings"]
                if op in prior[str(4 * c)]["timings"]
            }
    with open(out_path, "w") as f:
        json.dump({"levels": prior, "efficiency": all_effs}, f, indent=1)
    print(json.dumps({"efficiency": all_effs, "levels_run": levels},
                     indent=1))


if __name__ == "__main__":
    main()
