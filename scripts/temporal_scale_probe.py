"""Scale + N→4N parallelism probe for the temporal operators.

Synthesizes a 10M-row events table DETERMINISTICALLY and Spark-side
(``spark.range`` + xxhash64-derived columns — no driver loop, no
external data), then measures asof_join / sessionize / range_join
walls at local[8] (N) and local[32] (4N) per the sandbox's north-rule
protocol, reporting throughput at both plus scaling efficiency.

Invocation: ``python scripts/temporal_scale_probe.py`` runs both
levels (one subprocess per level so each JVM pins its nominal core
count); with TPROBE_CPUS set it runs a single level and prints one
JSON line.
"""

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("TPROBE_ROWS", 10_000_000))
N_USERS = int(os.environ.get("TPROBE_USERS", 5_000))
SPAN_SEC = 90 * 24 * 3600
REPS = int(os.environ.get("TPROBE_REPS", 3))


def synth(spark, n):
    from pyspark.sql import functions as F

    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    h = F.xxhash64(F.col("id"))
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(h, F.lit(N_USERS)).alias("user_id"),
            (base + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(SPAN_SEC))
                .cast("double"),
            )).alias("ts"),
            F.when(F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(5)) == 0,
                   F.lit("purchase")).otherwise(F.lit("view"))
            .alias("event_type"),
            F.element_at(
                F.array(F.lit("system"), F.lit("user"), F.lit("assistant"),
                        F.lit("tool")),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(4)) + 1)
                .cast("int"),
            ).alias("role"),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(10_000)) / 100.0
             ).alias("value"),
        )
    )


def _metrics(spark) -> dict:
    """Cumulative executor CPU/run time over completed stages (REST API
    — same estimator as scripts/scaling_run.py: CPU-seconds are
    invariant to co-tenant preemption, so cpu(N) ≈ cpu(4N) evidences
    work conservation and isolates stall cycles at high thread counts)."""
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

    from cerberus_spark.operators.sequence import sequence_violations
    from cerberus_spark.operators.temporal import asof_join, range_join, sessionize

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"temporal_probe_{cpus}")
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
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL '1' HOUR")).alias("w_end"),
        F.col("event_id").alias("purchase_id"),
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        "asof_join": lambda: noop(
            asof_join(
                ev.select("event_id", "user_id", "ts"), purchases,
                on="user_id", left_ts="ts", right_ts="ts",
                payload=["value"], strict=True,
            )
        ),
        "sessionize": lambda: noop(
            sessionize(ev, "user_id", "ts", 900.0, order_tie="event_id")
        ),
        # grammar rules in one window pass; random roles make ~40% of
        # transitions illegal, so this measures dense violation emit
        # (contiguous is off: global event_ids are never per-key dense,
        # which would make 100% of rows emit and measure only the sink)
        "sequence_grammar": lambda: noop(
            sequence_violations(
                ev, conv_col="user_id", idx_col="event_id", role_col="role",
                ts_col="ts", first_roles=["system"],
                transitions={"system": ["user"],
                             "user": ["assistant", "tool", "system"],
                             "assistant": ["user", "system"],
                             "tool": ["user", "system"]},
                monotone_ts=True,
            )
        ),
        # 1h windows / 1h buckets: explode factor 2, ~2M intervals
        "range_join": lambda: noop(
            range_join(
                ev.select("event_id", "user_id", "ts"), windows,
                on="user_id", left_ts="ts", right_start="w_start",
                right_end="w_end", payload=["purchase_id"],
                bucket_sec=3600.0,
            )
        ),
    }
    timings = {}
    for name, job in jobs.items():
        job()  # warm-up (codegen/JIT)
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
    return {"cpus": cpus, "n_rows": N_ROWS, "n_users": N_USERS,
            "timings": timings}


def main():
    if os.environ.get("TPROBE_CPUS"):
        print(json.dumps(run_level(int(os.environ["TPROBE_CPUS"]))))
        return
    levels = [int(c) for c in
              os.environ.get("TPROBE_LEVELS", "8,32").split(",")]
    results = {}
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
        results[cpus] = json.loads(lines[-1])
    # N→4N efficiency for every measured (c, 4c) pair
    effs = {}
    for c in levels:
        if 4 * c in results:
            effs[f"{c}_to_{4*c}"] = {
                op: round(
                    (results[4 * c]["timings"][op]["rows_per_sec"]
                     / results[c]["timings"][op]["rows_per_sec"]) / 4, 3)
                for op in results[c]["timings"]
            }
    out_path = os.path.join(REPO, "BENCH", "temporal_scale_probe.json")
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
            }
    with open(out_path, "w") as f:
        json.dump({"levels": prior, "efficiency": all_effs}, f, indent=1)
    print(json.dumps({"efficiency": all_effs, "this_run": effs,
                      "levels_run": levels}, indent=1))


if __name__ == "__main__":
    main()
