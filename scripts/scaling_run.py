"""One scaling-measurement run at a single parallelism level.

Prints ONE JSON line with wall-clock (best-of-N and all reps) AND
task-level metrics (executorCpuTime / executorRunTime from the Spark
status REST API) for:

* the compute phase — the compiled validation projection + aggregate,
  i.e. the data-proportional work that must scale with executors
* the full pass — rules + uniqueness + referential + ordering + drift +
  checkpoint writes (ValidationRun.execute)

Noise rejection (this sandbox shares 32 cores with other tenants;
identical expressions have measured 10-25× apart across runs):

* best-of-N wall-clock per phase (all reps reported, not hidden)
* executor CPU-time totals per rep — CPU seconds are invariant to
  noisy-neighbor preemption, so cpu_total(N) ≈ cpu_total(4N) evidences
  work conservation, and run_time/wall evidences achieved parallelism
* ``-XX:ActiveProcessorCount=<cores>`` pins the JVM's view of the
  machine, so the local[8] JVM sizes its GC/compiler/Netty pools like a
  real 8-core node instead of borrowing all 32 host cores
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TSF = os.environ.get("SPARK_GRAFT_TRANSCRIPTS_SF", "sf1")
REPEAT = int(os.environ.get("SPARK_GRAFT_REPEAT", "5"))
FULL_REPEAT = int(os.environ.get("SPARK_GRAFT_FULL_REPEAT", "3"))

_SF_ROWS = {"sf0.01": 60_000, "sf0.1": 600_000, "sf1": 6_000_000, "sf10": 60_000_000}


def _metrics_snapshot(spark) -> dict:
    """Cumulative executor CPU/run time over all completed stages."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.loads(r.read())
    return {
        "cpu_ns": sum(s.get("executorCpuTime", 0) for s in stages),
        "run_ms": sum(s.get("executorRunTime", 0) for s in stages),
        "n_stages": len(stages),
    }


def _timed(spark, fn, reps: int) -> list[dict]:
    out = []
    for _ in range(max(1, reps)):
        m0 = _metrics_snapshot(spark)
        t0 = time.time()
        fn()
        wall = time.time() - t0
        time.sleep(0.7)  # stage-completion events drain asynchronously
        m1 = _metrics_snapshot(spark)
        out.append({
            "wall_s": round(wall, 3),
            "cpu_s": round((m1["cpu_ns"] - m0["cpu_ns"]) / 1e9, 3),
            "run_s": round((m1["run_ms"] - m0["run_ms"]) / 1e3, 3),
        })
    return out


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"cerberus_scaling_{CPUS}")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        # the transcripts parquet dictionary-compresses ~10:1 (512-string
        # lorem pool), so bytes under-estimate rows: 4m splits give the
        # sf10 input (623MB, 60M rows) ~160 scan tasks — 5 waves at 32
        # cores, enough granularity for AQE and straggler smoothing
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAXPART", "4m"))
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_MAXPART", "4m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")  # needed for the status REST API
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.appStateStore.asyncTracking.enable", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        # size JVM-internal pools (GC, JIT, Netty) for an N-core node
        .config("spark.driver.extraJavaOptions",
                f"-XX:ActiveProcessorCount={CPUS}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cerberus_spark.run import RunConfig, ValidationRun
    from cerberus_spark.sources.transcripts import TURN_SCHEMA, ensure_dataset, load

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = os.path.join(repo, ".data", f"transcripts_{TSF}")
    n_rows = _SF_ROWS.get(TSF, 6_000_000)
    ensure_dataset(data_dir, n_rows, seed=42)
    t_df, c_df = load(spark, data_dir)

    validator = ValidationRun(TURN_SCHEMA, RunConfig(out_dir="/tmp/_unused")).validator

    # warm-up: codegen compile + JIT + page-cache the input
    validator.annotate(t_df).agg(F.count(F.lit(1))).collect()

    def compute_phase():
        validator.annotate(t_df).agg(
            F.sum((~F.col("passed")).cast("long"))
        ).collect()

    compute_reps = _timed(spark, compute_phase, REPEAT)

    if os.environ.get("SPARK_GRAFT_SKIP_FULL"):
        best_c = min(r["wall_s"] for r in compute_reps)
        print(json.dumps({
            "cpus": CPUS, "transcripts_sf": TSF, "n_rows": n_rows,
            "compute": {
                "reps": compute_reps,
                "best_wall_s": best_c,
                "turns_per_sec": round(n_rows / best_c, 1),
                "cpu_s_at_best": next(r["cpu_s"] for r in compute_reps
                                      if r["wall_s"] == best_c),
                "run_s_at_best": next(r["run_s"] for r in compute_reps
                                      if r["wall_s"] == best_c),
            },
            "full": None,
        }))
        spark.stop()
        return

    n_failed_holder = {}

    def full_pass():
        out_dir = tempfile.mkdtemp(prefix="cerb_scale_")
        # n_parts is FIXED across parallelism levels — the north rule
        # scales the cluster, not the job definition
        rep = ValidationRun(
            TURN_SCHEMA,
            RunConfig(out_dir=out_dir, n_parts=64, resume=False),
        ).execute(t_df, c_df)
        n_failed_holder["n_failed"] = rep.n_failed
        n_failed_holder["n_turns"] = rep.n_turns
        shutil.rmtree(out_dir, ignore_errors=True)

    full_reps = _timed(spark, full_pass, FULL_REPEAT)

    best_c = min(r["wall_s"] for r in compute_reps)
    best_f = min(r["wall_s"] for r in full_reps)
    result = {
        "cpus": CPUS,
        "transcripts_sf": TSF,
        "n_rows": n_rows,
        "compute": {
            "reps": compute_reps,
            "best_wall_s": best_c,
            "turns_per_sec": round(n_rows / best_c, 1),
            # cpu seconds of the best-wall rep (work-conservation evidence)
            "cpu_s_at_best": next(r["cpu_s"] for r in compute_reps
                                  if r["wall_s"] == best_c),
            "run_s_at_best": next(r["run_s"] for r in compute_reps
                                  if r["wall_s"] == best_c),
        },
        "full": {
            "reps": full_reps,
            "best_wall_s": best_f,
            "turns_per_sec": round(n_rows / best_f, 1),
            "cpu_s_at_best": next(r["cpu_s"] for r in full_reps
                                  if r["wall_s"] == best_f),
            "run_s_at_best": next(r["run_s"] for r in full_reps
                                  if r["wall_s"] == best_f),
            "n_failed": n_failed_holder.get("n_failed"),
        },
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
