"""Phase decomposition of the flagship full validation pass (guide §1).

Times each sequential piece of ValidationRun.execute in isolation by
monkey-timing the sub-calls: warm session, then N full passes with
per-phase wall clocks printed.  Measurement-only — not the driver bench.

Usage: python scripts/fullpass_profile.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("fullpass_profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cerberus_spark.run import RunConfig, ValidationRun
    from cerberus_spark.sources.transcripts import TURN_SCHEMA, ensure_dataset, load

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = os.path.join(repo, ".data", "transcripts_sf0.1")
    ensure_dataset(data_dir, 600_000, seed=42)
    t_df, c_df = load(spark, data_dir)

    # warm
    warm_out = tempfile.mkdtemp(prefix="prof_warm_")
    ValidationRun(TURN_SCHEMA, RunConfig(out_dir=warm_out, n_parts=8,
                                         resume=False)).execute(
        t_df.limit(20_000), c_df)
    shutil.rmtree(warm_out, ignore_errors=True)

    for it in range(reps):
        run = ValidationRun(TURN_SCHEMA,
                            RunConfig(out_dir=tempfile.mkdtemp(prefix="prof_"),
                                      n_parts=64, resume=False))
        phases: dict[str, float] = {}

        orig_waves = run._run_validation_waves
        orig_ds = run._run_dataset_checks
        orig_drift = run._run_drift

        def tw(*a, **k):
            t0 = time.time()
            r = orig_waves(*a, **k)
            phases["waves_thread"] = time.time() - t0
            return r

        def td(*a, **k):
            t0 = time.time()
            r = orig_ds(*a, **k)
            phases["ds_thread"] = time.time() - t0
            return r

        def tf(*a, **k):
            t0 = time.time()
            r = orig_drift(*a, **k)
            phases["drift_thread"] = time.time() - t0
            return r

        run._run_validation_waves = tw
        run._run_dataset_checks = td
        run._run_drift = tf

        t0 = time.time()
        rep = run.execute(t_df, c_df)
        total = time.time() - t0
        shutil.rmtree(run.config.out_dir, ignore_errors=True)
        tail = total - max(phases.values())
        print(f"rep{it}: total={total:.3f} "
              + " ".join(f"{k}={v:.3f}" for k, v in sorted(phases.items()))
              + f" post_threads={tail:.3f} n_failed={rep.n_failed}")


if __name__ == "__main__":
    main()
