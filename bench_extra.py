"""Extra measurement harness for the optimization rounds (guide §1).

NOT the driver's bench — bench.py is frozen for measurement.  This
file isolates individual declared queries with the noop sink, times
them best-of-N, and optionally dumps .explain("formatted") to
plans/r08/<query>_<tag>.txt.

Usage:
    python bench_extra.py [--sf /root/testdata/sf1.0] [--reps 3]
        [--plan-tag before] [--no-time] query1 query2 ...

Prints one JSON line {"sf": ..., "queries": {name: best_sec}}.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-tag", default=None,
                    help="dump explain('formatted') to plans/r08/<q>_<tag>.txt")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cerberus_spark_bench_extra")
        .config("spark.sql.shuffle.partitions", cpus)
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

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        if args.plan_tag:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "plans", "r08")
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, f"{name}_{args.plan_tag}.txt"),
                      "w") as fh:
                fh.write(buf.getvalue())
        if args.no_time:
            continue
        best = None
        for _ in range(max(1, args.reps)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            e = time.time() - t0
            best = e if best is None or e < best else best
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
    print(json.dumps({"sf": args.sf, "queries": timings}))


if __name__ == "__main__":
    main()
