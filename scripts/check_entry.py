"""Mimic the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare
row count, column names, and an order-insensitive value hash."""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if v is None:
        return "<null>"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if len(sys.argv) > 1:  # substring filters for fast iteration
        queries = {k: v for k, v in queries.items()
                   if any(a in k for a in sys.argv[1:])}
    failures = 0
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash(srows, scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "ok  " if (ok_count and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} cols={ok_cols} "
            f"hash={'match' if ok_hash else f'{sh}!={dh}'}  ({time.time()-t0:.1f}s)"
        )
        if not ok_hash and ok_count and len(srows) < 20000:
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = {tuple(norm(r[i]) for i in order_s) for r in srows}
            dset = {tuple(norm(r[i]) for i in order_d) for r in drows}
            print("   spark-only:", sorted(sset - dset)[:3])
            print("   duck-only: ", sorted(dset - sset)[:3])

    # entry smoke
    n = entrymod.entry(spark).count()
    print(f"entry(): {n} rows (sf0.001)")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
