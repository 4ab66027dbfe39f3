"""Seeded fuzz differential for temporal operators vs DuckDB.

Random tables with NULL keys/timestamps, uneven key skew, and
interval/bucket widths chosen to force boundary cases (intervals much
wider and much narrower than the bucket).  Right-side (key, ts) pairs
are deduplicated — an as-of match against duplicate timestamps is
nondeterministic in BOTH engines (any SQL engine: the "most recent row"
is not unique), so determinism requires the caller's tie column, which
test_asof_right_tie_break pins separately.
"""

import datetime
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cerberus_spark.operators.temporal import asof_join, range_join, sessionize

T0 = datetime.datetime(2024, 3, 1)


def _table(rng, n, n_keys, null_rate=0.1, span=50_000):
    rows = []
    for i in range(n):
        k = None if rng.random() < null_rate else f"k{rng.randrange(n_keys)}"
        k2 = rng.randrange(2)  # second join key (coarse shard)
        t = (
            None
            if rng.random() < null_rate
            else T0 + datetime.timedelta(seconds=rng.randrange(span))
        )
        rows.append((i, k, k2, t, round(rng.uniform(0, 100), 3)))
    return pd.DataFrame(rows, columns=["rid", "k", "k2", "t", "v"]).astype(
        {"t": "datetime64[us]"}
    )


@pytest.mark.parametrize("seed", range(6))
def test_temporal_fuzz_vs_duckdb(spark, seed):
    rng = random.Random(1000 + seed)
    multi_key = rng.random() < 0.5
    on = ["k", "k2"] if multi_key else "k"
    keysql = "l.k = r.k AND l.k2 = r.k2" if multi_key else "l.k = r.k"
    dedup_cols = ["k", "k2", "t"] if multi_key else ["k", "t"]
    left = _table(rng, rng.randrange(80, 250), n_keys=rng.randrange(2, 7))
    right = _table(rng, rng.randrange(40, 150), n_keys=rng.randrange(2, 7))
    right = right.drop_duplicates(subset=dedup_cols)
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)

    # -- as-of ------------------------------------------------------------
    # DuckDB quirk (1.0.0): ASOF sorts probes NULLS LAST, so a NULL left
    # timestamp "matches" the key's max right row — but SQL inequality
    # semantics say NULL > t is never true, which is what the engine
    # implements.  The oracle therefore ASOFs only non-null-ts probes and
    # unions the null-ts rows back with NULL payloads.
    strict = rng.random() < 0.5
    op = ">" if strict else ">="
    got = asof_join(
        ldf, rdf.select("k", "k2", "t", "v"), on=on, left_ts="t",
        right_ts="t", payload=["v"], strict=strict,
    ).select("rid", "t_asof", "v_asof")
    want = con.sql(
        f"""
        SELECT l.rid, r.t AS t_asof, r.v AS v_asof
        FROM (SELECT * FROM l WHERE t IS NOT NULL) l
        ASOF LEFT JOIN (SELECT k, k2, t, v FROM r WHERE t IS NOT NULL) r
          ON {keysql} AND l.t {op} r.t
        UNION ALL
        SELECT rid, NULL, NULL FROM l WHERE t IS NULL
        """
    ).fetchall()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want)), (
        f"asof mismatch seed={seed} strict={strict}"
    )

    # -- sessionize -------------------------------------------------------
    gap = rng.choice([60, 600, 3600, 20_000])
    part = "k, k2" if multi_key else "k"
    got_s = sessionize(ldf, on, "t", float(gap), order_tie="rid").select(
        "rid", "session_idx"
    )
    want_s = con.sql(
        f"""
        WITH o AS (
          SELECT rid, k, k2, t,
                 lag(t) OVER (PARTITION BY {part}
                              ORDER BY t NULLS FIRST, rid) AS prev
          FROM l)
        SELECT rid,
               CAST(SUM(CASE WHEN COALESCE(prev IS NULL
                              OR t - prev >= INTERVAL '{gap}' SECOND,
                              TRUE) THEN 1 ELSE 0 END)
                    OVER (PARTITION BY {part} ORDER BY t NULLS FIRST, rid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - 1 AS INTEGER) AS session_idx
        FROM o
        """
    ).fetchall()
    assert sorted(map(tuple, got_s.collect())) == sorted(map(tuple, want_s)), (
        f"sessionize mismatch seed={seed} gap={gap}"
    )

    # -- range join -------------------------------------------------------
    dur = rng.choice([30, 900, 5000, 40_000])
    bucket = rng.choice([60, 3600, 25_000])
    end_inclusive = rng.random() < 0.5
    iv = rdf.filter(F.col("t").isNotNull()).select(
        "k",
        "k2",
        F.col("t").alias("s"),
        (F.col("t") + F.expr(f"INTERVAL '{dur}' SECOND")).alias("e"),
        F.col("rid").alias("iv_id"),
    )
    got_r = range_join(
        ldf, iv, on=on, left_ts="t", right_start="s", right_end="e",
        payload=["iv_id"], bucket_sec=float(bucket),
        end_inclusive=end_inclusive,
    ).select("rid", F.col("iv_id_rng").alias("iv_id"))
    eop = "<=" if end_inclusive else "<"
    want_r = con.sql(
        f"""
        SELECT l.rid, r.rid AS iv_id
        FROM l JOIN (SELECT k, k2, rid, t AS s,
                            t + INTERVAL '{dur}' SECOND AS e
                     FROM r WHERE t IS NOT NULL) r
          ON {keysql} AND l.t >= r.s AND l.t {eop} r.e
        """
    ).fetchall()
    assert sorted(map(tuple, got_r.collect())) == sorted(map(tuple, want_r)), (
        f"range mismatch seed={seed} dur={dur} bucket={bucket} incl={end_inclusive}"
    )
    con.close()
