"""Exact small-N oracles for the dedup/ANN family (VERDICT r2 item 1).

Ground truth is computed INDEPENDENTLY (DuckDB all-pairs SQL / numpy)
over the driver fixtures at sf0.001 and compared to the distributed
LSH/banding paths:

* candidate sets ⊇ all true pairs above threshold (recall = 1)
* verified outputs ≡ exact all-pairs results (precision = 1)

The same SQL twins run in the driver's correctness gate at sf0.01
(__spark_entry__.oracle_sql); these tests keep the guarantee pinned in
CI and document WHY it holds (pigeonhole blocks / banding probability /
planted-pair margins).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cerberus_spark.functions import dedup  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="driver testdata not present",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    return con


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_simhash_output_equals_exact_all_pairs(spark, duck):
    got = _rows(entrymod.q_simhash_near_dups_documents(spark, SF_DIR))
    exact = set(map(tuple, duck.execute(entrymod._simhash_pairs_sql(8)).fetchall()))
    assert got == exact
    assert len(exact) > 0  # the fixture contains near-dups — non-vacuous


def test_minhash_verified_equals_exact_and_candidates_cover(spark, duck):
    got = _rows(entrymod.q_minhash_near_dups_documents(spark, SF_DIR))
    exact = set(map(tuple, duck.execute(entrymod._minhash_pairs_sql(0.6)).fetchall()))
    assert got == exact
    assert len(exact) > 0
    # (a) recall: the candidate set with PRODUCTION defaults (bucket_cap
    # 200) still covers every true pair on the fixture
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cands = {(r.id_a, r.id_b) for r in
             dedup.minhash_lsh_candidates(docs, "doc_id", "text").collect()}
    true_pairs = {(a, b) for a, b, _ in exact}
    assert true_pairs <= cands


def test_embedding_near_dups_equals_exact(spark, duck):
    got = _rows(entrymod.q_embedding_near_dups(spark, SF_DIR))
    exact = set(map(tuple, duck.execute(entrymod._EMBEDDING_PAIRS_SQL).fetchall()))
    assert got == exact
    assert len(exact) == 10  # the 10 planted pairs, nothing natural ≥ 0.95


def test_lsh_topk_equals_exact_topk(spark, duck):
    got = [tuple(r) for r in entrymod.q_lsh_topk_embeddings(spark, SF_DIR).collect()]
    exact = duck.execute(entrymod._LSH_TOPK_PLANTED_SQL).fetchall()
    assert sorted(got) == sorted(tuple(r) for r in exact)
    # top-10 = vec 0 itself + its 9 closest planted copies
    ids = {r[0] for r in got}
    assert 0 in ids and len([i for i in ids if i >= 2_000_000]) == 9


def test_simhash_banding_equals_exact_at_10x_scale(spark):
    """Banding exactness holds at 10× the oracle scale: the pigeonhole
    blocks + exact-Hamming verify over the 5000-doc sf0.1 corpus equal a
    Spark-side brute-force all-pairs comparison (12.5M signature pairs —
    distributed cross join, which the DuckDB twin can't reach)."""
    sf01 = "/root/testdata/sf0.1/documents.parquet"
    if not os.path.exists(sf01):
        pytest.skip("sf0.1 testdata not present")
    from pyspark.sql import functions as F

    docs = spark.read.parquet(sf01)
    sig = dedup.simhash_signatures(docs, "doc_id", "text")
    a = sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sa"))
    b = sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sb"))
    exact = (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
             .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
             .filter(F.col("h") <= 8))
    exact_pairs = {(r.id_a, r.id_b, r.h) for r in exact.collect()}
    got = dedup.simhash_near_dups(docs, "doc_id", "text", max_hamming=8,
                                  bucket_cap=1_000_000)
    got_pairs = {(r.id_a, r.id_b, r.hamming) for r in got.collect()}
    assert got_pairs == exact_pairs
    assert len(exact_pairs) > 0
