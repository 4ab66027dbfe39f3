"""Prototype: DuckDB exact oracles for the dedup/ANN family vs Spark.

Run:  python scripts/proto_oracles.py [sf_dir]
Compares, at the given fixture scale:
  * simhash_near_dups  vs exact all-pairs hamming over md5-spec signatures
  * minhash near-dups  vs exact all-pairs shingle Jaccard
  * embedding_near_dups vs exact all-pairs cosine (incl. planted dups)
  * lsh_topk           vs brute-force top-k
"""

import sys

import duckdb
from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")
from cerberus_spark.functions import dedup, similarity  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# ---------------------------------------------------------------------------
# DuckDB oracle SQL builders (shared with __spark_entry__ once proven)
# ---------------------------------------------------------------------------

WORDS = ("list_filter(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'), "
         "x -> length(x) > 0)")


def simhash_pairs_sql(max_hamming: int) -> str:
    sums = ",\n".join(
        f"sum(2 * ((({'hi' if b < 32 else 'lo'} >> {b if b < 32 else b - 32}) & 1)) - 1) AS t{b}"
        for b in range(64)
    )
    sig_hi = " + ".join(f"((t{b} > 0)::BIGINT << {b - 32})" for b in range(32, 64))
    sig_lo = " + ".join(f"((t{b} > 0)::BIGINT << {b})" for b in range(32))
    return f"""
WITH toks AS (
    SELECT doc_id, unnest({WORDS}) AS w FROM documents
), h AS (
    SELECT doc_id,
           ('0x' || substr(md5(w), 1, 8))::BIGINT AS hi,
           ('0x' || substr(md5(w), 9, 8))::BIGINT AS lo
    FROM toks
), t AS (
    SELECT doc_id, {sums} FROM h GROUP BY doc_id
), sig AS (
    SELECT d.doc_id,
           coalesce(({sig_lo}), 0) AS slo,
           coalesce(({sig_hi}), 0) AS shi
    -- empty-text policy (r5, shared with dedup.simhash_near_dups):
    -- docs with no tokens never enter the pair graph
    FROM documents d JOIN t ON d.doc_id = t.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       (bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) <= {max_hamming}
"""


SHINGLES = f"""
CASE WHEN len(ws) >= 3
     THEN list_distinct(list_transform(range(len(ws) - 2),
                        i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
     ELSE [array_to_string(ws, ' ')] END
"""


def minhash_pairs_sql(threshold: float) -> str:
    return f"""
WITH w AS (
    SELECT doc_id, {WORDS} AS ws FROM documents
), sh AS (
    -- empty-text policy (r5, shared with dedup.ngram_jaccard_pairs)
    SELECT doc_id, {SHINGLES} AS s FROM w WHERE len(ws) > 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.s, b.s))::DOUBLE
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
"""


def embedding_pairs_sql(threshold: float) -> str:
    return f"""
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), planted AS (
    SELECT vec_id + 1000000 AS vec_id,
           list_transform(range(len(e)), i -> e[i + 1] + 0.05 * e[len(e) - i]) AS e
    FROM base WHERE vec_id < 10
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.e, b.e), 4) AS cosine
FROM allv a JOIN allv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
"""


TOPK_SQL = """
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS score
FROM embeddings e
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC, e.vec_id
LIMIT 10
"""


def main():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))

    def cmp(name, spark_rows, duck_sql):
        duck_rows = set(map(tuple, con.execute(duck_sql).fetchall()))
        s = set(map(tuple, spark_rows))
        extra, missing = s - duck_rows, duck_rows - s
        print(f"{name}: spark={len(s)} duck={len(duck_rows)} "
              f"extra={len(extra)} missing={len(missing)}")
        for x in list(extra)[:5]:
            print("  extra:", x)
        for x in list(missing)[:5]:
            print("  missing:", x)
        return not extra and not missing

    # simhash
    sp = dedup.simhash_near_dups(docs, "doc_id", "text", max_hamming=8,
                                 bucket_cap=1_000_000)
    ok1 = cmp("simhash(h<=8)",
              [(r.id_a, r.id_b, int(r.hamming)) for r in sp.collect()],
              simhash_pairs_sql(8))

    # minhash verified jaccard
    for thr in (0.5, 0.6, 0.7, 0.8):
        sp = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=thr)
        _ = cmp(f"minhash jaccard>={thr}",
                [(r.id_a, r.id_b, round(r.jaccard, 6)) for r in sp.collect()],
                minhash_pairs_sql(thr))

    # embedding near dups (planted)
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.zip_with("embedding", F.reverse("embedding"),
                   lambda x, r: x + 0.05 * r).alias("embedding"))
    both = emb.unionByName(planted)
    sp = dedup.embedding_near_dups(both, "vec_id", "embedding",
                                   threshold=0.95, dim=64)
    ok3 = cmp("embedding cos>=0.95",
              [(r.id_a, r.id_b, float(r.cosine)) for r in
               sp.select("id_a", "id_b",
                         F.round("cosine", 4).alias("cosine")).collect()],
              embedding_pairs_sql(0.95))

    # lsh topk over a planted cluster: query = vec 0, 20 planted
    # perturbed copies of it — the true top-10 all sit at cos ≥ 0.99 so
    # the LSH bucket+multiprobe provably reaches them
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    planted2 = emb.filter(F.col("vec_id") == 0).crossJoin(
        spark.range(1, 21).select(F.col("id").cast("int").alias("i"))
    ).select(
        (F.lit(2_000_000) + F.col("i")).alias("vec_id"),
        F.zip_with("embedding", F.reverse("embedding"),
                   lambda x, r: x + 0.01 * F.col("i") * r).alias("embedding"),
    )
    corpus = emb.unionByName(planted2)
    top = similarity.lsh_topk(corpus, "embedding", qvec, k=10, id_col="vec_id",
                              n_bits=8, multiprobe=8)
    lsh_planted_sql = """
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), planted AS (
    SELECT 2000000 + i AS vec_id,
           list_transform(range(len(e)), j -> e[j + 1] + 0.01 * i * e[len(e) - j]) AS e
    FROM base, range(1, 21) t(i) WHERE vec_id = 0
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
), q AS (SELECT e FROM allv WHERE vec_id = 0)
SELECT a.vec_id, round(list_cosine_similarity(a.e, (SELECT e FROM q)), 4) AS score
FROM allv a
ORDER BY list_cosine_similarity(a.e, (SELECT e FROM q)) DESC, a.vec_id
LIMIT 10
"""
    ok4 = cmp("lsh_topk_planted",
              [(r.vec_id, float(r.score)) for r in
               top.select("vec_id", F.round("score", 4).alias("score")).collect()],
              lsh_planted_sql)
    print("ALL OK" if all([ok1, ok3, ok4]) else "SOME DIFFS")


if __name__ == "__main__":
    main()
