"""Product quantization: numpy-replay exactness, null policy, and the
planted-fixture guarantee that ADC+rerank returns the exact top-k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cerberus_spark.functions import similarity as S

DIM, M = 16, 4


def _corpus(seed, n, dim=DIM):
    rng = np.random.RandomState(seed)
    X = rng.standard_normal((n, dim))
    return X / np.linalg.norm(X, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def planted(spark):
    """Normalized random corpus + 12 planted near-copies of row 0."""
    base = _corpus(11, 400)
    rng = np.random.RandomState(13)
    copies = base[0] + 0.02 * rng.standard_normal((12, DIM))
    copies /= np.linalg.norm(copies, axis=1, keepdims=True)
    X = np.vstack([base, copies])
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return X, df


def test_codebook_shapes_and_guards(planted, spark):
    X, df = planted
    cb = S.train_pq_codebooks(df, "embedding", m=M, k=8, sample=256, seed=3)
    assert cb.shape == (M, 8, DIM // M)
    with pytest.raises(ValueError, match="not divisible"):
        S.train_pq_codebooks(df, "embedding", m=5)
    with pytest.raises(ValueError, match="query dim"):
        S.pq_adc_scores_udf(cb, np.ones(DIM + 1))
    # deterministic across reruns (same layout — rand(seed) is seeded
    # per partition, the train_centroids sampling contract)
    cb2 = S.train_pq_codebooks(df, "embedding", m=M, k=8,
                               sample=256, seed=3)
    assert np.array_equal(cb, cb2)


def test_encode_and_adc_match_numpy(planted, spark):
    X, df = planted
    cb = S.train_pq_codebooks(df, "embedding", m=M, k=8, sample=256, seed=3)
    dsub = DIM // M
    q = X[0]
    enc = df.select(
        "vec_id", S.pq_encode_udf(cb)(F.col("embedding")).alias("codes"),
        S.pq_adc_scores_udf(cb, q)(
            S.pq_encode_udf(cb)(F.col("embedding"))).alias("adc"))
    got = {r.vec_id: (r.codes, r.adc) for r in enc.collect()}
    assert got[999] == (None, None)  # NULL embedding -> NULL codes/score
    lut = np.stack([cb[j] @ q[j * dsub:(j + 1) * dsub] for j in range(M)])
    for i in range(len(X)):
        codes = [int(np.argmin(((cb[j] - X[i, j * dsub:(j + 1) * dsub])
                                ** 2).sum(1))) for j in range(M)]
        assert got[i][0] == codes, i
        assert got[i][1] == pytest.approx(
            sum(lut[j, codes[j]] for j in range(M)), abs=1e-12)


def test_pq_topk_equals_exact_on_planted(planted, spark):
    X, df = planted
    cb = S.train_pq_codebooks(df, "embedding", m=M, k=16,
                              sample=512, seed=7)
    q = X[0]
    exact = S.brute_force_topk(df, "embedding", q, k=10,
                               id_col="vec_id").collect()
    got = S.pq_topk(df, "embedding", q, cb, k=10, rerank=60,
                    id_col="vec_id").collect()
    assert [(r.vec_id, r.score) for r in got] \
        == [(r.vec_id, r.score) for r in exact]
    # the winners are the planted near-copies — non-vacuous
    assert {r.vec_id for r in got} & set(range(400, 412))


def test_pq_index_roundtrip_flat(planted, spark, tmp_path):
    X, df = planted
    path = str(tmp_path / "pqidx")
    cb, cent = S.build_pq_index(df, "embedding", "vec_id", path,
                                m=M, k=16, sample=512, seed=7)
    assert cent is None
    assert np.array_equal(S.load_pq_codebooks(spark, path), cb)
    q = X[0]
    # with raw: identical to the in-memory pq_topk path
    want = S.pq_topk(df, "embedding", q, cb, k=10, rerank=60,
                     id_col="vec_id").collect()
    got = S.pq_index_topk(spark, path, q, k=10, rerank=60, raw=df,
                          id_col="vec_id").collect()
    assert [(r.vec_id, r.score) for r in got] \
        == [(r.vec_id, r.score) for r in want]
    # without raw: pure-ADC ranking replayed in numpy
    dsub = DIM // M
    lut = np.stack([cb[j] @ q[j * dsub:(j + 1) * dsub] for j in range(M)])
    codes = np.stack([
        [np.argmin(((cb[j] - X[i, j * dsub:(j + 1) * dsub]) ** 2).sum(1))
         for j in range(M)] for i in range(len(X))])
    adc = lut[np.arange(M)[None, :], codes].sum(1)
    order = sorted(range(len(X)), key=lambda i: (-adc[i], i))[:5]
    approx = S.pq_index_topk(spark, path, q, k=5, id_col="vec_id").collect()
    assert [r.vec_id for r in approx] == order


def test_pq_index_celled_prunes_and_matches_replay(planted, spark,
                                                   tmp_path):
    X, df = planted
    path = str(tmp_path / "pqcell")
    cb, cent = S.build_pq_index(df, "embedding", "vec_id", path,
                                m=M, k=16, n_cells=4, sample=512, seed=7)
    q = X[0]
    out = S.pq_index_topk(spark, path, q, k=5, rerank=40, raw=df,
                          id_col="vec_id", nprobe=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan and "cell" in plan
    # numpy replay of the full celled pipeline — no Voronoi luck
    dsub = DIM // M
    cells_of = np.array([np.argmin(((cent - X[i]) ** 2).sum(1))
                         for i in range(len(X))])
    probed = set(np.argsort(((cent - q) ** 2).sum(1))[:2])
    lut = np.stack([cb[j] @ q[j * dsub:(j + 1) * dsub] for j in range(M)])
    codes = np.stack([
        [np.argmin(((cb[j] - X[i, j * dsub:(j + 1) * dsub]) ** 2).sum(1))
         for j in range(M)] for i in range(len(X))])
    adc = lut[np.arange(M)[None, :], codes].sum(1)
    in_cells = [i for i in range(len(X)) if cells_of[i] in probed]
    cand = sorted(in_cells, key=lambda i: (-adc[i], i))[:40]
    cos = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    want = sorted(cand, key=lambda i: (-cos[i], i))[:5]
    assert [r.vec_id for r in out.collect()] == want


def test_pq_index_nprobe_on_flat_index_raises_clearly(planted, spark,
                                                      tmp_path):
    X, df = planted
    path = str(tmp_path / "pqidx_flat")
    S.build_pq_index(df, "embedding", "vec_id", path,
                     m=M, k=16, sample=512, seed=7)
    with pytest.raises(ValueError, match="not celled"):
        S.pq_index_topk(spark, path, X[0], k=5, nprobe=2)
