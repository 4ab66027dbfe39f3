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


def _clustered(seed, n_per, n_clusters=4, dim=DIM, spread=0.15):
    """Clustered corpus: residual quantization's home turf."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    X = np.vstack([c + spread * rng.standard_normal((n_per, dim))
                   for c in centers])
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def test_residual_index_matches_numpy_replay(spark, tmp_path):
    X = _clustered(31, 60)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "pqres")
    cb, cent = S.build_pq_index(df, "embedding", "vec_id", path,
                                m=M, k=8, n_cells=4, sample=512, seed=7,
                                residual=True)
    assert bool(spark.read.parquet(f"{path}/meta").first()["residual"])
    q = X[5]
    got = [r.vec_id for r in
           S.pq_index_topk(spark, path, q, k=8, id_col="vec_id").collect()]
    # full numpy replay: cell assign (same -2x·c + |c|² argmin form),
    # residual encode, ADC = q·cent[cell] + LUT sum
    dsub = DIM // M
    c_sq = (cent * cent).sum(1)
    cells = (-2.0 * (X @ cent.T) + c_sq[None, :]).argmin(1)
    R = X - cent[cells]
    codes = np.stack([
        [np.argmin(((cb[j] - R[i, j * dsub:(j + 1) * dsub]) ** 2).sum(1))
         for j in range(M)] for i in range(len(X))])
    lut = np.stack([cb[j] @ q[j * dsub:(j + 1) * dsub] for j in range(M)])
    adc = (cent @ q)[cells] + lut[np.arange(M)[None, :], codes].sum(1)
    want = sorted(range(len(X)), key=lambda i: (-adc[i], i))[:8]
    assert got == want


def test_residual_recall_at_least_raw(spark, tmp_path):
    """Verdict r6 item 7 acceptance: candidate recall at equal (m, k)
    for the residual index >= the non-residual one (and ADC score
    fidelity strictly better).  Evaluated from the PERSISTED index
    artifacts (codes + codebooks read back from disk) over 40 queries
    so within-cluster near-ties average out."""
    # the IVF-PQ home regime: many coarse cells vs a small per-subspace
    # codebook (32 blob positions cannot fit in 8 codewords raw; the
    # residuals after the coarse quantizer can)
    X = _clustered(47, 16, n_clusters=32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    raw_p = str(tmp_path / "raw")
    res_p = str(tmp_path / "res")
    cb_raw, cent_raw = S.build_pq_index(df, "embedding", "vec_id", raw_p,
                                        m=M, k=8, n_cells=32, sample=1024,
                                        seed=7)
    cb_res, cent_res = S.build_pq_index(df, "embedding", "vec_id", res_p,
                                        m=M, k=8, n_cells=32, sample=1024,
                                        seed=7, residual=True)

    def reconstruct(path, cb, cent, residual):
        rows = spark.read.parquet(f"{path}/codes").collect()
        rec = np.empty((len(X), DIM))
        for r in rows:
            v = np.concatenate([cb[j][r["codes"][j]] for j in range(M)])
            if residual:
                v = v + cent[r["cell"]]
            rec[r["vec_id"]] = v
        return rec

    rec_raw = reconstruct(raw_p, cb_raw, cent_raw, False)
    rec_res = reconstruct(res_p, cb_res, cent_res, True)
    rng = np.random.RandomState(3)
    hits_raw = hits_res = 0
    err_raw = err_res = 0.0
    for qi in rng.choice(len(X), 40, replace=False):
        q = X[qi]
        true = X @ q
        want = set(np.argsort(-true)[:10])
        sr, se = rec_raw @ q, rec_res @ q
        hits_raw += len(want & set(np.argsort(-sr)[:10]))
        hits_res += len(want & set(np.argsort(-se)[:10]))
        err_raw += np.abs(sr - true).mean()
        err_res += np.abs(se - true).mean()
    assert hits_res >= hits_raw, (hits_res, hits_raw)
    assert err_res < err_raw  # strictly better ADC fidelity
    assert hits_res >= 200    # non-vacuous (>= half the 400 slots)


def test_residual_requires_cells(spark, tmp_path):
    df = spark.createDataFrame([(0, [0.0] * DIM)],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="n_cells"):
        S.build_pq_index(df, "embedding", "vec_id",
                         str(tmp_path / "x"), residual=True)
