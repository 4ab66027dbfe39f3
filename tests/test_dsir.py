"""DSIR importance resampling — Python-reference fuzz + determinism.

The Python replay below re-implements the full cross-engine spec
(functions/dsir.py module docstring) independently: md5 feature
buckets, add-alpha quantized micro-nat log-probs, BIGINT dot-product
weights, hash-derandomized Gumbel top-k.  Exact equality everywhere —
the weights are integers by construction.
"""

import hashlib
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cerberus_spark.functions import dsir

B = 128  # small bucket space so collisions actually happen in tests
SEED = "t"


def _bucket(feat, n_buckets=B, seed=SEED):
    h = hashlib.md5((feat + "\x1f" + seed).encode()).hexdigest()
    return int(h[:8], 16) % n_buckets


def _feats(text):
    ws = (text or "").lower().strip().split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _counts(rows):
    c = Counter()
    for _, t in rows:
        c.update(_bucket(f) for f in _feats(t))
    return c


def _lp_q6(c, total, alpha=1.0, n_buckets=B):
    return math.floor(math.log((c + alpha) / (total + alpha * n_buckets))
                      * 1e6)


def _py_logw(rows, target_rows, alpha=1.0):
    tc, rc = _counts(target_rows), _counts(rows)
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for i, t in rows:
        w = 0
        for b, n in Counter(_bucket(f) for f in _feats(t)).items():
            w += n * (_lp_q6(tc.get(b, 0), tt, alpha)
                      - _lp_q6(rc.get(b, 0), rt, alpha))
        out[i] = w
    return out


def _gumbel_key(i, logw_q6, seed="g"):
    h = hashlib.md5((str(i) + "\x1f" + seed).encode()).hexdigest()
    u = (int(h[:8], 16) % 1_000_000 + 0.5) / 1_000_000.0
    return logw_q6 / 1e6 + -math.log(-math.log(u))


WORDS = ["spark", "data", "vector", "hash", "join", "query", "model",
         "the", "a", "of", "scale", "index"]


def _gen(rng, n, bias=None):
    rows = []
    for i in range(n):
        k = rng.randint(0, 12)
        ws = [rng.choice(bias or WORDS) for _ in range(k)]
        rows.append((i, " ".join(ws) if ws else rng.choice(["", None])))
    return rows


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(7)
    raw = _gen(rng, 120)
    # target skews toward a sub-vocabulary -> nonzero weights
    target = [(1000 + i, t) for i, t in
              _gen(rng, 25, bias=["spark", "vector", "index", "scale"])]
    df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt = spark.createDataFrame(target, "doc_id long, text string")
    return raw, target, df, tgt


def test_logweights_match_python_reference(corpora):
    raw, target, df, tgt = corpora
    rep = dsir.dsir_report(df, tgt, n_buckets=B, seed=SEED)
    got = {r["doc_id"]: r["logw_q6"] for r in rep.collect()}
    exp = _py_logw(raw, target)
    assert got == exp
    # every input row present; no-token docs score exactly 0
    empties = [i for i, t in raw if not (t or "").strip()]
    assert empties and all(got[i] == 0 for i in empties)


def test_foreign_raw_corpus_and_alpha(corpora, spark):
    raw, target, df, tgt = corpora
    rng = random.Random(11)
    raw2 = _gen(rng, 60)
    df2 = spark.createDataFrame(raw2, "doc_id long, text string")
    rep = dsir.dsir_report(df, tgt, raw=df2, alpha=0.5,
                           n_buckets=B, seed=SEED)
    got = {r["doc_id"]: r["logw_q6"] for r in rep.collect()}
    # replay with the foreign raw model
    tc, rc = _counts(target), _counts(raw2)
    tt, rt = sum(tc.values()), sum(rc.values())
    for i, t in raw:
        w = sum(n * (_lp_q6(tc.get(b, 0), tt, 0.5)
                     - _lp_q6(rc.get(b, 0), rt, 0.5))
                for b, n in
                Counter(_bucket(f) for f in _feats(t)).items())
        assert got[i] == w


def test_resample_is_gumbel_topk_and_deterministic(corpora):
    raw, target, df, tgt = corpora
    out = dsir.dsir_resample(df, tgt, k=30, n_buckets=B, seed=SEED)
    got = sorted(r["doc_id"] for r in out.collect())
    exp_w = _py_logw(raw, target)
    exp = sorted(sorted(exp_w, key=lambda i: (-_gumbel_key(i, exp_w[i]),
                                              i))[:30])
    assert got == exp
    # rerun on different partitioning -> identical selection
    out2 = dsir.dsir_resample(df.repartition(7), tgt, k=30,
                              n_buckets=B, seed=SEED)
    assert sorted(r["doc_id"] for r in out2.collect()) == exp
    # selection enriches the target vocabulary at the TOKEN level (a
    # contains-any-target-word metric saturates: the target vocab is a
    # subset of the corpus vocab, so ~every non-empty doc has a hit)
    tgt_words = {"spark", "vector", "index", "scale"}

    def tok_frac(ids):
        toks = [w for i, t in raw if i in ids
                for w in (t or "").split()]
        return sum(1 for w in toks if w in tgt_words) / max(len(toks), 1)

    assert tok_frac(set(got)) > tok_frac(set(i for i, _ in raw))


def test_ratio_table_broadcasts_and_text_never_shuffles(corpora):
    _, _, df, tgt = corpora
    rep = dsir.dsir_report(df, tgt, n_buckets=B, seed=SEED)
    plan = rep._sc._jvm.PythonSQLUtils.explainString(
        rep._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
    # the only wide exchanges carry int columns (b / id), never text:
    # no hashpartitioning on the text column anywhere
    assert "hashpartitioning(text" not in plan


def test_xxhash64_mode_matches_md5_exactly_when_collision_free(spark):
    # with a bucket space far wider than the distinct-feature count,
    # neither mode collides, so every bucket's (count, total) pair —
    # and hence every quantized log-prob and BIGINT weight — is
    # identical between the two hash functions
    rng = random.Random(13)
    raw = _gen(rng, 80)
    target = [(1000 + i, t) for i, t in
              _gen(rng, 20, bias=["spark", "vector", "index"])]
    df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt = spark.createDataFrame(target, "doc_id long, text string")
    BB = 1 << 24
    a = {r["doc_id"]: (r["n_feat"], r["logw_q6"]) for r in
         dsir.dsir_report(df, tgt, n_buckets=BB, seed=SEED).collect()}
    b = {r["doc_id"]: (r["n_feat"], r["logw_q6"]) for r in
         dsir.dsir_report(df, tgt, n_buckets=BB, seed=SEED,
                          hash="xxhash64").collect()}
    assert a == b
    # identical weights -> identical Gumbel top-k with each mode's own
    # ratio table (the verdict's acceptance shape)
    ka = sorted(r["doc_id"] for r in
                dsir.dsir_resample(df, tgt, k=25, n_buckets=BB,
                                   seed=SEED).collect())
    kb = sorted(r["doc_id"] for r in
                dsir.dsir_resample(df, tgt, k=25, n_buckets=BB,
                                   seed=SEED, hash="xxhash64").collect())
    assert ka == kb


def test_xxhash64_mode_has_no_python_worker(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    fc = dsir.dsir_feature_counts(df, "doc_id", "text", n_buckets=B,
                                  seed=SEED, hash="xxhash64")
    plan = fc._sc._jvm.PythonSQLUtils.explainString(
        fc._jdf.queryExecution(), "formatted")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    with pytest.raises(ValueError):
        dsir.dsir_feature_counts(df, "doc_id", "text", hash="sha1")


def test_tokenization_is_ascii_split_in_both_modes(spark):
    # U+00A0 (nbsp) and U+2028 (line sep) are Unicode whitespace but
    # NOT ASCII \s: the engine spec (functions/text.words) keeps them
    # inside tokens.  Python str.split() would split them — the exact
    # divergence the r6 ADVICE flagged in the md5 UDF.
    rows = [(1, "a b c"), (2, "x y"), (3, " lead")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mode in ("md5", "xxhash64"):
        fc = dsir.dsir_feature_counts(df, "doc_id", "text",
                                      n_buckets=1 << 24, seed=SEED,
                                      hash=mode)
        nf = {i: 0 for i, _ in rows}
        nf.update({r["doc_id"]: r["s"] for r in
                   fc.groupBy("doc_id").agg(F.sum("n").alias("s"))
                   .collect()})
        # doc1: tokens [a\xa0b, c] + bigram -> 3; doc2: 1 token;
        # doc3: [\xa0lead] single token (ASCII edge-strip keeps nbsp)
        assert nf == {1: 3, 2: 1, 3: 1}, mode


def test_report_loop_with_persist_disabled_pins_nothing(spark):
    rng = random.Random(17)
    raw = _gen(rng, 40)
    target = [(1000 + i, t) for i, t in _gen(rng, 10)]
    df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt = spark.createDataFrame(target, "doc_id long, text string")

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    base = n_cached()
    for _ in range(3):
        dsir.dsir_report(df, tgt, n_buckets=B, seed=SEED,
                         persist_feats=False).count()
    assert n_cached() == base


def test_stored_dsir_model_matches_inmemory(spark, tmp_path):
    rng = random.Random(43)
    raw = _gen(rng, 70)
    target = [(1000 + i, t) for i, t in
              _gen(rng, 15, bias=["spark", "vector", "index"])]
    batch = _gen(rng, 25)
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    for mode in ("md5", "xxhash64"):
        path = str(tmp_path / f"dsirm_{mode}")
        dsir.write_dsir_model(tdf, rdf, path, n_buckets=B, seed=SEED,
                              hash=mode)
        want = {r["doc_id"]: (r["n_feat"], r["logw_q6"]) for r in
                dsir.dsir_report(bdf, tdf, raw=rdf, n_buckets=B,
                                 seed=SEED, hash=mode).collect()}
        got = {r["doc_id"]: (r["n_feat"], r["logw_q6"]) for r in
               dsir.dsir_report_stored(bdf, path).collect()}
        assert got == want, mode
    # alpha stays a score-time knob on the SAME stored counts
    w05 = {r["doc_id"]: r["logw_q6"] for r in
           dsir.dsir_report_stored(bdf, path, alpha=0.5).collect()}
    exp = {r["doc_id"]: r["logw_q6"] for r in
           dsir.dsir_report(bdf, tdf, raw=rdf, alpha=0.5, n_buckets=B,
                            seed=SEED, hash="xxhash64").collect()}
    assert w05 == exp
    with pytest.raises(ValueError, match="no dsir model"):
        dsir.dsir_report_stored(bdf, str(tmp_path / "nope"))
