"""Unigram surprisal (functions/surprisal.py): hand-checked planted
fixture, OOV scoring against a foreign model, and a randomized
differential vs a pure-Python replay of the quantized spec."""

import math
import random
import re

import pytest

from cerberus_spark.functions import surprisal as S

_DOCS = [
    ("common", "the the the cat"),   # high-probability tokens
    ("rare", "zyx qwv"),             # singletons -> high surprisal
    ("empty", "   "),
    ("null", None),
]


def _ref(rows, alpha=1.0, train=None):
    ws_re = re.compile(r"\s+", re.ASCII)

    def toks(t):
        return [w for w in ws_re.split((t or "").lower().strip()) if w]

    train = train if train is not None else rows
    from collections import Counter

    c = Counter(t for _, txt in train for t in toks(txt))
    total, v = sum(c.values()), len(c)
    denom = total + alpha * v

    def lp_q(tok):
        p = (c[tok] + alpha) / denom if tok in c else alpha / denom
        return math.floor(math.log(p) * 1e6)

    out = {}
    for i, txt in rows:
        ts = toks(txt)
        if not ts:
            out[i] = (0, 0.0)
        else:
            sq = sum(lp_q(t) for t in ts)
            out[i] = (len(ts), (-sq) / len(ts) / 1e6)
    return out


def test_surprisal_planted(spark):
    df = spark.createDataFrame(_DOCS, "doc_id string, text string")
    got = {r.doc_id: (r.n_tok, r.surprisal)
           for r in S.surprisal_report(df).collect()}
    want = _ref(_DOCS)
    assert got == want
    # rare-token doc scores strictly above the stopword-heavy one
    assert got["rare"][1] > got["common"][1] > 0
    assert got["empty"] == (0, 0.0) and got["null"] == (0, 0.0)


def test_surprisal_oov_against_foreign_model(spark):
    train = spark.createDataFrame([("t", "aa bb aa")],
                                  "doc_id string, text string")
    score = spark.createDataFrame([("d", "aa zz")],
                                  "doc_id string, text string")
    got = S.surprisal_report(score, train=train).collect()[0]
    want = _ref([("d", "aa zz")], train=[("t", "aa bb aa")])["d"]
    assert (got.n_tok, got.surprisal) == want
    # the OOV token 'zz' scored alpha/(total+alpha*V), not a crash/null
    assert got.surprisal > 0


@pytest.mark.parametrize("seed", range(3))
def test_surprisal_fuzz_vs_python(spark, seed):
    rng = random.Random(6200 + seed)
    vocab = [f"w{i}" for i in range(20)]
    rows = [(f"d{i}",
             None if rng.random() < 0.1 else
             " ".join(rng.choices(vocab, k=rng.randrange(0, 30))))
            for i in range(40)]
    alpha = rng.choice([0.5, 1.0, 2.0])
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: (r.n_tok, r.surprisal)
           for r in S.surprisal_report(df, alpha=alpha).collect()}
    want = _ref(rows, alpha=alpha)
    for k in want:
        assert got[k][0] == want[k][0], f"seed={seed} doc={k} n_tok"
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12), \
            f"seed={seed} doc={k}"


def test_surprisal_partitioning_invariant(spark):
    """The quantized integer sums make the score independent of
    partitioning — the property a raw double sum would not have."""
    rows = [(f"d{i}", " ".join(f"w{j % 7}" for j in range(i % 25)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    a = {(r.doc_id, r.n_tok, r.surprisal)
         for r in S.surprisal_report(df).collect()}
    b = {(r.doc_id, r.n_tok, r.surprisal)
         for r in S.surprisal_report(df.repartition(13)).collect()}
    assert a == b


def test_self_scoring_single_corpus_tokenization(spark):
    """Self-scoring derives the model from the persisted per-doc token
    counts: the explode+tokenize runs once into the cache and every
    consumer (scoring join, model counts, both stats cross-joins)
    reads InMemoryTableScan — without the persist, Catalyst re-expands
    the subtree per consumer (measured 4 full corpus passes)."""
    df = spark.createDataFrame(_DOCS, "doc_id string, text string")
    plan = (S.surprisal_report(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("InMemoryTableScan") >= 3


# ---------------------------------------------------------------------------
# n-gram stupid-backoff surprisal (ngram_surprisal_report)
# ---------------------------------------------------------------------------


def _ref_ngram(rows, order=3, alpha=1.0, lam=0.4, train=None):
    """Pure-Python replay of the quantized stupid-backoff spec."""
    ws_re = re.compile(r"\s+", re.ASCII)

    def toks(t):
        return [w for w in ws_re.split((t or "").lower().strip()) if w]

    train = train if train is not None else rows
    from collections import Counter

    c1, c2, c3 = Counter(), Counter(), Counter()
    for _, txt in train:
        ts = toks(txt)
        for i, w in enumerate(ts):
            c1[w] += 1
            if i >= 1:
                c2[(ts[i - 1], w)] += 1
            if i >= 2:
                c3[(ts[i - 2], ts[i - 1], w)] += 1
    total, v = sum(c1.values()), len(c1)
    denom = total + alpha * v

    def lp(ts, i):
        w = ts[i]
        uni = math.log((c1.get(w, 0) + alpha) / denom)
        if i == 0 or order < 2:
            return uni
        p1 = ts[i - 1]
        big = (math.log(c2[(p1, w)] / c1[p1]) if (p1, w) in c2
               else math.log(lam) + uni)
        if i == 1 or order < 3:
            return big
        p2 = ts[i - 2]
        return (math.log(c3[(p2, p1, w)] / c2[(p2, p1)])
                if (p2, p1, w) in c3 else math.log(lam) + big)

    out = {}
    for i, txt in rows:
        ts = toks(txt)
        if not ts:
            out[i] = (0, 0.0)
        else:
            sq = sum(math.floor(lp(ts, j) * 1e6) for j in range(len(ts)))
            out[i] = (len(ts), (-sq) / len(ts) / 1e6)
    return out


def test_ngram_surprisal_planted_self_scoring(spark):
    df = spark.createDataFrame(_DOCS, "doc_id string, text string")
    got = {r.doc_id: (r.n_tok, r.surprisal)
           for r in S.ngram_surprisal_report(df, order=3).collect()}
    want = _ref_ngram(_DOCS, order=3)
    assert got == want
    assert got["empty"] == (0, 0.0) and got["null"] == (0, 0.0)
    # self-scoring: "the the the" makes trigram/bigram continuations
    # near-deterministic -> mean surprisal drops vs the unigram tier
    uni = {r.doc_id: r.surprisal for r in S.surprisal_report(df).collect()}
    assert got["common"][1] < uni["common"]


def test_ngram_surprisal_backoff_against_foreign_model(spark):
    """A foreign model exercises every backoff branch: seen trigram,
    unseen trigram/seen bigram (one lambda), unseen bigram (two
    lambdas), and OOV unigram."""
    train_rows = [("t", "a b c a b d a b c x y")]
    rows = [
        ("tri", "a b c"),     # trigram (a,b,c) seen
        ("big", "x a b"),     # (x,a) unseen bigram, (a,b) seen
        ("oov", "zz qq"),     # everything OOV
        ("mix", "c x y a"),   # (c,x) seen? c x appears -> yes; (x,y,a)?
    ]
    train = spark.createDataFrame(train_rows, "doc_id string, text string")
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for order in (2, 3):
        got = {r.doc_id: (r.n_tok, round(r.surprisal, 9))
               for r in S.ngram_surprisal_report(
                   df, train=train, order=order).collect()}
        want = {k: (n, round(s, 9))
                for k, (n, s) in _ref_ngram(rows, order=order,
                                            train=train_rows).items()}
        assert got == want, f"order={order}"


@pytest.mark.parametrize("seed", range(3))
def test_ngram_surprisal_fuzz_vs_python(spark, seed):
    rng = random.Random(8800 + seed)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> dense n-grams

    def doc():
        return " ".join(rng.choices(vocab, k=rng.randrange(0, 15)))

    rows = [(i, doc()) for i in range(25)]
    train_rows = [(i, doc()) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    # self-scoring AND foreign-model, both orders
    for order in (2, 3):
        got = {r.doc_id: (r.n_tok, round(r.surprisal, 9))
               for r in S.ngram_surprisal_report(df, order=order).collect()}
        want = {k: (n, round(s, 9))
                for k, (n, s) in _ref_ngram(rows, order=order).items()}
        assert got == want, f"self order={order} seed={seed}"
        got = {r.doc_id: (r.n_tok, round(r.surprisal, 9))
               for r in S.ngram_surprisal_report(
                   df, train=train, order=order).collect()}
        want = {k: (n, round(s, 9))
                for k, (n, s) in _ref_ngram(rows, order=order,
                                            train=train_rows).items()}
        assert got == want, f"foreign order={order} seed={seed}"


def test_ngram_surprisal_partitioning_invariant(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(10)]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(1, 12))))
            for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    df8 = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(8)
    a = {r.doc_id: (r.n_tok, r.surprisal)
         for r in S.ngram_surprisal_report(df1).collect()}
    b = {r.doc_id: (r.n_tok, r.surprisal)
         for r in S.ngram_surprisal_report(df8).collect()}
    assert a == b  # micro-nat BIGINT sums: bit-identical across plans


def test_ngram_report_loop_with_persist_disabled_pins_nothing(spark):
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(8)]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(1, 10))))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    base = n_cached()
    for _ in range(3):
        S.ngram_surprisal_report(df, persist_pos=False).count()
    assert n_cached() == base
    # and persist_pos=False stays bit-identical to the pinned path
    a = {r.doc_id: (r.n_tok, r.surprisal)
         for r in S.ngram_surprisal_report(df).collect()}
    b = {r.doc_id: (r.n_tok, r.surprisal)
         for r in S.ngram_surprisal_report(df, persist_pos=False).collect()}
    assert a == b


def test_ngram_scoring_joins_ride_hashed_long_keys(spark):
    df = spark.createDataFrame([(1, "a b c a b")],
                               "doc_id long, text string")
    rep = S.ngram_surprisal_report(df)
    plan = rep._sc._jvm.PythonSQLUtils.explainString(
        rep._jdf.queryExecution(), "formatted")
    # every exchange keys on _id or an xxhash64-derived _k* long —
    # never on a gram string column
    for col in ("hashpartitioning(w", "hashpartitioning(p1",
                "hashpartitioning(p2"):
        assert col not in plan


def test_stored_ngram_model_matches_inmemory(spark, tmp_path):
    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(12)]
    train_rows = [(1000 + i, " ".join(rng.choices(vocab, k=rng.randrange(1, 15))))
                  for i in range(50)]
    score_rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(0, 12))))
                  for i in range(30)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    df = spark.createDataFrame(score_rows, "doc_id long, text string")
    for order in (2, 3):
        path = str(tmp_path / f"ngm{order}")
        S.write_ngram_model(train, path, order=order)
        want = {r.doc_id: (r.n_tok, r.surprisal)
                for r in S.ngram_surprisal_report(
                    df, train=train, order=order).collect()}
        got = {r.doc_id: (r.n_tok, r.surprisal)
               for r in S.ngram_surprisal_report_stored(
                   df, path).collect()}
        assert got == want, order  # bit-identical (micro-nat BIGINTs)
    with pytest.raises(ValueError, match="no ngram model"):
        S.ngram_surprisal_report_stored(df, str(tmp_path / "nope"))


def test_stored_ngram_model_loop_lifecycle(spark, tmp_path):
    rng = random.Random(37)
    vocab = [f"w{i}" for i in range(8)]
    train = spark.createDataFrame(
        [(100 + i, " ".join(rng.choices(vocab, k=8))) for i in range(20)],
        "doc_id long, text string")
    df = spark.createDataFrame(
        [(i, " ".join(rng.choices(vocab, k=6))) for i in range(10)],
        "doc_id long, text string")
    path = str(tmp_path / "ngm_loop")
    S.write_ngram_model(train, path)

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    base = n_cached()
    for _ in range(3):
        pinned = []
        S.ngram_surprisal_report_stored(df, path, pinned=pinned).count()
        assert pinned
        for p in pinned:
            p.unpersist()
    assert n_cached() == base


def test_stored_unigram_model_matches_inmemory(spark, tmp_path):
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(10)]
    train = spark.createDataFrame(
        [(100 + i, " ".join(rng.choices(vocab, k=rng.randrange(1, 12))))
         for i in range(40)], "doc_id long, text string")
    df = spark.createDataFrame(
        [(i, " ".join(rng.choices(vocab + ["oovtok"], k=6)))
         for i in range(20)], "doc_id long, text string")
    path = str(tmp_path / "ugm")
    S.write_unigram_model(train, path)
    for alpha in (1.0, 0.5):
        want = {r.doc_id: (r.n_tok, r.surprisal)
                for r in S.surprisal_report(df, train=train,
                                            alpha=alpha).collect()}
        got = {r.doc_id: (r.n_tok, r.surprisal)
               for r in S.surprisal_report_stored(df, path,
                                                  alpha=alpha).collect()}
        assert got == want, alpha
    with pytest.raises(ValueError, match="no unigram model"):
        S.surprisal_report_stored(df, str(tmp_path / "nope"))
