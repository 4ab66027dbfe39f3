"""BM25 ranking + semantic (SemDeDup-style) dedup: brute-force
references, edge policies, and plan shape."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from cerberus_spark.functions import ranking as R
from cerberus_spark.functions.dedup import semantic_dedup, semantic_pairs
from cerberus_spark.plans.explain import physical_plan, plan_report

VOCAB = ("spark shuffle join scan filter vector hash table row batch "
         "window agg sort merge stream the a data").split()


def _corpus(seed, n):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 40)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(k))))
    rows.append((n, None))      # NULL text
    rows.append((n + 1, "   ")) # whitespace-only
    return rows


def _bm25_ref(rows, terms, k1=1.2, b=0.75):
    toks = {i: (t or "").lower().split() for i, t in rows}
    n = float(len(rows))
    avgdl = sum(len(w) for w in toks.values()) / n
    dfs = [sum(1 for w in toks.values() if t in w) for t in terms]
    out = {}
    for i, w in toks.items():
        score, hit = 0.0, 0
        for t, df_t in zip(terms, dfs):
            tf = float(w.count(t))
            hit += w.count(t)
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            score += idf * (tf * (k1 + 1.0)
                            / (tf + k1 * ((1.0 - b) + b * len(w) / avgdl)))
        if hit:
            out[i] = score
    return out


def test_bm25_matches_brute_force(spark):
    rows = _corpus(7, 60)
    terms = ["vector", "hash", "spark"]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score
           for r in R.bm25_scores(df, "doc_id", "text", terms).collect()}
    want = _bm25_ref(rows, terms)
    assert set(got) == set(want)          # no-hit docs (incl. NULL) excluded
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_topk_order_and_ties(spark):
    rows = [(1, "spark spark"), (2, "spark spark"), (3, "spark"),
            (4, "join"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = R.bm25_topk(df, "doc_id", "text", ["spark"], k=2).collect()
    # docs 1 and 2 tie exactly — ascending id breaks it
    assert [r.doc_id for r in top] == [1, 2]
    with pytest.raises(ValueError):
        R.bm25_scores(df, "doc_id", "text", [])


def test_bm25_plan_shape(spark):
    df = spark.createDataFrame(_corpus(11, 40), "doc_id long, text string")
    top = R.bm25_topk(df, "doc_id", "text", ["vector", "hash"], k=5)
    top.collect()
    plan = physical_plan(top)
    rep = plan_report(top)
    assert "TakeOrderedAndProject" in plan        # bounded heap, no full sort
    assert rep["sort_merge_joins"] == 0           # stats side broadcasts
    # the corpus never hash-partitions: the only exchanges are the
    # 1-row stats aggregate (SinglePartition) and its broadcast
    assert "Exchange hashpartitioning" not in plan
    assert not rep["python_workers"]              # pure Column algebra


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def _vecs(seed, n, dim=8):
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n, dim))


def _ref_cells(X, C):
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return d.argmin(1)


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def _ref_verdicts(ids, X, C, thr):
    cells = _ref_cells(X, C)
    kept = {}
    for j, i in enumerate(ids):
        kept[i] = not any(
            cells[m] == cells[j] and _cos(X[m], X[j]) >= thr
            for m in range(len(ids)) if ids[m] < i)
    return dict(zip(ids, cells)), kept


def test_semantic_dedup_matches_brute_force(spark):
    dim, thr = 8, 0.9
    base = _vecs(3, 30, dim)
    # plant near-copies: rows 30.. are tiny perturbations of rows 0..4
    planted = base[:5] + 0.01 * _vecs(4, 5, dim)
    X = np.vstack([base, planted])
    ids = list(range(len(X)))
    C = _vecs(9, 4, dim)  # 4 anchor centroids
    rows = [(i, [float(x) for x in X[i]]) for i in ids]
    rows.append((99, None))  # NULL embedding
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cells_ref, kept_ref = _ref_verdicts(ids, X, C, thr)
    out = {r.vec_id: (r.cell, r.kept)
           for r in semantic_dedup(df, "vec_id", "embedding", C,
                                   threshold=thr).collect()}
    assert out[99] == (None, True)       # no evidence -> kept, no cell
    for i in ids:
        assert out[i] == (cells_ref[i], kept_ref[i]), i

    # pairs agree with the in-cell brute force (id_a < id_b)
    want_pairs = {(a, b) for a in ids for b in ids if a < b
                  and cells_ref[a] == cells_ref[b]
                  and _cos(X[a], X[b]) >= thr}
    got_pairs = {(r.id_a, r.id_b)
                 for r in semantic_pairs(df, "vec_id", "embedding", C,
                                         threshold=thr).collect()}
    assert got_pairs == want_pairs
    assert want_pairs  # the planted copies make this non-vacuous


def test_semantic_dedup_min_id_rule_on_chain(spark):
    """a~b and b~c but a!~c: the min-id rule drops BOTH b and c (each
    has a smaller-id in-cell neighbor) — unlike CC dedup_near, which
    would also keep only a, and unlike greedy-vs-kept, which would
    keep c.  Pin the documented rule exactly."""
    a = np.array([1.0, 0.0])
    b = np.array([math.cos(0.3), math.sin(0.3)])
    c = np.array([math.cos(0.6), math.sin(0.6)])
    thr = math.cos(0.45)  # a~b, b~c yes; a~c (0.6 rad) no
    C = np.array([[1.0, 0.3]])  # one cell
    df = spark.createDataFrame(
        [(1, [float(x) for x in a]), (2, [float(x) for x in b]),
         (3, [float(x) for x in c])],
        "vec_id long, embedding array<double>")
    out = {r.vec_id: r.kept
           for r in semantic_dedup(df, "vec_id", "embedding", C,
                                   threshold=thr).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_bm25_indexed_bitexact_and_pruned(spark, tmp_path):
    """The indexed path returns bit-identical doubles to the flat path
    and reads only the query terms' tb partitions."""
    rows = _corpus(13, 80)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["vector", "hash", "spark"]
    idx = str(tmp_path / "idx")
    R.write_text_index(df, idx, "doc_id", "text", term_buckets=16)
    flat = R.bm25_topk(df, "doc_id", "text", terms, k=15).collect()
    got = R.bm25_topk_indexed(spark, idx, terms, k=15).collect()
    assert [(r.doc_id, r.score) for r in got] \
        == [(r.doc_id, r.score) for r in flat]  # EXACT double equality
    # partition pruning: the scan's partition filter carries tb IN (…)
    q = R.bm25_topk_indexed(spark, idx, terms, k=15)
    plan = physical_plan(q)
    assert "PartitionFilters" in plan and "tb" in plan
    buckets = sorted({R._spark_term_bucket(t, 16) for t in terms})
    import os
    on_disk = sorted(int(d.split("=")[1])
                     for d in os.listdir(f"{idx}/postings")
                     if d.startswith("tb="))
    assert set(buckets) < set(on_disk)  # genuinely prunes something


def test_python_xxhash64_twin_matches_spark(spark):
    """_spark_term_bucket must agree with pmod(xxhash64(term), m) or
    pruning silently drops posting lists."""
    samples = ["", "a", "spark", "vector", "x" * 7, "y" * 8, "z" * 31,
               "w" * 32, "long token " * 13, "naïve-ünïcode", "数据"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = {r["t"]: r["b"] for r in df.select(
        "t", F.pmod(F.xxhash64("t"), F.lit(257)).alias("b")).collect()}
    for s in samples:
        assert R._spark_term_bucket(s, 257) == got[s], s


def test_semantic_pairs_cell_cap_overflow(spark):
    """Beyond cell_cap members pair with the cell head only (the LSH
    head-pairing skew guard)."""
    v = [1.0, 0.0]
    rows = [(i, [1.0 + 1e-9 * i, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = np.array([v])
    got = {(r.id_a, r.id_b)
           for r in semantic_pairs(df, "vec_id", "embedding", C,
                                   threshold=0.99, cell_cap=3).collect()}
    # full pairs among head 3; overflow ids pair with head 0 only
    assert got == {(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (0, 5)}


def test_indexed_query_reads_layout_from_stats_row(spark, tmp_path):
    # the bucket count is pinned in the index — a query can never
    # enumerate partitions with a mismatched layout (r6 ADVICE)
    rows = _corpus(29, 40)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "idx_pin")
    R.write_text_index(df, idx, "doc_id", "text", term_buckets=8)
    srow = spark.read.parquet(f"{idx}/stats").first()
    assert srow["term_buckets"] == 8
    # identical to the flat path without the caller knowing the layout
    terms = ["vector", "spark"]
    flat = R.bm25_topk(df, "doc_id", "text", terms, k=5).collect()
    got = R.bm25_topk_indexed(spark, idx, terms, k=5).collect()
    assert [(r.doc_id, r.score) for r in got] \
        == [(r.doc_id, r.score) for r in flat]
    # an index whose stats row predates the pin is rejected loudly
    # instead of silently dropping terms
    legacy = str(tmp_path / "idx_legacy")
    R.write_text_index(df, legacy, "doc_id", "text")
    (spark.read.parquet(f"{legacy}/stats").drop("term_buckets")
     .coalesce(1).write.mode("overwrite").parquet(f"{legacy}/stats2"))
    import shutil
    shutil.rmtree(f"{legacy}/stats")
    shutil.move(f"{legacy}/stats2", f"{legacy}/stats")
    with pytest.raises(ValueError, match="term_buckets"):
        R.bm25_topk_indexed(spark, legacy, terms, k=5)


def test_bm25_plus_delta_lower_bound(spark):
    rows = _corpus(37, 60)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["vector", "spark"]
    base = {r.doc_id: r.score for r in
            R.bm25_scores(df, "doc_id", "text", terms).collect()}
    plus = {r.doc_id: r.score for r in
            R.bm25_scores(df, "doc_id", "text", terms,
                          delta=1.0).collect()}
    # same matching-doc set; every score strictly larger (delta applies
    # to >= 1 matching term) and by exactly sum(idf_t) over matched
    # terms — check the per-doc delta is one of the 3 possible idf sums
    assert set(base) == set(plus)
    import math
    texts = dict(rows)
    n = len(rows)
    dfs = {t: sum(1 for _, x in rows
                  if t in (x or "").lower().split()) for t in terms}
    idf = {t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
           for t in terms}
    for i, s in base.items():
        toks = (texts[i] or "").lower().split()
        want = sum(idf[t] for t in terms if t in toks)
        assert abs((plus[i] - s) - want) < 1e-9


def test_bm25_plus_indexed_matches_flat(spark, tmp_path):
    rows = _corpus(41, 70)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "plusidx")
    R.write_text_index(df, idx, "doc_id", "text", term_buckets=16)
    terms = ["vector", "hash", "spark"]
    flat = R.bm25_topk(df, "doc_id", "text", terms, k=12,
                       delta=1.0).collect()
    got = R.bm25_topk_indexed(spark, idx, terms, k=12,
                              delta=1.0).collect()
    assert [(r.doc_id, r.score) for r in got] \
        == [(r.doc_id, r.score) for r in flat]  # exact double equality


def test_phrase_query_filters_to_adjacent_sequence(spark, tmp_path):
    rows = _corpus(43, 80)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "posidx")
    R.write_text_index(df, idx, "doc_id", "text", term_buckets=16,
                       positions=True)
    terms = ["vector", "hash"]
    got = R.bm25_topk_indexed(spark, idx, terms, k=50, phrase=True)
    ids = [r.doc_id for r in got.collect()]
    texts = dict(rows)
    with_phrase = {i for i, t in rows
                   if "vector hash" in " ".join((t or "").lower().split())}
    assert set(ids) <= with_phrase and ids  # only true adjacencies
    # every phrase doc inside the top-50 cut is present (k exceeds the
    # phrase-doc count in this fixture)
    assert set(ids) == with_phrase
    # scores equal the plain 2-term BM25 scores for those docs
    flat = {r.doc_id: r.score for r in
            R.bm25_scores(df, "doc_id", "text", terms).collect()}
    for r in R.bm25_topk_indexed(spark, idx, terms, k=50,
                                 phrase=True).collect():
        assert r.score == flat[r.doc_id]


def test_phrase_guards(spark, tmp_path):
    rows = _corpus(45, 20)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "noposidx")
    R.write_text_index(df, idx, "doc_id", "text", term_buckets=16)
    with pytest.raises(ValueError, match="positions"):
        R.bm25_topk_indexed(spark, idx, ["vector", "hash"], phrase=True)
    idx2 = str(tmp_path / "posidx2")
    R.write_text_index(df, idx2, "doc_id", "text", term_buckets=16,
                       positions=True)
    with pytest.raises(ValueError, match="two terms"):
        R.bm25_topk_indexed(spark, idx2, ["vector"], phrase=True)
