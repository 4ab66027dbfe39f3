"""Benchmark decontamination (functions/decontam.py): planted-overlap
fixture plus a randomized differential against a pure-Python reference
of the spec (strict n-grams, distinct-match counting, short/empty/null
text policies)."""

import random
import re

import pytest
from pyspark.sql import functions as F

from cerberus_spark.functions import decontam as D

_BENCH = [
    ("b1", "the quick brown fox jumps over the lazy dog"),
    ("b2", "pack my box with five dozen liquor jugs"),
]

_DOCS = [
    # verbatim benchmark sentence embedded mid-document → contaminated
    ("d1", "intro words then the quick brown fox jumps over the lazy "
           "dog and a tail"),
    # shares only a 4-word prefix of b1 → clean at n=5
    ("d2", "the quick brown fox went home early tonight instead"),
    # no overlap at all
    ("d3", "completely unrelated text about something else entirely "
           "with many words"),
    # case/whitespace noise around a b2 hit → still contaminated
    ("d4", "  Pack  MY box WITH five dozen liquor jugs thanks  "),
    # shorter than n words → zero n-grams, never contaminated
    ("d5", "tiny doc"),
    # null text
    ("d6", None),
]


def test_contamination_report_planted(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(_BENCH, "doc_id string, text string")
    rep = {r.doc_id: r for r in
           D.contamination_report(docs, bench, n=5).collect()}
    assert set(rep) == {f"d{i}" for i in range(1, 7)}
    assert rep["d1"].contaminated and rep["d1"].n_matched == 5
    assert not rep["d2"].contaminated and rep["d2"].n_matched == 0
    assert not rep["d3"].contaminated
    assert rep["d4"].contaminated and rep["d4"].n_matched == 4
    assert rep["d5"].n_ngrams == 0 and not rep["d5"].contaminated
    assert rep["d6"].n_ngrams == 0 and not rep["d6"].contaminated

    clean = {r.doc_id for r in D.decontaminate(docs, bench, n=5).collect()}
    assert clean == {"d2", "d3", "d5", "d6"}

    # min_matches raises the bar: d4's 4 matches no longer qualify
    strict = {r.doc_id: r.contaminated for r in D.contamination_report(
        docs, bench, n=5, min_matches=5).collect()}
    assert strict["d1"] and not strict["d4"]


_WS = re.compile(r"\s+", re.ASCII)


def _ref_grams(t, n):
    ws = [w for w in _WS.split((t or "").lower().strip()) if w]
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)} \
        if len(ws) >= n else set()


@pytest.mark.parametrize("seed", range(3))
def test_contamination_fuzz_vs_python_reference(spark, seed):
    rng = random.Random(4200 + seed)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → real collisions
    n = rng.choice([2, 3, 4])

    def sentence():
        return " ".join(rng.choices(vocab, k=rng.randrange(0, 15)))

    bench_rows = [(f"b{i}", sentence()) for i in range(6)]
    doc_rows = [(f"d{i}",
                 None if rng.random() < 0.1 else sentence())
                for i in range(40)]
    bg = set().union(*(_ref_grams(t, n) for _, t in bench_rows))
    want = {i: len(_ref_grams(t, n) & bg) for i, t in doc_rows}

    docs = spark.createDataFrame(doc_rows, "doc_id string, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id string, text string")
    got = {r.doc_id: r.n_matched for r in
           D.contamination_report(docs, bench, n=n).collect()}
    assert got == want, f"seed={seed} n={n}"


def test_broadcast_in_plan(spark):
    """The benchmark side must reach the corpus probe as a broadcast —
    a shuffle on n-gram over the corpus would be the 100-TB bottleneck."""
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(_BENCH, "doc_id string, text string")
    plan = (D.contamination_report(docs, bench, n=5, persist_grams=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # exactly ONE exchange on the gram hash — the tiny benchmark-side
    # distinct; the corpus side must reach the probe shuffle-free
    assert plan.count("Exchange hashpartitioning(g#") == 1


def test_broadcast_variant_equals_join_variant(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(_BENCH, "doc_id string, text string")
    a = {tuple(r) for r in
         D.contamination_report(docs, bench, n=5).collect()}
    b = {tuple(r) for r in
         D.contamination_report_broadcast(docs, bench, n=5).collect()}
    assert a == b
    # and it is a pure projection — zero exchanges
    plan = (D.contamination_report_broadcast(docs, bench, n=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_contamination_streaming_append(spark, tmp_path):
    """The broadcast form runs append-mode on a file stream — the
    ingest-time decontamination gate."""
    src = str(tmp_path / "src")
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    docs.coalesce(1).write.parquet(src)
    bench = spark.createDataFrame(_BENCH, "doc_id string, text string")
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    rep = D.contamination_report_broadcast(stream, bench, n=5)
    q = (rep.writeStream.outputMode("append").format("memory")
         .queryName("contam_stream").start())
    try:
        q.processAllAvailable()
        got = {r.doc_id: r.contaminated for r in
               spark.sql("select * from contam_stream").collect()}
        assert got == {"d1": True, "d2": False, "d3": False,
                       "d4": True, "d5": False, "d6": False}
    finally:
        q.stop()


def _ref_excise(t, bg, n):
    if t is None:
        return (None, 0)
    ws = [w for w in _WS.split(t.strip()) if w]
    lc = [w.lower() for w in ws]
    cov = [False] * len(ws)
    for i in range(len(lc) - n + 1):
        if " ".join(lc[i:i + n]) in bg:
            for j in range(i, i + n):
                cov[j] = True
    return (" ".join(w for w, c in zip(ws, cov) if not c), sum(cov))


def test_excise_contamination_planted(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(_BENCH, "doc_id string, text string")
    got = {r.doc_id: (r.text_clean, r.n_removed) for r in
           D.excise_contamination(docs, bench, n=5).collect()}
    # d1: the embedded b1 sentence (9 words) is excised, case kept
    assert got["d1"] == ("intro words then and a tail", 9)
    # d2/d3/d5: untouched (whitespace-normalized)
    assert got["d2"] == (_DOCS[1][1], 0)
    assert got["d5"] == ("tiny doc", 0)
    # d4: the b2 hit goes, original casing of survivors kept
    assert got["d4"] == ("thanks", 8)
    # null stays null
    assert got["d6"] == (None, 0)


@pytest.mark.parametrize("seed", range(2))
def test_excise_fuzz_vs_python(spark, seed):
    rng = random.Random(9300 + seed)
    vocab = [f"w{i}" for i in range(10)]
    n = rng.choice([2, 3])

    def sentence(k_hi=18):
        return " ".join(rng.choices(vocab, k=rng.randrange(0, k_hi)))

    bench_rows = [(f"b{i}", sentence(8)) for i in range(5)]
    doc_rows = [(f"d{i}", None if rng.random() < 0.1 else sentence())
                for i in range(40)]
    bg = set().union(*(_ref_grams(t, n) for _, t in bench_rows))
    want = {i: _ref_excise(t, bg, n) for i, t in doc_rows}
    docs = spark.createDataFrame(doc_rows, "doc_id string, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id string, text string")
    got = {r.doc_id: (r.text_clean, r.n_removed) for r in
           D.excise_contamination(docs, bench, n=n).collect()}
    assert got == want, f"seed={seed} n={n}"


def test_ascii_tokenization_matches_engine_spec(spark):
    """NBSP-edged text: the engine spec (ASCII \\s) keeps the NBSP
    attached to the first token, so the gram does NOT match — Python's
    unicode-wide strip would have stripped it and produced a false
    positive. Both variants must agree with the spec."""
    docs = spark.createDataFrame(
        [("d1", " the quick brown fox jumps")],
        "doc_id string, text string")
    bench = spark.createDataFrame([("b", "the quick brown fox jumps")],
                                  "doc_id string, text string")
    a = D.contamination_report(docs, bench, n=5).collect()[0]
    b = D.contamination_report_broadcast(docs, bench, n=5).collect()[0]
    assert (a.n_matched, a.contaminated) == (0, False)
    assert (b.n_matched, b.contaminated) == (0, False)
    # plain ASCII edges still match
    docs2 = spark.createDataFrame(
        [("d2", "  the quick brown fox jumps  ")],
        "doc_id string, text string")
    c = D.contamination_report_broadcast(docs2, bench, n=5).collect()[0]
    assert c.contaminated


def test_broadcast_handle_reuse(spark):
    """A pre-shipped Broadcast handle is accepted and reused (the
    streaming ingest ships the eval grams once, not per batch)."""
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(_BENCH, "doc_id string, text string")
    gs = D.collect_benchmark_grams(bench, "text", 5)
    bc = spark.sparkContext.broadcast(gs)
    got = {tuple(r) for r in D.contamination_report_broadcast(
        docs, id_col="doc_id", text_col="text", n=5,
        grams_set=bc).collect()}
    want = {tuple(r) for r in D.contamination_report_broadcast(
        docs, bench, n=5).collect()}
    assert got == want
