"""Corpus-assembly operators (operators/pipeline.py, functions/pii.py):
semantics vs pure-Python references, determinism under repartitioning,
and the plan shapes each operator promises."""

import pytest
from pyspark.sql import Row, functions as F

from cerberus_spark.functions import pii
from cerberus_spark.operators import pipeline as P
from cerberus_spark.plans.explain import plan_report


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def _redact_one(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    sig = pii.pii_signals(F.col("text"))
    return df.select(*[c.alias(k) for k, c in sig.items()]).first().asDict()


def test_pii_categories(spark):
    r = _redact_one(
        spark,
        "mail a.b-c%d@ex-1.co.uk ssn 123-45-6789 card 4111 1111 1111 1111 "
        "ip 10.0.255.3 tel (555) 867-5309 and 555.867.5309",
    )
    assert (r["n_email"], r["n_cc"], r["n_ssn"], r["n_ip"], r["n_phone"]) == \
        (1, 1, 1, 1, 2)
    assert r["redacted"] == (
        "mail <EMAIL> ssn <SSN> card <CC> ip <IP> tel <PHONE> and <PHONE>")


def test_pii_staged_ordering(spark):
    # the card is consumed by the cc stage, so the phone stage sees no
    # 3-3-4 fragment; the ip is consumed before phone can read its
    # last two octets as a phone fragment
    r = _redact_one(spark, "4111 1111 1111 1111")
    assert r["n_cc"] == 1 and r["n_phone"] == 0
    r = _redact_one(spark, "192.168.100.1234")
    # 4-digit last octet breaks the \b ip match; the dotted 3-3-4 tail
    # then reads as a phone — the documented over-match of the
    # no-lookbehind heuristic (pinned so a pattern change is loud)
    assert r["n_ip"] == 0 and r["n_phone"] == 1
    assert r["redacted"] == "192.<PHONE>"
    r = _redact_one(spark, "10.0.0.1")
    assert r["n_ip"] == 1 and r["redacted"] == "<IP>"


def test_pii_null_and_clean(spark):
    r = _redact_one(spark, None)
    assert r["redacted"] == "" and r["n_email"] == 0
    r = _redact_one(spark, "no pii here, just words and 42 numbers")
    assert r["redacted"] == "no pii here, just words and 42 numbers"
    assert all(r[f"n_{c}"] == 0 for c, _, _ in pii.PII_PATTERNS)


# ---------------------------------------------------------------------------
# split / sample
# ---------------------------------------------------------------------------


def test_split_assign_deterministic_and_total(spark):
    df = spark.range(500).select(F.col("id").alias("k"))
    out1 = {r.k: r.split for r in P.split_assign(df, "k", seed="s").collect()}
    out2 = {r.k: r.split
            for r in P.split_assign(df.repartition(7), "k", seed="s").collect()}
    assert out1 == out2  # content-addressed: partitioning-invariant
    assert set(out1.values()) <= {"train", "val", "test"}
    n = len(out1)
    frac = sum(1 for v in out1.values() if v == "train") / n
    assert 0.8 <= frac <= 0.97  # 90% nominal, small-n wiggle


def test_split_assign_null_key_goes_last(spark):
    df = spark.createDataFrame([Row(k=None), Row(k="a")], "k string")
    got = {r.k: r.split for r in P.split_assign(df, "k").collect()}
    assert got[None] == "test"  # never silently dropped


def test_split_assign_seed_moves_rows(spark):
    df = spark.range(200).select(F.col("id").alias("k"))
    a = {r.k: r.split for r in P.split_assign(df, "k", seed="a").collect()}
    b = {r.k: r.split for r in P.split_assign(df, "k", seed="b").collect()}
    assert a != b


def test_split_assign_is_shuffle_free(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    rep = plan_report(P.split_assign(df, "k"))
    assert rep["n_exchanges"] == 0 and not rep["python_workers"]


def test_stratified_sample_allowlist(spark):
    df = spark.createDataFrame(
        [Row(k=i, s=["a", "b", "c", None][i % 4]) for i in range(400)])
    kept = P.stratified_sample(df, "k", {"a": 1.0, "b": 0.5}, "s").collect()
    by = {}
    for r in kept:
        by.setdefault(r.s, set()).add(r.k)
    assert set(by) == {"a", "b"}          # c and NULL strata dropped
    assert len(by["a"]) == 100            # fraction 1.0 keeps everything
    assert 25 <= len(by["b"]) <= 75
    # determinism: rerun on reshuffled input keeps the same rows
    kept2 = {(r.k, r.s)
             for r in P.stratified_sample(df.repartition(5), "k",
                                          {"a": 1.0, "b": 0.5}, "s").collect()}
    assert {(r.k, r.s) for r in kept} == kept2


# ---------------------------------------------------------------------------
# tail_turns / pack_sequences  (dirty frame: dup idx, NULL text/idx)
# ---------------------------------------------------------------------------

_TURNS = [
    # conv a: clean, 5 turns of 3/4/5/6/100 tokens
    ("a", 0, "one two three"), ("a", 1, "a b c d"), ("a", 2, "v w x y z"),
    ("a", 3, "q w e r t y"), ("a", 4, " ".join("t" * 1 for _ in range(100))),
    # conv b: duplicate turn_idx (text breaks the tie), NULL text, NULL idx
    ("b", None, "first by nulls-first"), ("b", 0, None),
    ("b", 1, "aa zz"), ("b", 1, "aa aa"), ("b", 2, ""),
]


def _turns_df(spark):
    return spark.createDataFrame(_TURNS, "conv_id string, turn_idx int, text string")


def _ref_order(rows):
    return sorted(rows, key=lambda r: ((r[1] is not None, r[1]),
                                       (r[2] is not None, r[2])))


def test_tail_turns(spark):
    got = P.tail_turns(_turns_df(spark), "conv_id", "turn_idx", k=3,
                       order_tie=("text",)).collect()
    by = {}
    for r in got:
        by.setdefault(r.conv_id, []).append((r.rn_desc, r.turn_idx, r.text))
    for conv in by:
        by[conv].sort()
    ref = {c: [t for t in _ref_order([r for r in _TURNS if r[0] == c])][-3:]
           for c in ("a", "b")}
    for c in ("a", "b"):
        # rn_desc 1 = final turn; compare (idx, text) in reverse order
        assert [(t[1], t[2]) for t in by[c]] == \
            [(t[1], t[2]) for t in reversed(ref[c])]


def _ref_pack(toks, budget):
    acc, pack, out = 0, 0, []
    for t in toks:
        if acc > 0 and acc + t > budget:
            pack, acc = pack + 1, t
        else:
            acc += t
        out.append(pack)
    return out


def test_pack_sequences_matches_reference(spark):
    got = P.pack_sequences(_turns_df(spark), "conv_id", "turn_idx", "text",
                           budget=8, order_tie=("text",)).collect()
    by = {}
    for r in got:
        by.setdefault(r.conv_id, []).append((r.rn, r.n_tok, r.pack_id))
    for conv, rows in by.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        toks = [r[1] for r in rows]
        assert [r[2] for r in rows] == _ref_pack(toks, 8)
    # conv a: 3/4/5/6/100 tokens at budget 8 → packs 0,0(3+4=7),1,2,3
    assert [r[2] for r in sorted(by["a"])] == [0, 0, 1, 2, 3]
    # conv b order: (NULL,'first…')=3 tok, (0,NULL)=0, (1,'aa aa')=2,
    # (1,'aa zz')=2, (2,'')=0 → 3,3,5,7,7 cumulative under 8 → all pack 0
    assert [r[2] for r in sorted(by["b"])] == [0, 0, 0, 0, 0]


def test_pack_oversized_turn_gets_own_pack(spark):
    df = spark.createDataFrame(
        [("c", 0, "x " * 50), ("c", 1, "a b"), ("c", 2, "c d")],
        "conv_id string, turn_idx int, text string")
    rows = sorted(P.pack_sequences(df, budget=10).collect())
    assert [r.pack_id for r in rows] == [0, 1, 1]
    assert rows[0].n_tok == 50  # never split, never dropped


def test_pack_plan_single_exchange_no_text_through_python(spark):
    df = _turns_df(spark)
    plan = P.pack_sequences(df, budget=8, order_tie=("text",))
    rep = plan_report(plan)
    assert rep["n_exchanges"] == 1  # ONE conv_id shuffle (the window's)
    phys = plan._jdf.queryExecution().executedPlan().toString()
    # per-partition state-carrying scan, NOT per-group applyInPandas
    # (one pandas frame per 20-turn conversation is all fixed overhead)
    assert "MapInPandas" in phys and "FlatMapGroupsInPandas" not in phys
    # rn/n_tok computed JVM-side: the pandas op's child carries ints
    # only, no text column below the python stage
    child = phys.split("MapInPandas", 1)[1]
    assert "n_tok" in child


def test_pack_order_guard_raises_on_forged_frame():
    """The mapInPandas scan asserts each conversation's rn values arrive
    as the strict sequence 1,2,3,… (r5 ADVICE/VERDICT item 3): a future
    Catalyst re-plan that reorders, splits, or interleaves conversations
    must fail loudly, never silently mis-pack."""
    import pandas as pd
    import pytest

    walker = P._make_pack_walker("conv_id", 8)

    # in-order rows pass, including a conv split across Arrow batches
    b1 = pd.DataFrame({"conv_id": ["a", "a", "b"], "rn": [1, 2, 1],
                       "turn_idx": [0, 1, 0], "n_tok": [3, 4, 2]})
    b2 = pd.DataFrame({"conv_id": ["b"], "rn": [2],
                       "turn_idx": [1], "n_tok": [5]})
    out = pd.concat(list(walker(iter([b1, b2]))))
    assert list(out["pack_id"]) == [0, 0, 0, 0]

    # reordered within a conversation
    forged = pd.DataFrame({"conv_id": ["a", "a"], "rn": [2, 1],
                           "turn_idx": [1, 0], "n_tok": [1, 1]})
    with pytest.raises(RuntimeError, match="out of order"):
        list(P._make_pack_walker("conv_id", 8)(iter([forged])))

    # a conversation arriving mid-sequence (split across partitions)
    split = pd.DataFrame({"conv_id": ["a"], "rn": [3],
                          "turn_idx": [2], "n_tok": [1]})
    with pytest.raises(RuntimeError, match="out of order"):
        list(P._make_pack_walker("conv_id", 8)(iter([split])))

    # an interleaved conversation returning after another conv
    inter = pd.DataFrame({"conv_id": ["a", "b", "a"], "rn": [1, 1, 2],
                          "turn_idx": [0, 0, 1], "n_tok": [1, 1, 1]})
    with pytest.raises(RuntimeError, match="out of order"):
        list(P._make_pack_walker("conv_id", 8)(iter([inter])))


def test_pack_and_tail_order_tie_accepts_columns(spark):
    """`order_tie` takes Column expressions (VERDICT item 7): the
    production tiebreak ``xxhash64(text)`` keeps the conv_id shuffle
    text-free while staying a total, deterministic order.  On data
    where turn_idx is already unique the assignment is identical to the
    lexicographic default."""
    df = _turns_df(spark).filter(F.col("turn_idx").isNotNull()) \
        .dropDuplicates(["conv_id", "turn_idx"])
    default = P.pack_sequences(df, budget=8, order_tie=("text",))
    hashed = P.pack_sequences(df, budget=8,
                              order_tie=(F.xxhash64("text"),))
    key = ["conv_id", "rn", "turn_idx", "n_tok", "pack_id"]
    assert sorted(map(tuple, default.select(key).collect())) == \
        sorted(map(tuple, hashed.select(key).collect()))

    # the plan above the exchange never references raw text: the window
    # sort key is materialized as the 8-byte hash BELOW the shuffle
    phys = hashed._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64(text" in phys
    above_exchange = phys.split("Exchange", 1)[0]
    assert "text#" not in above_exchange
    # while the lexicographic default must carry text through the sort
    phys_d = default._jdf.queryExecution().executedPlan().toString()
    assert "text#" in phys_d.split("Exchange", 1)[0]

    tails = P.tail_turns(df, k=2, order_tie=(F.xxhash64("text"),))
    assert tails.count() == df.select("conv_id").distinct().count() * 2


# ---------------------------------------------------------------------------
# mixture_resample (temperature-flattened domain mixing)
# ---------------------------------------------------------------------------


def _md5_bucket(key, seed="", n=10_000):
    import hashlib

    h = hashlib.md5((str(key) + "\x1f" + seed).encode()).hexdigest()
    return int(h[:8], 16) % n


def test_mixture_resample_matches_python_replay(spark):
    # 300 'big', 60 'mid', 15 'small', 25 NULL-stratum rows
    rows = ([(i, "big") for i in range(300)]
            + [(1000 + i, "mid") for i in range(60)]
            + [(2000 + i, "small") for i in range(15)]
            + [(3000 + i, None) for i in range(25)])
    df = spark.createDataFrame(rows, "k long, s string")
    got = {(r.k, r.s) for r in
           P.mixture_resample(df, "s", "k", temperature=2.0,
                              seed="mx").collect()}

    # pure-Python replay of the spec
    counts = {"big": 300, "mid": 60, "small": 15}
    tot = sum(counts.values())
    expo = 1.0 / 2.0 - 1.0
    w = {d: (n / tot) ** expo for d, n in counts.items()}
    mx = max(w.values())
    thr = {d: int(w[d] / mx * 10_000) for d in w}
    want = {(k, s) for k, s in rows
            if s is not None and _md5_bucket(k, "mx") < thr[s]}
    assert got == want
    # the rarest stratum keeps everything (rate 1)
    assert sum(1 for _, s in got if s == "small") == 15
    # the biggest is thinned toward p^(1/T): thr_big/10k = (p_b/p_s)^-.5
    assert thr["big"] == int((300 / 15) ** -0.5 * 10_000)


def test_mixture_resample_t1_keeps_all_non_null(spark):
    rows = [(i, ["a", "b"][i % 2]) for i in range(50)] + [(99, None)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = P.mixture_resample(df, "s", "k", temperature=1.0)
    assert out.count() == 50
    # mix_rate rides along for observability
    assert set(out.select("mix_rate").distinct().toPandas()["mix_rate"]) \
        == {1.0}


def test_mixture_resample_partitioning_invariant(spark):
    rows = [(i, "x" if i % 10 < 8 else "y") for i in range(500)]
    df = spark.createDataFrame(rows, "k long, s string")
    a = {r.k for r in P.mixture_resample(df, "s", "k", 4.0).collect()}
    b = {r.k for r in P.mixture_resample(df.repartition(17), "s", "k",
                                         4.0).collect()}
    assert a == b and 0 < len(a) < 500


def test_mixture_resample_corpus_side_broadcast(spark):
    rows = [(i, "x" if i % 10 < 8 else "y") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, s string")
    plan = (P.mixture_resample(df, "s", "k", 2.0)
            ._jdf.queryExecution().executedPlan().toString())
    # the corpus joins the tiny rate table via broadcast: no shuffle on
    # the corpus side (the only exchanges feed the stratum-count aggs)
    assert "BroadcastHashJoin" in plan
    for bad in ("SortMergeJoin", "ShuffledHashJoin"):
        assert bad not in plan


def test_mixture_resample_resolution_guard(spark):
    """A stratum whose keep rate would floor to 0/n_buckets raises
    loudly instead of silently annihilating the stratum."""
    import pytest as _pytest

    rows = [(i, "big") for i in range(3000)] + [(9999, "rare")]
    df = spark.createDataFrame(rows, "k long, s string")
    # T=2: big's keep rate = (3000)^-0.5 ~ 0.018 < 1/n_buckets=0.1 ->
    # threshold floors to 0 -> must raise, not annihilate the stratum
    out = P.mixture_resample(df, "s", "k", temperature=2.0, n_buckets=10)
    with _pytest.raises(Exception, match="raise n_buckets"):
        out.collect()


def test_chunk_documents_matches_python_replay(spark):
    import random

    rng = random.Random(5)
    rows = [(i, " ".join(f"t{rng.randint(0, 30)}"
                         for _ in range(rng.randint(0, 50))) or None)
            for i in range(40)]
    rows += [(100, None), (101, ""), (102, "  \t "), (103, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk, overlap = 8, 3
    stride = chunk - overlap
    got = {(r.doc_id, r.chunk_idx): (r.n_tok, r.chunk_text)
           for r in P.chunk_documents(df, chunk_tokens=chunk,
                                      overlap=overlap).collect()}
    exp = {}
    for i, t in rows:
        ws = (t or "").lower().strip().split()
        for c in range((len(ws) + stride - 1) // stride):
            piece = ws[c * stride:c * stride + chunk]
            exp[(i, c)] = (len(piece), " ".join(piece))
    assert got == exp
    # every token covered: concatenating stride-prefixes rebuilds docs
    assert (100, 0) not in got and (103, 0) in got


def test_chunk_documents_edges_and_plan(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "x")],
                               "doc_id long, text string")
    # no overlap: exact partition of the token stream
    out = {(r.doc_id, r.chunk_idx): r.chunk_text
           for r in P.chunk_documents(df, chunk_tokens=2).collect()}
    assert out == {(1, 0): "a b", (1, 1): "c d", (2, 0): "x"}
    with pytest.raises(ValueError):
        P.chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        P.chunk_documents(df, chunk_tokens=4, overlap=4)
    rep = plan_report(P.chunk_documents(df, chunk_tokens=2))
    assert rep["n_exchanges"] == 0 and not rep["python_workers"]


def test_pii_guard_short_circuit_is_transparent(spark):
    from cerberus_spark.functions import pii as P
    rows = [(0, "no digits here at all"),
            (1, "mail me a@b.io"),
            (2, "literal <EMAIL> tag but clean"),        # guard: count 0
            (3, "literal <EMAIL> tag and digit 7"),      # counted (caveat)
            (4, None),
            (5, "ssn 123-45-6789 call (415)-555-0133")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = P.pii_signals(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(k) for k, c in sig.items()]).collect()}
    assert out[0]["redacted"] == "no digits here at all"
    assert out[1]["redacted"] == "mail me <EMAIL>" and out[1]["n_email"] == 1
    assert out[2]["redacted"] == "literal <EMAIL> tag but clean"
    assert out[2]["n_email"] == 0      # guarded out: no digit/@
    # doc 3 has a digit -> chain runs, no @ so nothing is replaced,
    # but the literal tag inflates the count by 1 (documented caveat)
    assert out[3]["n_email"] == 1
    assert out[4]["redacted"] == "" and out[4]["n_phone"] == 0
    assert out[5]["n_ssn"] == 1 and out[5]["n_phone"] == 1
