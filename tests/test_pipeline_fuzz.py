"""Randomized differential coverage for the corpus-assembly operators:
pack_sequences and tail_turns vs pure-Python references over dirty
frames (NULL conv/idx/text, duplicate idx, empty conversations), and
split_assign/stratified_sample invariants under random keys.

The Python references re-implement the SPEC (total order + greedy
scan), not the code, so a mis-binding in the window/mapInPandas
plumbing — batch-boundary state, NULL ordering, conv transitions —
shows up as a mismatch."""

import random

import pytest
from pyspark.sql import functions as F

from cerberus_spark.operators import pipeline as P

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _dirty_rows(rng, n_convs, max_turns):
    rows = []
    for c in range(n_convs):
        conv = None if rng.random() < 0.1 else f"c{c}"
        for t in range(rng.randrange(1, max_turns + 1)):
            idx = None if rng.random() < 0.1 else (
                t if rng.random() < 0.8 else rng.randrange(max_turns))
            text = None if rng.random() < 0.15 else " ".join(
                rng.choices(_WORDS, k=rng.randrange(0, 9)))
            rows.append((conv, idx, text, rng.randrange(10**6)))
    rng.shuffle(rows)
    return rows


def _key(r):
    # ASC NULLS FIRST on (idx, tie) — Spark's asc_nulls_first twin
    return ((r[1] is not None, r[1]), (r[3] is not None, r[3]))


def _ref_pack(rows, budget):
    """(conv, rn) -> (n_tok, pack_id) per the greedy spec."""
    by = {}
    for r in rows:
        by.setdefault(r[0], []).append(r)
    out = {}
    for conv, turns in by.items():
        turns.sort(key=_key)
        acc = pack = 0
        for rn, r in enumerate(turns, 1):
            tok = len(r[2].split()) if r[2] and r[2].strip() else 0
            if acc > 0 and acc + tok > budget:
                pack, acc = pack + 1, tok
            else:
                acc += tok
            out[(conv, rn)] = (tok, pack)
    return out


@pytest.mark.parametrize("seed", range(5))
def test_pack_fuzz_vs_python_reference(spark, seed):
    rng = random.Random(7000 + seed)
    rows = _dirty_rows(rng, n_convs=rng.randrange(3, 30), max_turns=60)
    budget = rng.choice([1, 4, 10, 50])
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, tie int")
    got = {
        (r.conv_id, r.rn): (r.n_tok, r.pack_id)
        for r in P.pack_sequences(df, budget=budget,
                                  order_tie=("tie",)).collect()
    }
    ref = _ref_pack(rows, budget)
    assert got == ref, f"pack mismatch seed={seed} budget={budget}"


@pytest.mark.parametrize("seed", range(3))
def test_tail_fuzz_vs_python_reference(spark, seed):
    rng = random.Random(8000 + seed)
    rows = _dirty_rows(rng, n_convs=rng.randrange(3, 20), max_turns=40)
    k = rng.choice([1, 3, 8])
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, tie int")
    got = {}
    for r in P.tail_turns(df, "conv_id", "turn_idx", k=k,
                          order_tie=("tie",)).collect():
        got.setdefault(r.conv_id, []).append((r.rn_desc, r.turn_idx, r.tie))
    by = {}
    for r in rows:
        by.setdefault(r[0], []).append(r)
    for conv, turns in by.items():
        turns.sort(key=_key)
        want = [(i + 1, t[1], t[3])
                for i, t in enumerate(reversed(turns[-k:]))]
        assert sorted(got.get(conv, [])) == want, \
            f"tail mismatch seed={seed} k={k} conv={conv}"


def test_split_fuzz_partition_and_dedup_invariance(spark):
    # the same keys through different frames/partitionings always land
    # in the same split — the content-addressing contract
    rng = random.Random(9000)
    keys = [f"u{rng.randrange(500)}" for _ in range(800)]  # with dups
    a = spark.createDataFrame([(k,) for k in keys], "k string")
    b = spark.createDataFrame(
        [(k,) for k in sorted(set(keys))], "k string").repartition(13)
    sa = {r.k: r.split for r in P.split_assign(a, "k", seed="z").collect()}
    sb = {r.k: r.split for r in P.split_assign(b, "k", seed="z").collect()}
    assert all(sa[k] == sb[k] for k in sb)
