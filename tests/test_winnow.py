"""Exact-substring dedup (functions/winnow.py): winnowed candidate
generation with recall guarantee + L-gram-intersection verify, against
a brute-force all-pairs Python reference."""

import itertools
import random
import re

import pytest
from pyspark.sql import functions as F

from cerberus_spark.functions import winnow as WN

_WS = re.compile(r"\s+", re.ASCII)


def _words(t):
    return [w for w in _WS.split(t.strip().lower()) if w]


def _ref_pairs(rows, min_len):
    """Exact all-pairs shared-L-gram counts (id_a < id_b)."""
    grams = {}
    for i, t in rows:
        ws = _words(t)
        grams[i] = {" ".join(ws[j:j + min_len])
                    for j in range(len(ws) - min_len + 1)}
    out = {}
    for a, b in itertools.combinations(sorted(grams), 2):
        n = len(grams[a] & grams[b])
        if n:
            out[(a, b)] = n
    return out


def _got(df_rows, spark, min_len, k, **kw):
    df = spark.createDataFrame(df_rows, "doc_id long, text string")
    return {(r.id_a, r.id_b): r.n_shared
            for r in WN.substring_dup_pairs(
                df, "doc_id", "text", min_len=min_len, k=k,
                **kw).collect()}


_RUN = " ".join(f"run{i}" for i in range(20))  # the 20-token passage


def test_planted_shared_run(spark):
    pre_a = " ".join(f"alpha{i}" for i in range(7))
    pre_b = " ".join(f"beta{i}" for i in range(11))
    post_b = " ".join(f"gamma{i}" for i in range(5))
    rows = [
        (1, f"{pre_a} {_RUN}"),                  # run at the tail
        (2, f"{pre_b} {_RUN} {post_b}"),         # same run mid-document
        # shares only the FIRST 19 tokens of the run: below min_len
        (3, " ".join(f"zeta{i}" for i in range(9)) + " "
            + " ".join(_RUN.split()[:19]) + " unrelated tail "
            + " ".join(f"delta{i}" for i in range(6))),
        (4, " ".join(f"other{i}" for i in range(40))),   # disjoint
        (5, " ".join(f"tiny{i}" for i in range(10))),    # < min_len tokens
    ]
    got = _got(rows, spark, min_len=20, k=5)
    assert got == _ref_pairs(rows, 20)
    assert set(got) == {(1, 2)} and got[(1, 2)] == 1


def test_exact_duplicates_share_everything(spark):
    t = " ".join(f"w{i}" for i in range(30))
    rows = [(1, t), (2, t), (3, t + " tail")]
    got = _got(rows, spark, min_len=20, k=5)
    want = _ref_pairs(rows, 20)
    assert got == want
    assert got[(1, 2)] == 11  # 30 tokens -> 11 distinct 20-grams


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_equals_bruteforce(spark, seed):
    """Random docs over a tiny vocab (forced collisions) + planted
    copied passages: operator output ≡ brute force, pinning both the
    winnow recall guarantee and the verify exactness."""
    rng = random.Random(7300 + seed)
    vocab = [f"v{i}" for i in range(12)]
    L, k = 6, 3

    def doc():
        return " ".join(rng.choices(vocab, k=rng.randrange(0, 30)))

    rows = [(i, doc()) for i in range(25)]
    for t in range(4):  # plant L..L+4-token copies across random pairs
        src = rows[rng.randrange(len(rows))][1].split()
        if len(src) < L + t:
            continue
        j = rng.randrange(len(src) - L - t + 1)
        passage = " ".join(src[j:j + L + t])
        vict = rng.randrange(len(rows))
        rows[vict] = (rows[vict][0], rows[vict][1] + " " + passage)
    got = _got(rows, spark, min_len=L, k=k)
    assert got == _ref_pairs(rows, L), f"seed={seed}"


def test_bucket_cap_keeps_groups_connected(spark):
    """A boilerplate fingerprint shared by many docs stays bounded but
    every member still surfaces in ≥1 verified pair (head-pairing)."""
    t = " ".join(f"b{i}" for i in range(25))
    rows = [(i, t) for i in range(30)]
    got = _got(rows, spark, min_len=20, k=5, bucket_cap=4)
    members = set()
    for a, b in got:
        members.update((a, b))
    assert members == set(range(30))
    head_partners = {b for a, b in got if a == 0}
    assert head_partners == set(range(1, 30))  # overflow pairs to head


def test_dedup_substrings_keeps_min_id(spark):
    t = " ".join(f"w{i}" for i in range(30))
    rows = [(3, t), (1, t + " x"), (2, " ".join(f"u{i}" for i in range(25)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in WN.dedup_substrings(
        df, "doc_id", "text", min_len=20, k=5).collect()}
    assert kept == {1, 2}


def test_short_and_null_texts_never_pair(spark):
    rows = [(1, None), (2, ""), (3, "   "), (4, "one two three")]
    assert _got(rows, spark, min_len=5, k=2) == {}
