"""Repetition signals (functions/repetition.py): hand-computed planted
fixture plus a randomized differential against an independently-written
brute-force reference (different formulation: per-position re-scan and
first-occurrence char accounting, not Counter arithmetic)."""

import random
import re

import pytest
from pyspark.sql import functions as F

from cerberus_spark.functions import repetition as R

_ROWS = [
    # 3x duplicate line 'aaa' (one with edge noise), one unique pair
    ("d1", "aaa\nbbb\naaa\n\n aaa \nccc"),
    # heavy 2-gram repetition: 'x y' * 3 interleaved
    ("d2", "x y x y x y"),
    # a duplicated 5-gram covering everything
    ("d3", "p q r s t p q r s t"),
    ("d4", ""),
    ("d5", None),
    ("d6", "single"),
]


def test_repetition_planted(spark):
    df = spark.createDataFrame(_ROWS, "doc_id string, text string")
    rep = {r.doc_id: r for r in R.repetition_report(
        df, top_ns=(2,), dup_ns=(5,)).collect()}

    d1 = rep["d1"]
    assert d1.n_lines == 5
    assert d1.dup_line_frac == pytest.approx(2 / 5)
    assert d1.dup_line_char_frac == pytest.approx(6 / 15)

    d2 = rep["d2"]
    # 'x y' occurs 3 times; joined length = 11
    assert d2.top2gram_char_frac == pytest.approx(3 * 3 / 11)
    assert d2.dup5gram_char_frac == 0.0

    d3 = rep["d3"]
    # the only 5-gram repeats? no — grams are sliding, 'p q r s t'
    # appears twice (positions 0 and 5), covering all 10 words
    assert d3.dup5gram_char_frac == pytest.approx(1.0)

    for k in ("d4", "d5"):
        r = rep[k]
        assert (r.n_lines, r.dup_line_frac, r.top2gram_char_frac,
                r.dup5gram_char_frac) == (0, 0.0, 0.0, 0.0)
    # one word -> no 2-gram
    assert rep["d6"].top2gram_char_frac == 0.0


_WS = re.compile(r"\s+", re.ASCII)


def _ref(t, top_ns, dup_ns):
    """Brute-force spec re-implementation (per-position scans)."""
    t = (t or "").lower()
    lines = [x.strip() for x in t.split("\n")]
    lines = [x for x in lines if x]
    out = {"n_lines": len(lines)}
    if lines:
        firsts, seen, rep_chars = 0, set(), 0
        dups = 0
        for ln in lines:
            if ln in seen:
                dups += 1
                rep_chars += len(ln)
            else:
                seen.add(ln)
                firsts += len(ln)
        out["dup_line_frac"] = dups / len(lines)
        tot = firsts + rep_chars
        out["dup_line_char_frac"] = rep_chars / tot if tot else 0.0
    else:
        out["dup_line_frac"] = out["dup_line_char_frac"] = 0.0

    ws = [w for w in _WS.split(t.strip()) if w]
    joined = " ".join(ws)
    for n in top_ns:
        best = None
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i:i + n])
            c = sum(1 for j in range(len(ws) - n + 1)
                    if " ".join(ws[j:j + n]) == g)
            if best is None or (c, [-ord(ch) for ch in g]) > \
                    (best[0], [-ord(ch) for ch in best[1]]):
                best = (c, g)
        out[f"top{n}gram_char_frac"] = (
            best[0] * len(best[1]) / len(joined) if best and joined else 0.0)
    for n in dup_ns:
        covered = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            g = ws[i:i + n]
            if any(ws[j:j + n] == g
                   for j in range(len(ws) - n + 1) if j != i):
                for k in range(i, i + n):
                    covered[k] = True
        wc = sum(len(w) for w in ws)
        out[f"dup{n}gram_char_frac"] = (
            sum(len(w) for w, c in zip(ws, covered) if c) / wc
            if wc else 0.0)
    return out


@pytest.mark.parametrize("seed", range(3))
def test_repetition_fuzz_vs_bruteforce(spark, seed):
    rng = random.Random(5100 + seed)
    vocab = ["aa", "b", "ccc", "dd", "e"]

    def doc():
        if rng.random() < 0.08:
            return None
        parts = []
        for _ in range(rng.randrange(0, 6)):
            parts.append(" ".join(rng.choices(vocab,
                                              k=rng.randrange(0, 9))))
        return "\n".join(parts)

    rows = [(f"d{i}", doc()) for i in range(30)]
    top_ns, dup_ns = (2, 3), (2, 4)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.asDict() for r in R.repetition_report(
        df, top_ns=top_ns, dup_ns=dup_ns).collect()}
    for i, t in rows:
        want = _ref(t, top_ns, dup_ns)
        g = got[i]
        for k, v in want.items():
            assert g[k] == pytest.approx(v, abs=1e-12), \
                f"seed={seed} doc={i} field={k} text={t!r}"


def test_repetition_plan_is_stateless_projection(spark):
    df = spark.createDataFrame(_ROWS, "doc_id string, text string")
    plan = (R.repetition_report(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
