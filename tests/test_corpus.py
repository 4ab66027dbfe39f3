"""End-to-end corpus assembly (cerberus_spark/corpus.py): one dirty
transcripts table through validate → grammar → near-dedup → redact →
split → pack, with every drop reason represented."""

from cerberus_spark.corpus import build_corpus

_SCHEMA = {
    "conv_id": {"type": "string", "required": True},
    "turn_idx": {"type": "integer", "required": True, "min": 0},
    "role": {"type": "string", "required": True,
             "allowed": ["system", "user", "assistant"]},
    "text": {"type": "string"},
}

_RULES = {
    "first_roles": ["system"],
    "transitions": {"system": ["user"], "user": ["assistant"],
                    "assistant": ["user"]},
    "ts_col": None,
}

_DUP = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon")

_ROWS = [
    # clean conversation, with PII to scrub
    ("good", 0, "system", "hello contact user@example.com please"),
    ("good", 1, "user", "fine thanks call 415-555-0133 now"),
    ("good", 2, "assistant", "number noted and redacted"),
    # rule violation (role outside allowed) → whole conv dropped
    ("badrule", 0, "system", "opening line here"),
    ("badrule", 1, "alien", "should not survive"),
    # grammar violation (first role is user) → whole conv dropped
    ("badseq", 0, "user", "starts with the wrong role"),
    ("badseq", 1, "assistant", "never reaches the corpus"),
    # near-duplicate pair → higher id dropped, min id kept
    ("dupA", 0, "system", _DUP),
    ("dupA", 1, "user", _DUP + " extra tail words here"),
    ("dupB", 0, "system", _DUP),
    ("dupB", 1, "user", _DUP + " extra tail words there"),
]


def _build(spark, **kw):
    df = spark.createDataFrame(
        _ROWS, "conv_id string, turn_idx int, role string, text string")
    return build_corpus(df, _SCHEMA, sequence_rules=_RULES,
                        dedup_threshold=0.6, pack_budget=10, **kw)


def test_build_corpus_end_to_end(spark):
    b = _build(spark)
    rows = b.turns.collect()
    convs = {r.conv_id for r in rows}
    assert convs == {"good", "dupA"}  # min-id dup representative kept
    assert len(rows) == 5

    # redaction ran after the filters
    texts = {r.text for r in rows if r.conv_id == "good"}
    assert "hello contact <EMAIL> please" in texts
    assert "fine thanks call <PHONE> now" in texts

    # split assigned per conversation (all turns of a conv agree)
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_conv.values())
    assert {s for ss in by_conv.values() for s in ss} <= \
        {"train", "val", "test"}

    # rn is the packing order, 1-based per conversation
    good = sorted((r.turn_idx, r.rn) for r in rows if r.conv_id == "good")
    assert good == [(0, 1), (1, 2), (2, 3)]

    # violations report the dropped rule-breaker
    v = b.violations.collect()
    assert any(r.conv_id == "badrule" and r.rule == "allowed" for r in v)

    # grammar scorecard covers every rule-passing conversation
    seq = {r.conv_id: r.seq_ok for r in b.seq_summary.collect()}
    assert seq["badseq"] is False and seq["good"] is True

    # packs: (conv, rn)-joinable; budget 10 over good's 4+5+4 redacted
    # tokens → turns 1-2 share pack 0, turn 3 overflows into pack 1
    packs = {(r.conv_id, r.rn): r.pack_id for r in b.packs.collect()}
    assert set(packs) == {(r.conv_id, r.rn) for r in rows}
    assert [packs[("good", i)] for i in (1, 2, 3)] == [0, 0, 1]


def test_build_corpus_optional_stages_off(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        _ROWS, "conv_id string, turn_idx int, role string, text string")
    minimal = build_corpus(df, _SCHEMA, sequence_rules=None,
                           dedup_threshold=None, redact=False,
                           pack_budget=None)
    assert minimal.seq_summary is None and minimal.packs is None
    convs = {r.conv_id for r in minimal.turns.collect()}
    # only the rule filter applied: badrule gone, dups + badseq survive
    assert convs == {"good", "badseq", "dupA", "dupB"}
    # no redaction
    assert minimal.turns.filter(F.col("text").contains("@")).count() == 1


def test_build_corpus_mixture_stage(spark):
    # 12 'web' convs vs 2 'wiki' convs; T=4 flattens hard: every wiki
    # conv survives (rate 1), web is thinned deterministically
    rows = []
    for c in range(12):
        rows += [(f"web{c}", 0, "system", f"w{c} opening line"),
                 (f"web{c}", 1, "user", f"w{c} follow up")]
    for c in range(2):
        rows += [(f"wiki{c}", 0, "system", f"k{c} opening line"),
                 (f"wiki{c}", 1, "user", f"k{c} follow up")]
    rows = [(conv, idx, role, txt,
             "wiki" if conv.startswith("wiki") else "web")
            for conv, idx, role, txt in rows]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
              " domain string")
    schema = dict(_SCHEMA)
    schema["domain"] = {"type": "string"}
    b = build_corpus(df, schema, sequence_rules=None,
                     dedup_threshold=None, redact=False,
                     mixture_col="domain", mixture_temperature=4.0,
                     split_seed="mx")
    convs = {r.conv_id for r in b.turns.collect()}
    assert {"wiki0", "wiki1"} <= convs          # rarest stratum intact
    assert len([c for c in convs if c.startswith("web")]) < 12  # thinned
    # conversations stay whole: every surviving conv has both turns
    n = {r.conv_id: 0 for r in b.turns.collect()}
    for r in b.turns.collect():
        n[r.conv_id] += 1
    assert set(n.values()) == {2}


def test_mixture_and_split_buckets_are_independent(spark):
    """Regression: the mixture stage must NOT consume the same bucket
    stream as split_assign — survivors of a hard-thinned stratum would
    occupy a bucket prefix and all land in 'train'.  Full pure-Python
    replay of both stages pins the exact surviving (conv -> split)."""
    import hashlib
    import math

    rows = [(f"web{c}", 0, "system", f"w{c} line") for c in range(300)]
    rows += [(f"wiki{c}", 0, "system", f"k{c} line") for c in range(3)]
    rows = [(conv, idx, role, txt,
             "wiki" if conv.startswith("wiki") else "web")
            for conv, idx, role, txt in rows]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
              " domain string")
    schema = dict(_SCHEMA)
    schema["domain"] = {"type": "string"}
    b = build_corpus(df, schema, sequence_rules=None,
                     dedup_threshold=None, redact=False,
                     mixture_col="domain", mixture_temperature=3.0,
                     split_seed="mixsplit")
    got = {r.conv_id: r.split for r in b.turns.collect()}

    def bucket(k, seed):
        h = hashlib.md5((k + "\x1f" + seed).encode()).hexdigest()
        return int(h[:8], 16) % 10_000

    expo = 1.0 / 3.0 - 1.0
    w = {"web": (300 / 303) ** expo, "wiki": (3 / 303) ** expo}
    mx = max(w.values())
    thr = {d: math.floor(w[d] / mx * 10_000) for d in w}
    want = {}
    for conv, _, _, _, dom in rows:
        if bucket(conv, "mixsplit/mixture") < thr[dom]:
            bk = bucket(conv, "mixsplit")
            want[conv] = ("train" if bk < 9000
                          else "val" if bk < 9500 else "test")
    assert got == want
    # the replay itself must be a meaningful scenario: real thinning
    # AND more than one split value among survivors
    assert 0 < len(want) < 303
    assert len(set(want.values())) > 1


def test_build_corpus_quality_bounds(spark):
    rows = [
        ("good", 0, "system", "a healthy opening line with content"),
        ("good", 1, "user", "and a normal reply follows here"),
        # a wall of duplicate lines; the conversation concatenation
        # joins turns with ' ', so the last one merges with the next
        # turn's text -> conversation dup_line_frac = 1/3
        ("repeaty", 0, "system", "same line\nsame line\nsame line"),
        ("repeaty", 1, "user", "whatever else"),
        # two tokens total -> under the min-token floor
        ("tiny", 0, "system", "too short"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    b = build_corpus(
        df, _SCHEMA, sequence_rules=None, dedup_threshold=None,
        redact=False,
        quality_bounds={"tokens": (4, None),
                        "dup_line_frac": (None, 0.3)})
    convs = {r.conv_id for r in b.turns.collect()}
    assert convs == {"good"}

    # unknown signal names fail loudly, not silently pass-through
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown quality signal"):
        build_corpus(df, _SCHEMA, sequence_rules=None,
                     dedup_threshold=None, redact=False,
                     quality_bounds={"nope": (0, 1)})


def test_quality_gate_runs_before_dedup(spark):
    # near-identical pair where the LOWER id fails quality: with the
    # gate before dedup, the higher-id twin must SURVIVE (the garbage
    # conv cannot be the cluster's kept representative)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    junk = "x\nx\nx\nx\nx\nx\nx\nx"  # dup_line_frac 7/8
    rows = [
        ("aa", 0, "system", base),
        ("aa", 1, "user", junk),
        ("bb", 0, "system", base),
        ("bb", 1, "user", "a clean tail of words here"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    b = build_corpus(
        df, _SCHEMA, sequence_rules=None, dedup_threshold=0.5,
        redact=False, quality_bounds={"dup_line_frac": (None, 0.3)})
    convs = {r.conv_id for r in b.turns.collect()}
    assert convs == {"bb"}
