"""Deterministic synthetic transcripts (FIXTURES.md §1-2).

Generates the engine's primary fact table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` plus the
``conversations(conv_id, channel, created_ts)`` dimension, seeded
(default 42) and fully vectorized (numpy → arrow → parquet; no Spark
needed for datagen).  Violation injection rates follow FIXTURES.md:

* one hot conversation holding ~5% of rows (skew fixture)
* ~0.5% orphan conv_ids absent from the dimension (referential)
* ~1% duplicate (conv_id, turn_idx); ~1% negative turn_idx
* ~5% bogus roles (allowed-set)
* ~0.5% NULL text (required), ~1% tool set while role=user (dependencies)
* ~0.5% out-of-order ts (ordering window check)
* optional ``drift=True`` split: shifted text-length + role mix
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

ROLES = np.array(["system", "user", "assistant", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "editor"])
CHANNELS = np.array(["web", "api", "batch"])

_WORDS = (
    "the quick brown fox jumps over a lazy dog while spark executors shuffle "
    "partitions of conversational transcripts across the cluster validating "
    "schemas with compiled predicates and vectorized arrow batches under "
    "adaptive query execution for resilient distributed processing"
).split()


def _lorem_pool(rng: np.random.Generator, n_pool: int = 512, max_words: int = 64) -> np.ndarray:
    pool = []
    for _ in range(n_pool):
        k = int(rng.integers(1, max_words))
        pool.append(" ".join(rng.choice(_WORDS, size=k)))
    return np.array(pool, dtype=object)


def synthesize(n_rows: int, seed: int = 42, drift: bool = False) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts, conversations) pandas frames, deterministic."""
    rng = np.random.default_rng(seed + (1000 if drift else 0))

    n_convs = max(2, n_rows // 20)
    conv_ids = np.array([f"c-{i:012x}" for i in range(n_convs)], dtype=object)

    # conversation length distribution; conv 0 is the hot one (~5% of rows)
    hot_rows = max(1, int(n_rows * 0.05))
    remaining = n_rows - hot_rows
    lengths = rng.multinomial(remaining, np.ones(n_convs - 1) / (n_convs - 1))
    # fully vectorized (np.repeat/cumsum) — a per-conversation Python loop
    # is O(n_convs) array allocations and unusable at 60M+ rows
    conv_of_row = np.concatenate(
        [np.zeros(hot_rows, dtype=np.int64),
         np.repeat(np.arange(1, n_convs, dtype=np.int64), lengths)]
    )[:n_rows]

    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    idx_within = np.arange(remaining, dtype=np.int64) - np.repeat(starts, lengths)
    turn_idx = np.concatenate(
        [np.arange(hot_rows, dtype=np.int64), idx_within]
    )[:n_rows].astype(np.int32)

    n = len(conv_of_row)
    u = rng.random(n)

    # ~1% duplicates of (conv_id, turn_idx): clamp idx to the previous turn
    dup = (u < 0.01) & (turn_idx > 0)
    turn_idx = np.where(dup, turn_idx - 1, turn_idx)
    # ~1% negative turn_idx
    neg = (u >= 0.01) & (u < 0.02)
    turn_idx = np.where(neg, -turn_idx - 1, turn_idx)

    # roles via integer codes + a small-pool fancy index — string np.where
    # chains allocate multi-GB unicode temporaries at 10^7+ rows
    role_pick = rng.random(n)
    role_code = np.where(
        turn_idx % 4 == 0, 0,
        np.where(turn_idx % 2 == 1, 1,
                 np.where(role_pick < (0.3 if drift else 0.6), 2, 3)),
    )
    bogus = (u >= 0.02) & (u < 0.07)
    role_code[bogus] = 4
    role = np.array(["system", "user", "assistant", "tool", "bogus"],
                    dtype=object)[role_code]

    # text: lorem pool sample; drift shifts length distribution up
    pool = _lorem_pool(rng)
    if drift:
        pool = np.array([t + " " + t for t in pool], dtype=object)
    text_ix = rng.integers(0, len(pool), n)
    text = pool[text_ix].copy()
    null_text = (u >= 0.07) & (u < 0.075)
    text[null_text] = None

    # tool: set when role ∈ {assistant, tool}; ~1% set when role=user
    tool_pool = np.concatenate([TOOLS.astype(object), np.array([None], dtype=object)])
    tool_ix = np.where((role_code == 2) | (role_code == 3),
                       rng.integers(0, len(TOOLS), n), len(TOOLS))
    dep_viol = (u >= 0.075) & (u < 0.085) & (role_code == 1)
    dep_draw = rng.integers(0, len(TOOLS), int(dep_viol.sum()))
    tool_ix[dep_viol] = dep_draw
    tool = tool_pool[tool_ix]

    # ts: monotone per conversation (base + turn offset); ~0.5% out of order
    base = np.datetime64("2024-01-01T00:00:00") + conv_of_row * np.timedelta64(3600, "s")
    ts = base + np.abs(turn_idx.astype(np.int64)) * np.timedelta64(7, "s")
    ooo = (u >= 0.085) & (u < 0.09)
    ts = np.where(ooo, ts - np.timedelta64(3600, "s"), ts)

    conv_col = conv_ids[conv_of_row].copy()
    # ~0.5% orphan conv_ids (absent from the dimension)
    orphan = (u >= 0.09) & (u < 0.095)
    orphan_ids = np.array(
        [f"c-ffff{i:08x}" for i in range(int(orphan.sum()))], dtype=object
    )
    conv_col[orphan] = orphan_ids

    transcripts = pd.DataFrame(
        {
            "conv_id": conv_col,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )

    conversations = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "channel": CHANNELS[rng.integers(0, len(CHANNELS), n_convs)],
            "created_ts": pd.Series(
                np.datetime64("2023-12-31T00:00:00")
                + rng.integers(0, 86400, n_convs) * np.timedelta64(1, "s")
            ),
        }
    )
    return transcripts, conversations


def write_dataset(out_dir: str, n_rows: int, seed: int = 42, drift: bool = False) -> str:
    """Write transcripts.parquet + conversations.parquet under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    t, c = synthesize(n_rows, seed=seed, drift=drift)
    # small row groups keep the single file splittable across scan tasks
    # (one giant row group would serialize the whole scan onto one core)
    t.to_parquet(os.path.join(out_dir, "transcripts.parquet"), index=False,
                 row_group_size=50_000)
    c.to_parquet(os.path.join(out_dir, "conversations.parquet"), index=False)
    return out_dir


def ensure_dataset(out_dir: str, n_rows: int, seed: int = 42, drift: bool = False) -> str:
    """Idempotent write (cache for tests/bench)."""
    marker = os.path.join(out_dir, "transcripts.parquet")
    if not os.path.exists(marker):
        write_dataset(out_dir, n_rows, seed=seed, drift=drift)
    return out_dir


def load(spark, data_dir: str):
    """Read (transcripts, conversations) DataFrames from a dataset dir."""
    t = spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))
    c = spark.read.parquet(os.path.join(data_dir, "conversations.parquet"))
    return t, c


#: the flagship flat rule-set (FIXTURES.md §3)
TURN_SCHEMA = {
    "conv_id": {"type": "string", "required": True, "empty": False,
                "regex": r"c-[0-9a-f]{12}"},
    "turn_idx": {"type": "integer", "required": True, "min": 0, "max": 100000},
    "role": {"type": "string", "required": True,
             "allowed": ["system", "user", "assistant", "tool"]},
    "text": {"type": "string", "required": True, "nullable": False,
             "maxlength": 100000},
    "tool": {"type": "string", "nullable": True,
             "dependencies": {"role": ["assistant", "tool"]}},
    "ts": {"type": "datetime", "required": True},
}
