"""Regenerate tests/fixtures/conv_dedup.parquet — a transcripts-shaped
table with PLANTED near-duplicate conversations for the conversation-
level dedup oracle (`conv_near_dups_transcripts`).

120 base conversations of 4-10 turns (deterministic pool text, seed
7); conversations 0-14 get a near-copy partner ("d-…" ids) with ~12%
of words perturbed (Jaccard ≈ 0.5-0.8 at 3-shingles), and 3 get an
exact copy ("x-…").  All other pairs sit far below any threshold.
"""

import os

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "conv_dedup.parquet")

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega spark shuffle executor "
    "partition catalyst arrow parquet schema predicate window session join "
    "broadcast salt skew adaptive codegen vector batch stream state"
).split()

ROLES = ["system", "user", "assistant", "user", "assistant"]


def main(seed: int = 7):
    rng = np.random.default_rng(seed)
    rows = []

    def add_conv(conv_id, turn_words, t0):
        for i, ws in enumerate(turn_words):
            rows.append((conv_id, i, ROLES[i % len(ROLES)], " ".join(ws),
                         np.datetime64("2024-03-01T00:00:00") +
                         np.timedelta64(t0 + i * 7, "s")))

    base = []
    for c in range(120):
        n_turns = int(rng.integers(4, 11))
        conv = [list(rng.choice(WORDS, size=int(rng.integers(8, 25))))
                for _ in range(n_turns)]
        base.append(conv)
        add_conv(f"c-{c:04d}", conv, c * 3600)

    # near-copies: perturb ~12% of words in each turn
    for c in range(15):
        near = []
        for ws in base[c]:
            ws = list(ws)
            for j in range(len(ws)):
                if rng.random() < 0.12:
                    ws[j] = str(rng.choice(WORDS))
            near.append(ws)
        add_conv(f"d-{c:04d}", near, 500_000 + c * 3600)

    # exact copies
    for c in range(3):
        add_conv(f"x-{c:04d}", base[40 + c], 900_000 + c * 3600)

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} rows, {df.conv_id.nunique()} conversations -> {OUT}")


if __name__ == "__main__":
    main()
