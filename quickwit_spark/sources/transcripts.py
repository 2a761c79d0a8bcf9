"""Deterministic synthetic transcripts table (FIXTURES.md F0).

Schema per BASELINE.json input_hint:
  (conv_id string, turn_idx int32, role string, text string,
   tool string, ts timestamp)

Seeded numpy generation: Zipfian vocabulary for realistic term-frequency
skew, injected marker terms for query fixtures, an optional super-hot
term (~30% of turns, FIXTURES.md F9) to exercise hot-term salting.
All randomness flows from one rng(seed); same (n_turns, seed, options)
=> byte-identical table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(
    [
        "bash", "python", "browser", "search", "calculator", "editor",
        "compiler", "linter", "debugger", "profiler", "formatter", "git",
        "docker", "kubectl", "sql", "curl", "grep", "awk", "sed", "make",
    ]
)
VOCAB_SIZE = 50_000
HOT_TERM = "hotterm"
EPOCH_BASE_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in epoch micros


def _vocab() -> np.ndarray:
    return np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])


def generate_transcripts(
    n_turns: int,
    seed: int = 42,
    hot_term_frac: float = 0.0,
    avg_turns_per_conv: int = 8,
    min_tokens: int = 4,
    max_tokens: int = 24,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = _vocab()

    # conversations with 1..40 turns (FIXTURES.md F0), truncated to n_turns
    n_conv_guess = max(1, n_turns // avg_turns_per_conv)
    turns_per_conv = rng.integers(1, 41, size=n_conv_guess * 2)
    cum = np.cumsum(turns_per_conv)
    n_convs = int(np.searchsorted(cum, n_turns)) + 1
    turns_per_conv = turns_per_conv[:n_convs]
    conv_idx = np.repeat(np.arange(n_convs), turns_per_conv)[:n_turns]
    turn_idx = (
        np.arange(n_turns)
        - np.concatenate(([0], cum))[conv_idx]
    ).astype(np.int32)

    conv_id = np.char.add("conv-", np.char.zfill(conv_idx.astype("U8"), 8))
    role = ROLES[turn_idx % 3]
    tool_draw = rng.integers(0, len(TOOLS) + 5, size=n_turns)
    tool = np.where(tool_draw < len(TOOLS), TOOLS[tool_draw % len(TOOLS)], None)

    # monotone per conversation, interleaved across conversations
    ts_us = EPOCH_BASE_US + (
        turn_idx.astype(np.int64) * np.int64(n_convs) + conv_idx
    ) * 1_000_000

    # Zipfian token stream
    n_tok = rng.integers(min_tokens, max_tokens + 1, size=n_turns)
    total = int(n_tok.sum())
    ranks = rng.zipf(1.3, size=total)
    ranks = np.minimum(ranks - 1, VOCAB_SIZE - 1)
    words = vocab[ranks]
    bounds = np.cumsum(n_tok)[:-1]
    token_lists = np.split(words, bounds)
    if hot_term_frac > 0:
        hot_mask = rng.random(n_turns) < hot_term_frac
    else:
        hot_mask = np.zeros(n_turns, dtype=bool)
    texts = [
        (" ".join(t) + (" " + HOT_TERM if h else ""))
        for t, h in zip(token_lists, hot_mask)
    ]

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )


def fixture_corpus(rows: list[tuple], start_conv: int = 90_000_000) -> pd.DataFrame:
    """Build a transcripts frame from (text, role, tool) tuples — used by
    the F1–F6 fixture tests; one conversation per row for stable docids."""
    n = len(rows)
    return pd.DataFrame(
        {
            "conv_id": [f"conv-{start_conv + i:08d}" for i in range(n)],
            "turn_idx": np.zeros(n, dtype=np.int32),
            "role": [r[1] if len(r) > 1 and r[1] else "user" for r in rows],
            "text": [r[0] for r in rows],
            "tool": [r[2] if len(r) > 2 else None for r in rows],
            "ts": pd.to_datetime(
                EPOCH_BASE_US + np.arange(n, dtype=np.int64) * 1_000_000, unit="us"
            ),
        }
    )
