"""phrase_freq_bulk must agree with the scalar greedy-chain reference
on arbitrary inputs (hypothesis property test)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quickwit_spark.functions.phrase import phrase_freq, phrase_freq_bulk


@st.composite
def phrase_case(draw):
    n_tokens = draw(st.integers(2, 4))
    n_docs = draw(st.integers(1, 8))
    slop = draw(st.integers(0, 5))
    docs = []
    for _ in range(n_docs):
        per_tok = []
        for _ in range(n_tokens):
            pos = draw(
                st.lists(st.integers(0, 30), min_size=1, max_size=8, unique=True)
            )
            per_tok.append(np.array(sorted(pos), dtype=np.int64))
        docs.append(per_tok)
    return docs, n_tokens, slop


@given(phrase_case())
@settings(max_examples=300, deadline=None)
def test_bulk_matches_scalar(case):
    docs, n_tokens, slop = case
    want = np.array([phrase_freq(per_tok, slop) for per_tok in docs])
    token_positions = []
    for t in range(n_tokens):
        counts = np.array([len(d[t]) for d in docs], dtype=np.int64)
        concat = np.concatenate([d[t] for d in docs])
        token_positions.append((counts, concat))
    got = phrase_freq_bulk(token_positions, slop)
    np.testing.assert_array_equal(got, want)


def test_bulk_empty():
    out = phrase_freq_bulk(
        [(np.empty(0, np.int64), np.empty(0, np.int64))] * 2, 0
    )
    assert out.size == 0
