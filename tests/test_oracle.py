"""Oracle engine vs the reference's own golden e2e expectations
(quickwit-search/src/tests.rs), re-expressed over transcript rows
(FIXTURES.md F1–F4)."""

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.oracle import OracleEngine
from quickwit_spark.sources.transcripts import EPOCH_BASE_US, fixture_corpus

SNOOPY = (
    "Snoopy is an anthropomorphic beagle[5] in the comic strip Peanuts "
    "by Charles M. Schulz."
)
BEAGLE = (
    "The beagle is a breed of small scent hound, similar in appearance "
    "to the much larger foxhound."
)


def test_f1_simple_term_search():
    # tests.rs:31-73 analog: 'anthropomorphic' hits exactly the snoopy doc
    docs = fixture_corpus([(SNOOPY,), (BEAGLE,)])
    eng = OracleEngine(docs)
    num, hits = eng.search("anthropomorphic", k=10)
    assert num == 1
    assert len(hits) == 1
    num, hits = eng.search("beagle", k=10)
    assert num == 2
    num, hits = eng.search("nonexistentterm", k=10)
    assert num == 0


def test_f1_duplicated_corpus_tie_order():
    # tests.rs:163-213 analog: 10x duplication -> 20 hits, stable tie order
    rows = [(SNOOPY,), (BEAGLE,)] * 10
    docs = fixture_corpus(rows)
    eng = OracleEngine(docs)
    num, hits = eng.search("beagle", k=6)
    assert num == 20
    assert len(hits) == 6
    # ties break by (split_id asc, docid asc)
    keys = [(h.split_id, h.docid) for h in hits]
    scores = [h.score for h in hits]
    for i in range(1, len(hits)):
        assert scores[i - 1] >= scores[i]
        if scores[i - 1] == scores[i]:
            assert keys[i - 1] < keys[i]


F2_ROWS = [
    ("a red bike",),
    ("a small blue bike",),
    ("a small, rusty, and yellow bike",),
    ("fred's small bike",),
    ("a tiny shelter",),
]

F2_EXPECTED = [
    ('"small bird"~2', 0),
    ('"red bike"~2', 1),
    ('"small blue bike"~3', 1),
    ('"small bike"', 1),
    ('"small bike"~1', 2),
    ('"small bike"~2', 2),
    ('"small bike"~3', 3),
    ('"tiny shelter"~3', 1),
]


@pytest.mark.parametrize("query,expected", F2_EXPECTED)
def test_f2_phrase_slop(query, expected):
    # tests.rs:111-143 golden match counts
    eng = OracleEngine(fixture_corpus(F2_ROWS))
    num, _ = eng.search(query, k=10)
    assert num == expected


def _time_corpus():
    rows = [(f"info @ t:{i + 1}",) for i in range(30)]
    df = fixture_corpus(rows)
    df["ts"] = pd.to_datetime(
        EPOCH_BASE_US + (np.arange(30, dtype=np.int64) + 1) * 1_000_000, unit="us"
    )
    return df


def test_f3_time_filter_incl_excl():
    # tests.rs:215-318 analog: range [10,20) -> 10 hits
    eng = OracleEngine(_time_corpus())
    s = EPOCH_BASE_US + 10 * 1_000_000
    e = EPOCH_BASE_US + 20 * 1_000_000
    num, hits = eng.search("info", k=30, start_us=s, end_us=e)
    assert num == 10
    num, _ = eng.search("info", k=30, end_us=e)
    assert num == 19
    num, _ = eng.search("info", k=30, start_us=s)
    assert num == 21


def test_f3_sort_by_ts_desc():
    eng = OracleEngine(_time_corpus())
    s = EPOCH_BASE_US + 10 * 1_000_000
    e = EPOCH_BASE_US + 20 * 1_000_000
    num, hits = eng.search("info", k=30, start_us=s, end_us=e, sort_by="ts")
    ts_vals = [h.score for h in hits]
    assert ts_vals == sorted(ts_vals, reverse=True)
    assert len(hits) == 10


def test_f5_field_search_and_bool():
    rows = [
        ("alpha beta", "user", "bash"),
        ("alpha gamma", "assistant", "python"),
        ("beta gamma", "user", None),
    ]
    eng = OracleEngine(fixture_corpus(rows))
    num, _ = eng.search("role:user alpha", k=10)
    assert num == 1
    num, _ = eng.search("alpha OR beta", k=10)
    assert num == 3
    num, _ = eng.search("alpha -beta", k=10)
    assert num == 1
    num, _ = eng.search("tool:bash", k=10)
    assert num == 1
    num, _ = eng.search("*", k=10)
    assert num == 3


def test_bm25_scores_match_hand_formula():
    import math

    docs = fixture_corpus([("cat dog",), ("cat cat fish",), ("bird",)])
    eng = OracleEngine(docs)
    num, hits = eng.search("cat", k=10)
    assert num == 2
    N, df = 3, 2
    avgdl = (2 + 3 + 1) / 3
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))

    def tfn(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    expected = sorted([idf * tfn(1, 2), idf * tfn(2, 3)], reverse=True)
    got = [h.score for h in hits]
    assert got == pytest.approx(expected, abs=1e-9)
