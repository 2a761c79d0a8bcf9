"""FIXTURES.md F7: the ~50-query BM25 rank-identity battery over the
F0 corpus — head/torso/tail terms, AND/OR/NOT combos, field-scoped,
phrases with slop, k ∈ {1, 10, 100}; engine must be rank-identical
with score equality to 1e-6 (we assert 1e-9)."""

from __future__ import annotations

import pytest

from tests.conftest import assert_rank_identical

# Zipf rank → df tier over the 50k vocab: w00000-w00004 head,
# w00050-w00400 torso, w01500+ tail
HEAD = ["w00000", "w00001", "w00002", "w00003", "w00004"]
TORSO = ["w00050", "w00120", "w00200", "w00300", "w00400"]
TAIL = ["w01500", "w02500", "w04000", "w06000", "w09000"]

QUERIES = (
    HEAD
    + TORSO
    + TAIL
    + [f"{a} {b}" for a, b in zip(HEAD, TORSO)]            # AND head∧torso
    + [f"{a} OR {b}" for a, b in zip(TORSO, TAIL)]         # OR torso∨tail
    + [f"{a} -{b}" for a, b in zip(HEAD, HEAD[1:])]        # NOT
    + [
        f'"{a} {b}"~{s}'
        for (a, b), s in zip(zip(HEAD, HEAD[1:]), (0, 1, 2, 3))
    ]                                                      # phrases w/ slop
    + [
        "role:user AND w00003",
        "role:tool AND w00001",
        "tool:python AND w00002",
        "tool:grep OR tool:sed",
        "(w00000 OR w00050) AND (w00001 OR w00120)",
        "NOT w00000 AND NOT w00001 AND w00050",
        "hotterm AND w00000",
        "hotterm -w00000",
        'w00120 AND "w00000 w00001"~2',
        "w00050 OR (w00001 AND w00120)",                   # conj member in OR
        "(w00000 AND w00050) OR (w00001 AND w00200)",
        "(hotterm AND w01500) OR w02500",
        "(w00000 AND w00050) OR w00120 -w00004",
        "(w00050 OR (w00001 AND w00120)) AND w00002",      # conj-in-OR ∧ term
        "(w00000 AND w00050) OR (w00001 AND w00200) OR w01500",
        '(w00120 AND w00300) OR "w00000 w00001"~1',        # conj OR phrase
        "((w00000 OR w00004) AND w00001) OR w00050",       # group in conj
        "((w00000 OR w00004) AND (w00001 OR w00120)) OR w01500",
        '((w00050 OR "w00000 w00001") AND w00002) OR w00120',
        'w00000 -"w00001 w00002"',                         # negated phrase
        '(w00000 OR w00004) -"w00001 w00002"~1 -w00050',
        '((w00000 OR w00004) AND w00001) -"w00002 w00003"',
        # arbitrary-depth nesting + negated sub-booleans
        "((w00000 OR (w00002 AND w00003)) AND w00001) OR w00050",
        "((w00050 AND (w00000 OR w00120)) OR w00004) AND w00001",
        "w00000 -(w00001 AND w00002)",
        "w00000 -(w00001 OR w00002)",
        '(w00000 OR w00004) -(w00001 AND "w00002 w00003")',
        # boosts (UserInputAst::Boost): leaf, phrase, group, nested, 0-factor
        "w00050^2",
        "w00050^2 OR w00120",
        "w00000^0.5 AND w00050",
        '"w00000 w00001"~1^3',
        "(w00000 OR w00050)^2 AND w00001",
        "(w00000^2 AND w00050) OR w00120^0",
        "w00000 -w00050^2",
        # field-scoped groups (tantivy ``field:(...)``)
        "role:(user OR tool) AND w00003",
        "tool:(python OR grep) AND w00001",
        "text:(w00050 OR w00120)^2 AND w00001",
    ]
)


@pytest.mark.parametrize("query", QUERIES)
def test_f7_rank_identity(oracle, searcher, query):
    for k in (1, 10, 100):
        assert_rank_identical(
            oracle.search(query, k=k), searcher.search(query, k=k)
        )
