"""Order-preserving sloppy phrase matching, shared verbatim by the
pytest oracle and the Spark query kernel so their semantics agree by
construction.

Semantics (pinned by the reference's slop corpus,
quickwit-search/src/tests.rs:111-143 and
docs/reference/query-language.md): tokens must appear in order; a match
exists at anchor position p1 iff there are positions
p1 < p2 < ... < pn with total gap (pn - p1 - (n-1)) <= slop.
The phrase frequency (used as BM25 tf) is the number of anchor
positions with a valid greedy-minimal chain.
"""

from __future__ import annotations

import numpy as np


def phrase_freq(position_lists: list[np.ndarray], slop: int) -> int:
    """Number of in-order matches of the phrase whose i-th token occurs at
    ``position_lists[i]`` (each sorted ascending) within ``slop``."""
    first = position_lists[0]
    if any(len(p) == 0 for p in position_lists):
        return 0
    count = 0
    for p1 in first:
        prev = p1
        ok = True
        for plist in position_lists[1:]:
            j = np.searchsorted(plist, prev + 1)
            if j == len(plist):
                ok = False
                break
            prev = plist[j]
        if ok and (prev - p1 - (len(position_lists) - 1)) <= slop:
            count += 1
    return count


def phrase_freq_many(
    docs_positions: list[list[np.ndarray]], slop: int
) -> np.ndarray:
    """Vectorized-over-docs wrapper: list (per doc) of per-token position
    arrays -> per-doc phrase frequency."""
    return np.fromiter(
        (phrase_freq(pls, slop) for pls in docs_positions),
        dtype=np.int64,
        count=len(docs_positions),
    )
