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


_SEG = np.int64(1) << np.int64(32)  # doc segment stride for key packing


def phrase_freq_bulk(
    token_positions: list[tuple[np.ndarray, np.ndarray]], slop: int
) -> np.ndarray:
    """Fully vectorized phrase frequency across MANY docs at once —
    the query-kernel hot path (a per-candidate Python loop is quadratic
    pain on high-df phrases).

    ``token_positions[t] = (counts, positions)``: for token t, the
    per-candidate-doc position counts (len = n_docs, same doc order for
    every token, every count ≥ 1) and the concatenated positions.

    Implements the same greedy chain as :func:`phrase_freq` by packing
    (doc_ord, position) into one int64 key ``doc_ord * 2^32 + pos`` and
    running ONE ``searchsorted`` per phrase token over all anchors of
    all docs simultaneously.
    """
    n_docs = token_positions[0][0].size
    if n_docs == 0:
        return np.empty(0, dtype=np.int64)
    keys = []
    doc_ords = []
    for counts, pos in token_positions:
        ords = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        keys.append(ords * _SEG + pos.astype(np.int64))
        doc_ords.append(ords)
    anchors = keys[0]          # sorted: doc-major, position-minor
    anchor_ord = doc_ords[0]
    prev = anchors
    alive = np.ones(anchors.size, dtype=bool)
    for t in range(1, len(keys)):
        j = np.searchsorted(keys[t], prev + 1)
        ok = j < keys[t].size
        cand = np.where(ok, np.minimum(j, keys[t].size - 1), 0)
        nxt = keys[t][cand]
        ok &= (nxt >> np.int64(32)) == anchor_ord  # same doc
        alive &= ok
        prev = np.where(alive, nxt, prev)
    n_gap = len(keys) - 1
    within = (prev - anchors - n_gap) <= slop  # same doc ⇒ plain diff
    good = alive & within
    out = np.zeros(n_docs, dtype=np.int64)
    np.add.at(out, anchor_ord[good], 1)
    return out
