"""Hard-negative mining (pipeline/mining) semantics: positives are
excluded, ranks are contiguous in engine tie order, and the result
equals a brute-force filter of the batch top-k candidates."""

from __future__ import annotations

import pytest

from quickwit_spark.operators.batch_search import batch_bm25_topk
from quickwit_spark.pipeline.mining import mine_hard_negatives

QUERIES = [
    ("m1", "w00010"),
    ("m2", "w00003 w00007"),
    ("m3", "hotterm"),
]


def _qdf(spark):
    return spark.createDataFrame(QUERIES, "query_id string, query string")


def _candidates(spark, index_dir, k):
    """Brute-force mining base: batch top-k with conv_id fetched, in
    engine tie order per query."""
    rows = batch_bm25_topk(
        spark, index_dir, _qdf(spark), k=k, fetch_cols=("conv_id",)
    ).collect()
    by_q: dict[str, list] = {qid: [] for qid, _ in QUERIES}
    for r in rows:
        by_q[r.query_id].append((-r.score, r.split_id, r.docid, r.conv_id))
    for qid in by_q:
        by_q[qid].sort()
    return by_q


def test_mining_excludes_positives_and_matches_bruteforce(spark, index_dir):
    k, n_neg = 12, 5
    cands = _candidates(spark, index_dir, k)
    # label the top-2 distinct conv_ids of every query as positives
    pos_pairs = []
    for qid, lst in cands.items():
        seen = []
        for _, _, _, conv in lst:
            if conv not in seen:
                seen.append(conv)
            if len(seen) == 2:
                break
        pos_pairs += [(qid, c) for c in seen]
    positives = spark.createDataFrame(pos_pairs, "query_id string, conv_id string")

    got = mine_hard_negatives(
        spark, index_dir, _qdf(spark), positives,
        k=k, n_neg=n_neg, doc_key="conv_id",
    ).collect()

    pos_set = set(pos_pairs)
    by_q: dict[str, list] = {qid: [] for qid, _ in QUERIES}
    for r in got:
        assert (r.query_id, r.conv_id) not in pos_set
        by_q[r.query_id].append((r.neg_rank, r.conv_id, r.score))
    for qid, lst in by_q.items():
        lst.sort()
        # ranks contiguous from 1
        assert [t[0] for t in lst] == list(range(1, len(lst) + 1)), (qid, lst)
        # equals brute force: filter positives out of candidates, cut n_neg
        labeled = {c for (q, c) in pos_pairs if q == qid}
        want = [
            (i + 1, conv, round(-negs, 10))
            for i, (negs, _, _, conv) in enumerate(
                [t for t in cands[qid] if t[3] not in labeled][:n_neg]
            )
        ]
        assert [(rk, c) for rk, c, _ in lst] == [(rk, c) for rk, c, _ in want]
        for (_, _, gs), (_, _, ws) in zip(lst, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_mining_empty_positives_is_batch_head(spark, index_dir):
    k, n_neg = 8, 8
    positives = spark.createDataFrame([], "query_id string, conv_id string")
    got = mine_hard_negatives(
        spark, index_dir, _qdf(spark), positives,
        k=k, n_neg=n_neg, doc_key="conv_id",
    ).collect()
    cands = _candidates(spark, index_dir, k)
    by_q: dict[str, list] = {qid: [] for qid, _ in QUERIES}
    for r in got:
        by_q[r.query_id].append((r.neg_rank, r.conv_id))
    for qid, lst in by_q.items():
        lst.sort()
        want = [(i + 1, conv) for i, (_, _, _, conv) in enumerate(cands[qid])]
        assert lst == want[: len(lst)] and len(lst) == min(n_neg, len(want))


def test_mining_depth_validation(spark, index_dir):
    positives = spark.createDataFrame([], "query_id string, conv_id string")
    with pytest.raises(ValueError, match="n_neg"):
        mine_hard_negatives(
            spark, index_dir, _qdf(spark), positives, k=5, n_neg=6,
            doc_key="conv_id",
        )
