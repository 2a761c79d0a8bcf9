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


class TestRetrievalMetrics:
    def _frames(self, spark):
        from pyspark.sql import types as T

        hits = spark.createDataFrame(
            [
                # q1: gold doc 5 ranked 2nd (score ties broken doc asc)
                (1, 9, 3.0), (1, 5, 2.5), (1, 7, 2.5),
                # q2: gold doc 4 at rank 1
                (2, 4, 9.0), (2, 6, 1.0),
                # q3: gold absent from hits
                (3, 8, 1.0),
            ],
            T.StructType([
                T.StructField("query_id", T.LongType()),
                T.StructField("doc_id", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]),
        )
        gold = spark.createDataFrame(
            [(1, 5), (2, 4), (3, 99), (4, 1)],  # q4 never retrieved
            ["query_id", "doc_id"],
        )
        return hits, gold

    def test_ranks_and_mrr(self, spark):
        from quickwit_spark.pipeline.mining import retrieval_metrics

        hits, gold = self._frames(spark)
        out = {r.query_id: r for r in retrieval_metrics(hits, gold, k=10).collect()}
        assert len(out) == 4
        assert (out[1].gold_rank, out[1].recip_rank) == (2, 0.5)
        assert (out[2].gold_rank, out[2].recip_rank) == (1, 1.0)
        assert (out[3].gold_rank, out[3].recip_rank) == (None, 0.0)
        assert (out[4].gold_rank, out[4].recip_rank) == (None, 0.0)

    def test_k_cut(self, spark):
        from quickwit_spark.pipeline.mining import retrieval_metrics

        hits, gold = self._frames(spark)
        # k=1 drops q1's rank-2 gold out of the window
        out = {r.query_id: r for r in retrieval_metrics(hits, gold, k=1).collect()}
        assert out[1].gold_rank is None and out[2].gold_rank == 1
