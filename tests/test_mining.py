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


class TestRrfFuse:
    def _sides(self, spark):
        a = spark.createDataFrame(
            [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q2", 7, 1)],
            "query_id string, doc_id long, rank long",
        )
        b = spark.createDataFrame(
            [("q1", 2, 1), ("q1", 4, 2), ("q2", 7, 1)],
            "query_id string, doc_id long, rank long",
        )
        return a, b

    @staticmethod
    def _c(rank, rrf_k=60):
        import math

        from quickwit_spark.pipeline.mining import RRF_SCALE

        return math.floor(RRF_SCALE / (rrf_k + rank))

    def test_exact_integer_fusion(self, spark):
        from quickwit_spark.pipeline.mining import rrf_fuse

        a, b = self._sides(spark)
        out = {
            (r.query_id, r.doc_id): r
            for r in rrf_fuse([a, b], k=10).collect()
        }
        # doc 2 appears on both sides: rank 2 on a, rank 1 on b
        assert out[("q1", 2)].rrf_micro == self._c(2) + self._c(1)
        assert out[("q1", 2)].n_sides == 2
        assert out[("q1", 1)].rrf_micro == self._c(1)
        assert out[("q1", 4)].rrf_micro == self._c(2)
        assert out[("q1", 3)].rrf_micro == self._c(3)
        assert out[("q2", 7)].rrf_micro == 2 * self._c(1)
        # fused order: doc2 (both sides) > doc1 (r1) > doc4 (r2) > doc3
        ranks = {r.doc_id: r.fused_rank for r in out.values() if r.query_id == "q1"}
        assert ranks == {2: 1, 1: 2, 4: 3, 3: 4}

    def test_k_cut_and_tie_order(self, spark):
        from quickwit_spark.pipeline.mining import rrf_fuse

        a, b = self._sides(spark)
        got = rrf_fuse([a, b], k=2).collect()
        assert sorted(
            (r.doc_id for r in got if r.query_id == "q1")
        ) == [1, 2]
        # equal-rank docs on a single side tie-break by doc id asc
        t = spark.createDataFrame(
            [("q", 9, 1), ("q", 3, 1)], "query_id string, doc_id long, rank long"
        )
        rows = {r.doc_id: r.fused_rank for r in rrf_fuse([t], k=5).collect()}
        assert rows == {3: 1, 9: 2}

    def test_empty_sides_rejected(self, spark):
        from quickwit_spark.pipeline.mining import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse([])


class TestHybridRrf:
    @pytest.fixture(scope="class")
    def hybrid_setup(self, spark, tmp_path_factory):
        """Tiny documents-style index + deterministic embeddings."""
        from quickwit_spark.config import FieldConfig, IndexConfig
        from quickwit_spark.operators.build import build_index

        docs = [
            (i, " ".join(
                (["alpha"] * (1 + i % 3))
                + (["beta"] if i % 2 == 0 else ["gamma"])
                + [f"w{i:03d}"]
            ))
            for i in range(24)
        ]
        from pyspark.sql import functions as F

        ddf = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
            "ts",
            F.expr(
                "timestamp'2025-01-01 00:00:00'"
                " + make_interval(0,0,0,0,0,0,doc_id)"
            ),
        )
        cfg = IndexConfig(
            fields=(FieldConfig("text", tokenizer="default", record="position"),),
            default_search_field="text",
            doc_key_fields=("doc_id",),
            routing_field="doc_id",
            tag_fields=(),
        )
        d = str(tmp_path_factory.mktemp("hybrid") / "idx")
        build_index(spark, ddf, d, cfg, n_splits=2)
        # embeddings: doc i points mostly at axis (i % 4) — queries along
        # an axis rank docs of that residue class first, ties by id
        vecs = [
            (i, [1.0 if j == i % 4 else 0.1 * (j + 1) for j in range(4)])
            for i in range(24)
        ]
        corpus_vecs = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        qrows = [("h1", [1.0, 0.0, 0.0, 0.0]), ("h2", [0.0, 1.0, 0.0, 0.0])]
        query_vecs = spark.createDataFrame(qrows, "query_id string, embedding array<double>")
        queries = spark.createDataFrame(
            [("h1", "alpha beta"), ("h2", "alpha gamma")],
            "query_id string, query string",
        )
        return d, queries, corpus_vecs, query_vecs

    def test_matches_side_recomputation(self, spark, hybrid_setup):
        import math

        from pyspark.sql import functions as F

        from quickwit_spark.operators.batch_search import batch_bm25_topk
        from quickwit_spark.pipeline.mining import (
            RRF_SCALE,
            hybrid_bm25_cosine_topk,
        )
        from quickwit_spark.pipeline.similarity import cosine_topk

        d, queries, corpus_vecs, query_vecs = hybrid_setup
        depth, k, rrf_k = 8, 6, 60
        out = hybrid_bm25_cosine_topk(
            spark, d, queries, corpus_vecs, query_vecs,
            k=k, depth=depth, rrf_k=rrf_k,
        ).collect()

        # recompute both sides independently
        hits = batch_bm25_topk(
            spark, d, queries, k=depth, fetch_cols=("doc_id",)
        ).collect()
        lex: dict[str, dict[int, int]] = {}
        for qid in ("h1", "h2"):
            rows = sorted(
                ((-round(r.score, 4), r.doc_id) for r in hits if r.query_id == qid)
            )[:depth]
            lex[qid] = {doc: i + 1 for i, (_, doc) in enumerate(rows)}
        sem_rows = cosine_topk(
            corpus_vecs,
            query_vecs.select(F.col("query_id").alias("vec_id"), "embedding"),
            k=depth, exclude_self=False,
        ).collect()
        sem = {("h1",): {}, ("h2",): {}}
        sem = {"h1": {}, "h2": {}}
        for r in sem_rows:
            sem[r.query_id][r.neighbor_id] = r.rank

        expect: dict[tuple, int] = {}
        for qid in ("h1", "h2"):
            for doc in set(lex[qid]) | set(sem[qid]):
                m = 0
                if doc in lex[qid]:
                    m += math.floor(RRF_SCALE / (rrf_k + lex[qid][doc]))
                if doc in sem[qid]:
                    m += math.floor(RRF_SCALE / (rrf_k + sem[qid][doc]))
                expect[(qid, doc)] = m

        assert len(out) == 2 * k
        for r in out:
            key = (r.query_id, r.doc_id)
            assert expect[key] == r.rrf_micro
            assert r.lex_rank == lex[r.query_id].get(r.doc_id)
            assert r.sem_rank == sem[r.query_id].get(r.doc_id)
            assert r.n_sides == (r.lex_rank is not None) + (r.sem_rank is not None)
        # and the cut keeps exactly the top-k of the expected fusion
        for qid in ("h1", "h2"):
            full = sorted(
                ((qq, dd) for (qq, dd) in expect if qq == qid),
                key=lambda t: (-expect[t], t[1]),
            )[:k]
            got = {
                (r.query_id, r.doc_id) for r in out if r.query_id == qid
            }
            assert got == set(full)


class TestRrfFuseProperty:
    """Hypothesis property: for ANY set of ranked lists, rrf_fuse's
    integer fusion equals a pure-Python replay — sums, side counts,
    tie order, and the k cut."""

    from hypothesis import given, settings, strategies as st

    side = st.lists(
        st.tuples(
            st.sampled_from(["q0", "q1", "q2"]),
            st.integers(min_value=0, max_value=12),   # doc id
        ),
        min_size=0,
        max_size=20,
        unique=True,  # one rank row per (query, doc) within a side
    )

    @given(sides=st.lists(side, min_size=1, max_size=4),
           k=st.integers(min_value=1, max_value=6),
           rrf_k=st.sampled_from([1, 60]))
    @settings(max_examples=12, deadline=None)
    def test_matches_python_replay(self, spark, sides, k, rrf_k):
        import math

        from quickwit_spark.pipeline.mining import RRF_SCALE, rrf_fuse

        # assign ranks: within each side, per query, rank by doc asc
        # (any deterministic 1-based ranking works for the property)
        frames, replay = [], {}
        for s in sides:
            ranked = {}
            by_q = {}
            for q, d in sorted(s):
                by_q.setdefault(q, []).append(d)
            for q, docs in by_q.items():
                for i, d in enumerate(docs, start=1):
                    ranked[(q, d)] = i
                    c = math.floor(RRF_SCALE / (rrf_k + i))
                    tot, n = replay.get((q, d), (0, 0))
                    replay[(q, d)] = (tot + c, n + 1)
            rows = [(q, d, r) for (q, d), r in ranked.items()]
            frames.append(
                spark.createDataFrame(
                    rows or [("qx", -1, 1)],
                    "query_id string, doc_id long, rank long",
                )
            )
            if not rows:
                # placeholder row participates too; mirror it
                c = math.floor(RRF_SCALE / (rrf_k + 1))
                tot, n = replay.get(("qx", -1), (0, 0))
                replay[("qx", -1)] = (tot + c, n + 1)

        out = rrf_fuse(frames, k=k, rrf_k=rrf_k).collect()
        got = {(r.query_id, r.doc_id): r for r in out}
        # expected: per query, top-k of (micro desc, doc asc)
        by_query = {}
        for (q, d), (tot, n) in replay.items():
            by_query.setdefault(q, []).append((d, tot, n))
        expect = {}
        for q, items in by_query.items():
            items.sort(key=lambda t: (-t[1], t[0]))
            for rank, (d, tot, n) in enumerate(items[:k], start=1):
                expect[(q, d)] = (rank, tot, n)
        assert set(got) == set(expect)
        for key, (rank, tot, n) in expect.items():
            r = got[key]
            assert (r.fused_rank, r.rrf_micro, r.n_sides) == (rank, tot, n)
