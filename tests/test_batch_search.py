"""Batch BM25 retrieval (operators/batch_search) vs the sequential
engine: the batch join plan must reproduce the per-query Searcher's
hits — same (split, docid) ranking, same scores (float-sum association
tolerance) — for conjunctions, disjunctions, and edge shapes."""

from __future__ import annotations

import pytest

from quickwit_spark.operators.batch_search import batch_bm25_topk

K = 10

CONJ_QUERIES = [
    ("q_single", "w00010"),
    ("q_hot", "hotterm"),
    ("q_conj2", "w00003 w00007"),
    ("q_conj3", "w00001 w00002 w00004"),
    ("q_dup_term", "w00005 w00005"),  # repeated term = repeated clause (2x score)
]

DISJ_QUERIES = [
    ("d1", "w00010 w00020"),
    ("d2", "hotterm w00420"),
]


def _batch_results(spark, index_dir, queries, **kw):
    qdf = spark.createDataFrame(queries, "query_id string, query string")
    rows = batch_bm25_topk(spark, index_dir, qdf, k=K, **kw).collect()
    out: dict[str, list] = {qid: [] for qid, _ in queries}
    for r in rows:
        out[r.query_id].append((r.score, r.split_id, r.docid))
    for qid in out:
        out[qid].sort(key=lambda t: (-t[0], t[1], t[2]))
    return out


def _assert_matches_searcher(got, searcher, queries):
    for qid, qtext in queries:
        ref = [(h.score, h.split_id, h.docid) for h in
               searcher.search(qtext, k=K).hits]
        g = got[qid]
        assert len(g) == len(ref), (qid, len(g), len(ref))
        for (gs, gsp, gd), (rs, rsp, rd) in zip(g, ref):
            assert (gsp, gd) == (rsp, rd), (qid, (gsp, gd), (rsp, rd))
            assert gs == pytest.approx(rs, abs=1e-9), (qid, gs, rs)


def test_batch_conjunction_matches_searcher(spark, index_dir, searcher):
    got = _batch_results(spark, index_dir, CONJ_QUERIES)
    _assert_matches_searcher(got, searcher, CONJ_QUERIES)


def test_batch_disjunction_matches_searcher(spark, index_dir, searcher):
    got = _batch_results(spark, index_dir, DISJ_QUERIES, mode="any")
    ref_queries = [(qid, " OR ".join(q.split())) for qid, q in DISJ_QUERIES]
    _assert_matches_searcher(got, searcher, ref_queries)


def test_batch_no_pushdown_path_identical(spark, index_dir):
    """pushdown_max_terms=0 (broadcast-join only, no isin literal) must
    produce the same hits as the pushdown path."""
    a = _batch_results(spark, index_dir, CONJ_QUERIES)
    b = _batch_results(spark, index_dir, CONJ_QUERIES, pushdown_max_terms=0)
    assert a == b


def test_batch_unknown_and_empty_queries(spark, index_dir):
    queries = [
        ("q_absent", "zzznotaterm"),          # term not in corpus
        ("q_half_absent", "w00001 zzznot"),   # conjunction with absent term
        ("q_empty", "~~~"),                   # tokenizes to nothing
        ("q_ok", "w00001"),
    ]
    got = _batch_results(spark, index_dir, queries)
    assert got["q_absent"] == []
    assert got["q_half_absent"] == []
    assert got["q_empty"] == []
    assert len(got["q_ok"]) == K


def test_batch_fetch_cols(spark, index_dir, searcher, corpus):
    qdf = spark.createDataFrame([("q", "w00010")], "query_id string, query string")
    rows = batch_bm25_topk(
        spark, index_dir, qdf, k=3, fetch_cols=("conv_id", "turn_idx")
    ).collect()
    assert len(rows) == 3
    ref = searcher.search("w00010", k=3)
    ref_docs = {(h.split_id, h.docid): h.doc for h in ref.hits}
    for r in rows:
        doc = ref_docs[(r.split_id, r.docid)]
        assert r.conv_id == doc["conv_id"]
        assert r.turn_idx == doc["turn_idx"]


def test_batch_posting_scan_is_pruned_and_pushed(spark, index_dir):
    """The executed plan must push the term isin + field filters into
    the posting FileScan (term-sorted row-group pruning at scale) and
    column-prune the doc-length scan to (docid, doc_len)."""
    qdf = spark.createDataFrame([("q", "w00010 w00003")],
                                "query_id string, query string")
    plan = batch_bm25_topk(spark, index_dir, qdf, k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    posting_scans = [s for s in scans if "doc_ids" in s]
    assert posting_scans, plan
    assert any("term#" in s and " IN (w00010,w00003)" in s
               for s in posting_scans), posting_scans
    dl_scans = [s for s in scans if "doc_len" in s and "doc_ids" not in s]
    assert dl_scans and all("text" not in s for s in dl_scans), dl_scans


def test_batch_mode_validation(spark, index_dir):
    qdf = spark.createDataFrame([("q", "w1")], "query_id string, query string")
    with pytest.raises(ValueError, match="mode"):
        batch_bm25_topk(spark, index_dir, qdf, mode="most")
