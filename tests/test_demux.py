"""Demux tests — merge_executor.rs:349-500 invariants: doc
conservation, per-tenant grouping, tenant-query split pruning."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quickwit_spark.config import IndexConfig
from quickwit_spark.operators.demux import next_fit_pack


@given(
    st.dictionaries(
        st.text(st.characters(categories=("Ll",)), min_size=1, max_size=6),
        st.integers(1, 10_000),
        max_size=40,
    ),
    st.integers(1, 8),
)
@settings(max_examples=200, deadline=None)
def test_next_fit_invariants(counts, factor):
    bins = next_fit_pack(list(counts.items()), factor)
    assert set(bins) == set(counts)           # every tenant assigned
    assert all(0 <= b < factor for b in bins.values())
    # deterministic
    assert bins == next_fit_pack(list(counts.items()), factor)
    # bin ids are contiguous from 0
    used = sorted(set(bins.values()))
    assert used == list(range(len(used)))


@pytest.fixture(scope="module")
def demuxed(spark, corpus, tmp_path_factory):
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.demux import demux_splits
    from quickwit_spark.plans.catalog import Catalog

    cfg = IndexConfig(hot_term_doc_freq=200, salt_docid_range=64)
    d = str(tmp_path_factory.mktemp("demux") / "idx")
    build_index(spark, spark.createDataFrame(corpus), d, cfg, n_splits=4)
    cat = Catalog.load(d)
    ids = [s.split_id for s in cat.published_splits()]
    new = demux_splits(spark, cat, ids, demux_field="tool", demux_factor=4)
    return d, new


def test_doc_conservation_and_tags(demuxed, corpus):
    from quickwit_spark.plans.catalog import Catalog

    d, new = demuxed
    cat = Catalog.load(d)
    pub = cat.published_splits()
    assert {s.split_id for s in pub} == {s.split_id for s in new}
    assert cat.total_docs() == len(corpus)
    assert all(s.num_merge_ops == 1 for s in pub)
    # each tool value lives in exactly ONE split's tags
    seen: dict[str, list[str]] = {}
    for s in pub:
        for v in s.tags["tool"] or []:
            seen.setdefault(v, []).append(s.split_id)
    assert all(len(splits) == 1 for splits in seen.values())
    # presence info must survive demux (a missing key reads as True
    # and would permanently disable must_not pruning on these splits)
    assert all("tool" in (s.tag_has_null or {}) for s in pub)
    # the null-tool tenant lands in one bin; the others must say False
    assert sum(not s.tag_has_null["tool"] for s in pub) >= 1


def test_search_results_survive_demux(spark, demuxed, oracle):
    from quickwit_spark.operators.search import Searcher

    d, _ = demuxed
    se = Searcher(spark, d)
    for q in ["w00001", "hotterm", "tool:bash AND w00002", '"w00001 w00002"~2']:
        n_o, hits_o = oracle.search(q, k=2000)
        r = se.search(q, k=2000)
        assert r.num_hits == n_o
        want = sorted((h.conv_id, h.turn_idx, round(h.score, 9)) for h in hits_o)
        got = sorted((h.conv_id, h.turn_idx, round(h.score, 9)) for h in r.hits)
        assert got == want


def test_tenant_queries_prune_to_one_split(spark, demuxed, config):
    from quickwit_spark.plans.catalog import Catalog
    from quickwit_spark.plans.pruning import prune_splits
    from quickwit_spark.plans.query import parse_query

    d, _ = demuxed
    cat = Catalog.load(d)
    pub = cat.published_splits()
    ast = parse_query("tool:bash AND w00001", cat.config)
    pruned = prune_splits(pub, ast, cat.config)
    assert len(pruned) == 1  # tenant isolation achieved
    assert "bash" in pruned[0].tags["tool"]


def test_demuxed_splits_not_demuxable_again(spark, demuxed):
    from quickwit_spark.operators.demux import demux_splits
    from quickwit_spark.plans.catalog import Catalog

    d, new = demuxed
    cat = Catalog.load(d)
    with pytest.raises(ValueError):
        demux_splits(spark, cat, [new[0].split_id], demux_field="tool")


def test_demux_enabled_runs_from_planner_loop(spark, corpus, tmp_path):
    """With demux_enabled, run_merge_pipeline demuxes mature un-demuxed
    splits into per-tenant splits (the reference's demux gate); doc
    conservation + tenant-narrowed tags + search results preserved."""
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.merge import run_merge_pipeline
    from quickwit_spark.operators.search import Searcher
    from quickwit_spark.oracle import OracleEngine
    from quickwit_spark.plans.catalog import Catalog

    cfg = IndexConfig(
        hot_term_doc_freq=200, salt_docid_range=64,
        split_num_docs_target=100,  # built splits are mature
        demux_enabled=True, demux_factor=3, demux_field="tool",
    )
    d = str(tmp_path / "demuxauto")
    build_index(spark, spark.createDataFrame(corpus), d, cfg, n_splits=4)
    n = run_merge_pipeline(spark, d)
    assert n >= 1
    cat = Catalog.load(d)
    pub = cat.published_splits()
    assert len(pub) == 3                      # demux_factor bins
    assert all(s.split_id.startswith("demux-") for s in pub)
    assert cat.total_docs() == len(corpus)
    # tenant isolation: each output covers a narrow tool-value set
    sizes = [len(s.tags["tool"] or []) for s in pub]
    all_tools = len({t for s in pub for t in (s.tags["tool"] or [])})
    assert max(sizes) < all_tools
    # results invariant under the re-layout (tie-aware comparison)
    oracle = OracleEngine(corpus, cfg, n_splits=4)
    se = Searcher(spark, d)
    for q in ["w00001", "hotterm", "tool:git AND w00002"]:
        n_o, hits_o = oracle.search(q, k=15)
        r = se.search(q, k=15)
        assert r.num_hits == n_o
        assert sorted(
            (h.conv_id, h.turn_idx, round(h.score, 9)) for h in r.hits
        ) == sorted(
            (h.conv_id, h.turn_idx, round(h.score, 9)) for h in hits_o
        )
    # idempotent: a second pipeline run finds nothing to do
    assert run_merge_pipeline(spark, d) == 0
