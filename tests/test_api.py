"""Index API facade tests — CLI/REST surface parity (SURVEY.md §2.11)."""

from __future__ import annotations

import pytest

from quickwit_spark.api import Index
from quickwit_spark.config import IndexConfig


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("api") / "idx")
    idx = Index.create(
        spark, d,
        IndexConfig(
            hot_term_doc_freq=200, salt_docid_range=64,
            merge_factor=2, max_merge_factor=4, min_level_num_docs=10,
        ),
    )
    idx.ingest(spark.createDataFrame(corpus), n_splits=4)
    return idx


def test_create_refuses_overwrite(spark, index):
    with pytest.raises(ValueError):
        Index.create(spark, index.index_dir)


def test_describe(index, corpus):
    d = index.describe()
    assert d["num_docs"] == len(corpus)
    assert d["num_published_splits"] == 4
    assert d["size_in_bytes"] > 0
    assert d["fields"] == ["text", "role", "tool"]


def test_search_json_shape(index):
    r = index.search_json("w00001", k=3)
    assert r["num_hits"] > 0
    assert len(r["hits"]) == 3
    h = r["hits"][0]
    assert set(h) == {"score", "document", "split_id", "doc_id"}
    assert "text" in h["document"]
    assert r["elapsed_time_micros"] > 0


def test_search_stream_export(index, oracle, tmp_path):
    df = index.search_stream("w00002", "doc_len")
    rows = df.collect()
    n_o, _ = oracle.search("w00002", k=1)
    assert len(rows) == n_o
    # values are real doc lens
    assert all(r.value > 0 for r in rows)
    out = str(tmp_path / "export")
    df.write.csv(out)  # the CSV output format of the reference


def test_ingest_resume_noop(index, corpus, spark):
    """Re-ingesting the same source is a checkpointed no-op."""
    before = index.describe()
    index.ingest(spark.createDataFrame(corpus), n_splits=4)
    after = index.describe()
    assert after["num_docs"] == before["num_docs"]
    assert after["num_published_splits"] == before["num_published_splits"]


def test_merge_and_gc_and_lineage(index, corpus):
    assert index.merge() >= 1
    assert index.describe()["num_published_splits"] == 1
    assert index.describe()["num_docs"] == len(corpus)
    doomed = index.gc()
    assert len(doomed) >= 4
    lin = index.lineage().toPandas()
    assert set(lin["op"]) >= {"build", "merge"}
    assert (lin["num_docs"] > 0).all()
    # per-split lineage carries bytes + wall time (north rule)
    assert (lin["size_in_bytes"] > 0).all()
    assert (lin["wall_time_sec"] >= 0).all()
