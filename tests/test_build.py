"""Build-path unit + resume tests (indexer/packager/publisher analogs;
failpoint-style resume per quickwit-indexing/failpoints/mod.rs:54-215)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.functions.codec import (
    decode_varint,
    delta_decode,
    encode_varint,
    grouped_delta_encode,
    varint_sizes,
)
from quickwit_spark.functions.tokenize import tokenize_default
from quickwit_spark.operators.build import build_split_tables
from quickwit_spark.sources.transcripts import generate_transcripts


def test_varint_sizes_match_encoding():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**40, size=1000, dtype=np.uint64)
    blob = encode_varint(vals)
    assert varint_sizes(vals).sum() == len(blob)


def test_grouped_delta_encode_slices():
    vals = np.array([5, 9, 14, 3, 3, 10, 100], dtype=np.uint64)
    starts = np.array([0, 3, 5])
    blobs = grouped_delta_encode(vals, starts, delta=True)
    assert len(blobs) == 3
    np.testing.assert_array_equal(delta_decode(blobs[0]), [5, 9, 14])
    np.testing.assert_array_equal(delta_decode(blobs[1]), [3, 3])
    np.testing.assert_array_equal(delta_decode(blobs[2]), [10, 100])


def test_grouped_encode_no_delta():
    vals = np.array([1, 2, 300, 4], dtype=np.uint64)
    blobs = grouped_delta_encode(vals, np.array([0, 2]), delta=False)
    np.testing.assert_array_equal(decode_varint(blobs[0]), [1, 2])
    np.testing.assert_array_equal(decode_varint(blobs[1]), [300, 4])


class TestBuildSplitTables:
    @pytest.fixture(scope="class")
    def built(self):
        pdf = generate_transcripts(500, seed=3, hot_term_frac=0.5)
        cfg = IndexConfig(hot_term_doc_freq=50, salt_docid_range=32)
        return pdf, cfg, build_split_tables(pdf, cfg)

    def test_doc_conservation(self, built):
        pdf, cfg, (postings, docs, meta) = built
        assert len(docs) == len(pdf) == meta["num_docs"]
        # docids are a stable (conv_id, turn_idx) ordering
        assert docs["docid"].tolist() == list(range(len(pdf)))
        sorted_keys = docs[["conv_id", "turn_idx"]].values.tolist()
        assert sorted_keys == sorted(sorted_keys)

    def test_posting_doc_freq_conserved(self, built):
        pdf, cfg, (postings, docs, meta) = built
        # sum of df over text rows == number of distinct (term, doc) pairs
        text_rows = postings[postings["field"] == "text"]
        n_pairs = sum(
            len(set(tokenize_default(t))) for t in pdf["text"]
        )
        assert int(text_rows["df"].sum()) == n_pairs

    def test_hot_term_is_sharded(self, built):
        pdf, cfg, (postings, docs, meta) = built
        hot = postings[
            (postings["field"] == "text") & (postings["term"] == "hotterm")
        ]
        assert len(hot) > 1  # sharded
        assert hot["shard"].tolist() == list(range(len(hot)))
        assert (hot["df"] <= cfg.salt_docid_range).all()
        # shards concatenate to a strictly increasing docid list
        all_ids = np.concatenate(
            [delta_decode(b) for b in hot.sort_values("shard")["doc_ids"]]
        )
        assert (np.diff(all_ids.astype(np.int64)) > 0).all()

    def test_block_max_stats(self, built):
        pdf, cfg, (postings, docs, meta) = built
        dl = docs["doc_len"].to_numpy()
        for row in postings[postings["field"] == "text"].head(50).itertuples():
            ids = delta_decode(row.doc_ids).astype(np.int64)
            tfs = decode_varint(row.tfs).astype(np.int64)
            assert tfs.max() == row.max_tf
            assert dl[ids].min() == row.min_dl

    def test_meta_ranges(self, built):
        pdf, cfg, (postings, docs, meta) = built
        terms = postings[postings["field"] == "text"]["term"]
        assert meta["term_range"] == (terms.min(), terms.max())
        lo, hi = meta["time_range"]
        assert lo <= hi
        assert meta["tags"]["tool"] is not None  # ≤ 20 tools


def test_arrow_and_pandas_split_builders_agree():
    """The applyInArrow kernel body must produce byte-identical posting
    blobs and equal doc stores to the pandas reference builder."""
    import pyarrow as pa

    from quickwit_spark.operators.build import build_split_tables_arrow

    pdf = generate_transcripts(800, seed=5, hot_term_frac=0.4)
    cfg = IndexConfig(hot_term_doc_freq=50, salt_docid_range=32)
    p_post, p_docs, p_meta = build_split_tables(pdf, cfg)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False).set_column(
        pdf.columns.get_loc("ts"),
        "ts",
        pa.Table.from_pandas(pdf[["ts"]]).column("ts").cast(pa.timestamp("us")),
    )
    a_post, a_docs, a_meta = build_split_tables_arrow(tbl, cfg)
    assert p_meta == a_meta
    assert len(p_post) == len(a_post)
    for col in ("field", "term", "shard", "df", "max_tf", "min_dl",
                "first_docid", "last_docid"):
        assert p_post[col].tolist() == a_post[col].tolist(), col
    for col in ("doc_ids", "tfs", "positions"):
        assert p_post[col].tolist() == a_post[col].tolist(), col
    ad = a_docs.to_pandas()
    for col in ("docid", "conv_id", "turn_idx", "text", "ts_us", "doc_len"):
        assert p_docs[col].tolist() == ad[col].tolist(), col


def test_resume_after_partial_publish(spark, corpus, config, tmp_path):
    """Kill between split publishes → re-run → no loss, no duplication
    (publisher.rs:140-148 atomic publish; checkpoint.rs resume)."""
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.catalog import Catalog

    import quickwit_spark.operators.build as build_mod

    idx = str(tmp_path / "idx")
    sdf = spark.createDataFrame(corpus)

    monkey_chunk = build_mod.PUBLISH_CHUNK
    build_mod.PUBLISH_CHUNK = 1  # per-split publishes for this test
    real_publish = Catalog.stage_and_publish
    calls = {"n": 0}

    def failing_publish(self, *a, **kw):
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash mid-publish")
        calls["n"] += 1
        return real_publish(self, *a, **kw)

    Catalog.stage_and_publish = failing_publish
    try:
        with pytest.raises(RuntimeError):
            build_index(spark, sdf, idx, config, n_splits=4)
    finally:
        Catalog.stage_and_publish = real_publish
        build_mod.PUBLISH_CHUNK = monkey_chunk

    cat = Catalog.load(idx)
    assert len(cat.published_splits()) == 2  # partial progress persisted

    # resume: must rebuild ONLY the missing partitions
    cat2 = build_index(spark, sdf, idx, config, n_splits=4)
    assert len(cat2.published_splits()) == 4
    assert cat2.total_docs() == len(corpus)
    # all four checkpoint positions recorded exactly once, plus the
    # ingest-completion marker (all namespaced under this ingest)
    assert sorted(cat2.checkpoint) == [
        "batch/b0000",
        "batch/b0000/0", "batch/b0000/1", "batch/b0000/2", "batch/b0000/3",
    ]
    assert cat2.checkpoint["batch/b0000"] == "complete"


def test_crc32_routing_matches_spark(spark):
    """The oracle's zlib.crc32 routing must equal Spark's crc32 —
    otherwise oracle and engine disagree on split membership."""
    import zlib

    from pyspark.sql import functions as F

    ids = [f"conv-{i:08d}" for i in range(50)] + ["üñíçødé", ""]
    df = spark.createDataFrame([(i,) for i in ids], "conv_id string")
    got = {
        r["conv_id"]: r["h"]
        for r in df.select(
            "conv_id",
            F.pmod(F.crc32(F.encode(F.col("conv_id"), "utf-8")), F.lit(8)).alias("h"),
        ).collect()
    }
    for cid in ids:
        assert got[cid] == zlib.crc32(cid.encode("utf-8")) % 8


def test_legacy_checkpoint_resume_no_duplication(spark, corpus, config, tmp_path):
    """An index whose checkpoint predates per-ingest namespacing (bare
    '<partition>': 'done' keys) must resume as a no-op, NOT rebuild and
    double-publish every document."""
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.catalog import Catalog

    idx = str(tmp_path / "legacy")
    sdf = spark.createDataFrame(corpus)
    build_index(spark, sdf, idx, config, n_splits=4)
    # rewrite the checkpoint into the PRE-upgrade format
    cat = Catalog.load(idx)
    cat.checkpoint = {
        k.rsplit("/", 1)[1]: v
        for k, v in cat.checkpoint.items()
        if k.count("/") == 2
    }
    cat._commit()

    cat2 = build_index(spark, sdf, idx, config, n_splits=4)  # resume
    assert cat2.total_docs() == len(corpus)          # no duplication
    assert len(cat2.published_splits()) == 4
    assert cat2.checkpoint.get("batch/b0000") == "complete"
    assert sorted(k for k in cat2.checkpoint if k.count("/") == 2) == [
        f"batch/b0000/{i}" for i in range(4)
    ]


def test_legacy_checkpoint_resume_path_source(spark, corpus, config, tmp_path):
    """Path-source variant: a pre-upgrade index built from a parquet
    PATH must also resume as a no-op on re-run with the same path —
    the path-derived namespace must not shadow the migrated b0000
    namespace and rebuild everything."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.catalog import Catalog

    src = str(tmp_path / "src.parquet")
    pq.write_table(
        pa.Table.from_pandas(corpus, preserve_index=False), src,
        coerce_timestamps="us",
    )
    idx = str(tmp_path / "legacy_path")
    build_index(spark, src, idx, config, n_splits=4)
    # rewrite the checkpoint into the PRE-upgrade format (bare digits)
    cat = Catalog.load(idx)
    cat.checkpoint = {
        k.rsplit("/", 1)[1]: v
        for k, v in cat.checkpoint.items()
        if k.count("/") == 2
    }
    cat._commit()

    cat2 = build_index(spark, src, idx, config, n_splits=4)  # resume
    assert cat2.total_docs() == len(corpus)          # no duplication
    assert len(cat2.published_splits()) == 4
    assert cat2.checkpoint.get("batch/b0000") == "complete"

    # and a THIRD run (now with the completion marker present) must
    # stay a no-op rather than fall back to the empty path namespace
    cat3 = build_index(spark, src, idx, config, n_splits=4)
    assert cat3.total_docs() == len(corpus)
    assert len(cat3.published_splits()) == 4
