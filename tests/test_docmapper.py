"""Doc-mapping tests — the default_mapper/mapping_tree unit-test
analogs (default_mapper.rs:532+, date_time_type.rs tests)."""

from __future__ import annotations

import json

import pytest

from quickwit_spark.sources.docmapper import (
    doc_to_json,
    map_json_docs,
    split_valid,
)

DOCS = [
    # valid rfc3339
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello world",
     "tool": None, "ts": "2025-01-01T00:00:00.000000Z"},
    # valid, space-separated datetime format
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi",
     "tool": "bash", "ts": "2025-01-01 00:00:01"},
    # valid, unix seconds as string
    {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "numeric ts",
     "tool": None, "ts": "1735689602"},
    # unmapped extra field
    {"conv_id": "c2", "turn_idx": 1, "role": "user", "text": "extra field",
     "tool": None, "ts": "2025-01-01T00:00:03Z", "rogue": "x", "rogue2": 7},
    # missing required field
    {"conv_id": "c3", "role": "user", "text": "no turn_idx",
     "ts": "2025-01-01T00:00:04Z"},
]
RAW = [json.dumps(d) for d in DOCS] + ["{not json"]


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame([(r,) for r in RAW], "value string")


def test_lenient_mode(spark, raw_df):
    mapped = map_json_docs(raw_df, mode="lenient")
    valid, rejected = split_valid(mapped)
    v = valid.orderBy("conv_id", "turn_idx").collect()
    # extra-field doc is fine in lenient; missing field + bad json rejected
    assert len(v) == 4
    errs = {r._error for r in rejected.collect()}
    assert errs == {"parse_error", "missing_field:turn_idx"}
    # counters (indexer.rs:52-78 analog)
    counts = {
        r["_error"]: r["count"]
        for r in rejected.groupBy("_error").count().collect()
    }
    assert counts == {"parse_error": 1, "missing_field:turn_idx": 1}


def test_datetime_multiformat(spark, raw_df):
    valid, _ = split_valid(map_json_docs(raw_df))
    rows = {(r.conv_id, r.turn_idx): r.ts for r in valid.collect()}
    base = rows[("c1", 0)]
    assert rows[("c1", 1)].timestamp() == base.timestamp() + 1
    assert rows[("c2", 0)].timestamp() == base.timestamp() + 2


def test_strict_mode_rejects_unmapped(spark, raw_df):
    valid, rejected = split_valid(map_json_docs(raw_df, mode="strict"))
    assert valid.count() == 3
    errs = sorted(r._error for r in rejected.collect())
    assert any(e.startswith("no_such_field:") and "rogue" in e for e in errs)


def test_dynamic_mode_routes_extras(spark, raw_df):
    valid, _ = split_valid(map_json_docs(raw_df, mode="dynamic"))
    rows = {(r.conv_id, r.turn_idx): r for r in valid.collect()}
    dyn = json.loads(rows[("c2", 1)]._dynamic)
    assert set(dyn) == {"rogue", "rogue2"}
    assert rows[("c1", 0)]._dynamic is None


def test_store_source_round_trip(spark, raw_df):
    mapped = map_json_docs(raw_df, store_source=True)
    valid, _ = split_valid(mapped)
    row = valid.where("conv_id = 'c1' and turn_idx = 0").collect()[0]
    assert json.loads(row._source) == DOCS[0]
    # doc_to_json rebuilds user JSON with rfc3339 ts
    back = json.loads(doc_to_json(valid.where("turn_idx = 0")).collect()[0].json)
    assert back["conv_id"] in ("c1", "c2")
    assert "T" in back["ts"]


def test_mapped_docs_are_indexable(spark, raw_df, tmp_path):
    """End-to-end: ndjson → doc mapper → index build → search."""
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.search import Searcher

    valid, _ = split_valid(map_json_docs(raw_df))
    idx = str(tmp_path / "idx")
    build_index(spark, valid.select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
                idx, n_splits=2)
    r = Searcher(spark, idx).search("hello", k=5)
    assert r.num_hits == 1
    assert r.hits[0].text == "hello world"
