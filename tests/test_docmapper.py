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


class TestGenericDocMapping:
    """map_docs over a NON-transcript schema: the mapping-tree analog
    (field_mapping_entry.rs:250-299, mapping_tree.rs:302-345) — typed
    leaves incl. bytes (base64) and nested objects, all three modes."""

    MAPPING = None  # built in _mapping to avoid import at collection

    @staticmethod
    def _mapping():
        from quickwit_spark.sources.docmapper import DocMapping, FieldMapping

        return DocMapping(
            fields=(
                FieldMapping("sku", "text", required=True),
                FieldMapping("qty", "i64"),
                FieldMapping("price", "f64"),
                FieldMapping("active", "bool"),
                FieldMapping("payload", "bytes"),
                FieldMapping("meta", "object", fields=(
                    FieldMapping("vendor", "text"),
                    FieldMapping("rating", "f64"),
                )),
                FieldMapping("labels", "array<text>"),
                FieldMapping("created", "datetime", required=True),
            ),
            ts_field="created",
        )

    @staticmethod
    def _lines(spark, docs):
        import json

        return spark.createDataFrame(
            [(json.dumps(d),) for d in docs], "value string"
        )

    def test_typed_leaves_and_nested_object(self, spark):
        import base64

        from quickwit_spark.sources.docmapper import map_docs, split_valid

        payload = base64.b64encode(b"\x00\x01binary!").decode()
        docs = [{
            "sku": "A-1", "qty": 3, "price": 9.5, "active": True,
            "payload": payload,
            "meta": {"vendor": "acme", "rating": 4.5},
            "labels": ["new", "sale"],
            "created": "2025-06-01T12:00:00Z",
        }]
        mapped = map_docs(self._lines(spark, docs), self._mapping())
        valid, rejected = split_valid(mapped)
        assert rejected.count() == 0
        row = valid.collect()[0]
        assert row.sku == "A-1" and row.qty == 3 and row.price == 9.5
        assert row.active is True
        assert bytes(row.payload) == b"\x00\x01binary!"
        assert row.meta.vendor == "acme" and row.meta.rating == 4.5
        assert row.labels == ["new", "sale"]
        assert row.created.year == 2025 and row.created.month == 6
        # schema is typed, not stringly
        t = dict(valid.dtypes)
        assert t["qty"] == "bigint" and t["price"] == "double"
        assert t["payload"] == "binary" and t["labels"] == "array<string>"
        assert t["meta"].startswith("struct<vendor:string,rating:double")

    def test_modes_and_required(self, spark):
        from quickwit_spark.sources.docmapper import map_docs, split_valid

        docs = [
            {"sku": "A", "created": "2025-01-01 00:00:00"},
            {"qty": 1, "created": "2025-01-01 00:00:00"},      # no sku
            {"sku": "B", "created": "2025-01-01 00:00:00", "rogue": 1},
        ]
        m = self._mapping()
        # lenient: unknown field dropped silently
        valid, rejected = split_valid(map_docs(self._lines(spark, docs), m))
        assert valid.count() == 2
        assert [r._error for r in rejected.collect()] == ["missing_field:sku"]
        # strict: unknown field rejects the doc
        valid_s, rej_s = split_valid(
            map_docs(self._lines(spark, docs), m, mode="strict")
        )
        assert valid_s.count() == 1
        errs = sorted(r._error for r in rej_s.collect())
        assert errs == ["missing_field:sku", "no_such_field:rogue"]
        # dynamic: unknown field captured in _dynamic
        valid_d, _ = split_valid(
            map_docs(self._lines(spark, docs), m, mode="dynamic")
        )
        dyn = {r.sku: r._dynamic for r in valid_d.collect()}
        assert dyn["A"] is None
        assert '"rogue"' in dyn["B"]

    def test_bytes_round_trip(self, spark):
        import base64
        import json

        from quickwit_spark.sources.docmapper import (
            doc_to_json,
            map_docs,
            split_valid,
        )

        payload = base64.b64encode(b"roundtrip-bytes-\xff\x00").decode()
        docs = [{
            "sku": "RT", "qty": 1, "price": 1.0, "active": False,
            "payload": payload, "meta": {"vendor": "v", "rating": 1.0},
            "labels": [], "created": "2025-03-03T03:03:03Z",
        }]
        m = self._mapping()
        valid, _ = split_valid(map_docs(self._lines(spark, docs), m))
        out = json.loads(doc_to_json(valid.drop("_error") if "_error" in valid.columns else valid, m).collect()[0].json)
        assert out["payload"] == payload
        assert out["sku"] == "RT"
        assert out["created"].startswith("2025-03-03T03:03:03")

    def test_transcript_wrapper_unchanged(self, spark):
        """map_json_docs remains the transcript instance of the generic
        mapper (same columns, same coercions)."""
        import json

        from quickwit_spark.sources.docmapper import map_json_docs

        line = json.dumps({
            "conv_id": "c", "turn_idx": 0, "role": "user",
            "text": "hi", "tool": None, "ts": "2025-01-01T00:00:00Z",
        })
        df = map_json_docs(spark.createDataFrame([(line,)], "value string"))
        assert df.columns == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts", "_error"
        ]
        assert dict(df.dtypes)["turn_idx"] == "int"


def test_rfc2822_datetime_parse(spark):
    """rfc2822 inputs (day-name prefix) parse via the strip+format
    fallback (date_time_type.rs Rfc2822 analog)."""
    import json

    from quickwit_spark.sources.docmapper import map_json_docs, split_valid

    lines = [
        json.dumps({"conv_id": "c", "turn_idx": 0, "role": "user",
                    "text": "hi", "tool": None, "ts": ts})
        for ts in ("Tue, 1 Jul 2003 10:52:37 +0200",
                   "Sun, 22 Jun 2025 23:59:59 -0700",
                   "2025-01-01T00:00:00Z")
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    valid, rejected = split_valid(map_json_docs(df))
    assert rejected.count() == 0
    got = sorted(str(r.ts) for r in valid.collect())
    # 10:52:37+02:00 == 08:52:37 UTC (session pinned to UTC)
    assert got[0].startswith("2003-07-01 08:52:37")
    assert got[2].startswith("2025-06-23 06:59:59")


def test_validate_field_mapping_name():
    """Reference-exact name validation incl. error strings
    (default_doc_mapper/mod.rs:39-83, test_validate_field_mapping_name)."""
    import pytest

    from quickwit_spark.sources.docmapper import validate_field_mapping_name

    for ok in ("hello", "a", "B-2", "f.q.n", "under_score", "x" * 255):
        validate_field_mapping_name(ok)
    with pytest.raises(ValueError, match=r"^Field name is empty\.$"):
        validate_field_mapping_name("")
    with pytest.raises(ValueError, match=r"may not start by _"):
        validate_field_mapping_name("_source")
    with pytest.raises(ValueError, match=r"is too long"):
        validate_field_mapping_name("a" * 256)
    with pytest.raises(ValueError, match=r"must start with an uppercase"):
        validate_field_mapping_name("-hello")
    with pytest.raises(ValueError, match=r"contains illegal characters"):
        validate_field_mapping_name("hello@world")


def test_wrong_value_and_cardinality(spark):
    """ValueError / MultiValuesNotSupported / cardinality semantics
    (error.rs:37-53; default_mapper tests: wrong_value, wrong_cardinality,
    i64_from_f64_should_error, i64_too_large, bytes_invalid_base64,
    mutivalued_accepts_scalar, nested_array_forbidden,
    null_is_just_ignored)."""
    from quickwit_spark.sources.docmapper import (
        DocMapping,
        FieldMapping,
        map_docs,
    )

    mapping = DocMapping(
        fields=(
            FieldMapping("txt", "text", required=True),
            FieldMapping("num", "i64"),
            FieldMapping("flt", "f64"),
            FieldMapping("data", "bytes"),
            FieldMapping("dt", "datetime"),
            FieldMapping("tags", "array<i64>"),
        ),
    )
    lines = [
        '{"txt": "ok", "num": 5, "flt": 7, "tags": [1, 2]}',      # valid; f64 from int ok
        '{"txt": "ok", "num": "abc"}',                            # string for i64
        '{"txt": "ok", "num": 5.5}',                              # i64 from f64: error
        '{"txt": "ok", "num": [1, 2]}',                           # array for scalar
        '{"txt": "ok", "num": 99999999999999999999999999}',       # i64 too large
        '{"txt": "ok", "data": "aGVsbG8="}',                      # valid base64
        '{"txt": "ok", "data": "!!notbase64!!"}',                 # invalid base64
        '{"txt": "ok", "dt": "2021-04-13T22:45:41Z"}',            # valid datetime
        '{"txt": "ok", "dt": "not a date"}',                      # bad datetime
        '{"txt": "ok", "tags": 5}',                               # scalar accepted for array
        '{"txt": "ok", "tags": [[1], [2]]}',                      # nested array forbidden
        '{"txt": "ok", "num": null}',                             # null ignored
        '{"num": 1}',                                             # required missing
        '{"txt": null, "num": 1}',                                # explicit null = missing
        '{"txt": "[INFO] bracketed text is fine"}',               # text stays lenient
    ]
    rows = map_docs(
        spark.createDataFrame([(l,) for l in lines], ["value"]), mapping
    ).collect()
    errs = [r["_error"] for r in rows]
    assert errs[0] is None and rows[0]["flt"] == 7.0
    assert errs[1] == "value_error:num"
    assert errs[2] == "value_error:num"
    assert errs[3] == "multi_values_not_supported:num"
    assert errs[4] == "value_error:num"
    assert errs[5] is None and bytes(rows[5]["data"]) == b"hello"
    assert errs[6] == "value_error:data" and rows[6]["data"] is None
    assert errs[7] is None and rows[7]["dt"] is not None
    assert errs[8] == "value_error:dt"
    assert errs[9] is None and rows[9]["tags"] == [5]
    assert errs[10] == "value_error:tags"
    assert errs[11] is None and rows[11]["num"] is None
    assert errs[12] == "missing_field:txt"
    assert errs[13] == "missing_field:txt"
    assert errs[14] is None and rows[14]["txt"].startswith("[INFO]")
    assert rows[0]["tags"] == [1, 2]
