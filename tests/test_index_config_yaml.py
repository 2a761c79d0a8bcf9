"""Reference index-config YAML support: the schema documented in
docs/configuration/index-config.md (shipped examples in
quickwit-config/resources/tests/index_config/*.yaml) loads into this
engine's IndexConfig + DocMapping + source configs, and drives a full
create -> ndjson ingest -> search -> tag-filter e2e."""

from __future__ import annotations

import json

import pytest

# shaped after quickwit-config/resources/tests/index_config/hdfs-logs.yaml
HDFS_LIKE_YAML = """
version: 0
index_id: hdfs-logs
index_uri: s3://quickwit-indexes/hdfs-logs

doc_mapping:
  field_mappings:
    - name: tenant_id
      type: u64
      fast: true
    - name: timestamp
      type: datetime
      fast: true
    - name: severity_text
      type: text
      tokenizer: raw
    - name: body
      type: text
      tokenizer: default
      record: position
    - name: resource
      type: object
      field_mappings:
        - name: service
          type: text
          tokenizer: raw
  tag_fields: [severity_text]
  store_source: false

indexing_settings:
  demux_field: tenant_id
  timestamp_field: timestamp
  sort_field: timestamp
  split_num_docs_target: 10000001
  merge_policy:
    demux_factor: 7
    merge_factor: 9
    max_merge_factor: 11

search_settings:
  default_search_fields: [body, severity_text]

sources:
  - source_id: hdfs-logs-kafka-source
    source_type: kafka
    params:
      topic: cloudera-cluster-logs
"""


def test_loader_translates_reference_schema():
    from quickwit_spark.sources.index_config_yaml import (
        load_reference_index_config,
        mapping_from_dict,
        mapping_to_dict,
    )

    loaded = load_reference_index_config(HDFS_LIKE_YAML)
    cfg = loaded["config"]
    assert loaded["index_id"] == "hdfs-logs"
    assert cfg.default_search_field == "body"
    assert loaded["default_search_fields"] == ["body", "severity_text"]
    # the FULL list reaches the config: unqualified terms search both
    assert cfg.default_search_fields == ("body", "severity_text")
    assert cfg.query_default_fields == ["body", "severity_text"]
    assert cfg.tag_fields == ("severity_text",)
    assert cfg.field("severity_text").tokenizer == "raw"
    assert cfg.field("body").record == "position"
    assert cfg.timestamp_field == "timestamp"
    assert cfg.doc_key_fields == ("timestamp",)   # sort_field
    assert cfg.routing_field == "tenant_id"       # demux_field
    assert (cfg.merge_factor, cfg.max_merge_factor, cfg.demux_factor) == (9, 11, 7)
    assert cfg.demux_enabled and cfg.demux_field == "tenant_id"
    assert cfg.split_num_docs_target == 10_000_001

    dm = loaded["doc_mapping"]
    types = {f.name: f.type for f in dm.fields}
    assert types["tenant_id"] == "i64"            # u64 documented mapping
    assert types["timestamp"] == "datetime"
    assert types["resource"] == "object"
    assert dm.fields[4].fields[0].name == "service"
    # dict round-trip (catalog persistence form)
    assert mapping_from_dict(mapping_to_dict(dm)) == dm

    assert loaded["sources"][0]["source_id"] == "hdfs-logs-kafka-source"

    # no sort/timestamp and no override -> loud error
    with pytest.raises(ValueError, match="doc-key"):
        load_reference_index_config(
            "doc_mapping:\n  field_mappings:\n    - name: body\n      type: text\n"
        )


def test_yaml_create_ingest_search_e2e(spark, tmp_path):
    """CLI `index create --index-config <yaml>` then ndjson ingest uses
    the YAML's typed doc mapping; searches hit the YAML's fields and
    the tag filter prunes on the YAML's tag field."""
    from quickwit_spark.cli import main

    yml = tmp_path / "logs.yaml"
    yml.write_text(HDFS_LIKE_YAML)
    d = str(tmp_path / "idx")
    out = main(["index", "create", "--index-dir", d,
                "--index-config", str(yml)], spark=spark)
    assert out["created"] and out["sources"] == ["hdfs-logs-kafka-source"]

    lines = []
    for i in range(40):
        lines.append(json.dumps({
            "tenant_id": i % 3,
            "timestamp": f"2025-02-01T00:{i:02d}:00Z",
            "severity_text": "ERROR" if i % 4 == 0 else "INFO",
            "body": f"disk failure on node{i % 5} retry mount",
            "resource": {"service": f"svc{i % 2}"},
        }))
    lines.append("{not json")  # rejected by the mapper, counted
    src = tmp_path / "logs.ndjson"
    src.write_text("\n".join(lines))

    out = main(["index", "ingest", "--index-dir", d, "--input", str(src),
                "--n-splits", "2"], spark=spark)
    assert out["num_docs_valid"] == 40
    assert out["rejected"] == {"parse_error": 1}

    resp = main(["index", "search", "--index-dir", d,
                 "--query", "disk AND failure", "--max-hits", "5"],
                spark=spark)
    assert resp["num_hits"] == 40 and len(resp["hits"]) == 5
    assert resp["hits"][0]["document"]["resource"]["service"] in ("svc0", "svc1")

    # raw-tokenizer field + tag filter (severity_text is a tag field)
    resp = main(["index", "search", "--index-dir", d,
                 "--query", "severity_text:ERROR AND mount"], spark=spark)
    assert resp["num_hits"] == 10

    # phrase on the position-recorded body field
    resp = main(["index", "search", "--index-dir", d,
                 "--query", '"disk failure"'], spark=spark)
    assert resp["num_hits"] == 40


def test_node_config_run_discovers_indexes(spark, corpus, tmp_path):
    """`run --config <node yaml>` (quickwit run analog): indexes are
    discovered under data_dir/indexes/*, the REST port comes from
    rest_listen_port (port 0 override for the test), and
    searcher.fast_field_cache_capacity resizes the process fast-field
    cache."""
    import urllib.request

    import pyarrow as pa
    import pyarrow.parquet as pq

    from quickwit_spark.cli import main
    from quickwit_spark.operators import search as search_mod

    src = str(tmp_path / "turns.parquet")
    pq.write_table(
        pa.Table.from_pandas(corpus, preserve_index=False), src,
        coerce_timestamps="us",
    )
    base = tmp_path / "data" / "indexes"
    base.mkdir(parents=True)
    for name in ("logs-a", "logs-b"):
        d = str(base / name)
        main(["index", "create", "--index-dir", d], spark=spark)
        main(["index", "ingest", "--index-dir", d, "--input", src,
              "--n-splits", "2"], spark=spark)
    node_yml = tmp_path / "node.yaml"
    node_yml.write_text(f"""
version: 0
rest_listen_port: 0
data_dir: {tmp_path / 'data'}
searcher:
  fast_field_cache_capacity: 64M
""")
    old_cap = search_mod._FAST_CACHE_MAX_BYTES
    try:
        out = main(["run", "--config", str(node_yml)], spark=spark,
                   serve_forever=False)
        assert out["indexes"] == ["logs-a", "logs-b"]
        out = main(["index", "list", "--config", str(node_yml)], spark=spark)
        assert [i["index_dir"].rsplit("/", 1)[-1] for i in out["indexes"]] \
            == ["logs-a", "logs-b"]
        assert search_mod._FAST_CACHE_MAX_BYTES == 64 << 20
        # serve again (non-shutdown) and query both indexes over HTTP
        from quickwit_spark.api import Index
        from quickwit_spark.serve import serve

        server, _t = serve(
            {"logs-a": Index.open(spark, str(base / "logs-a")),
             "logs-b": Index.open(spark, str(base / "logs-b"))}, port=0)
        try:
            port = server.server_address[1]
            for name in ("logs-a", "logs-b"):
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/v1/{name}/search?query=w00001"
                ) as r:
                    assert json.load(r)["num_hits"] > 0
        finally:
            server.shutdown()
    finally:
        search_mod._FAST_CACHE_MAX_BYTES = old_cap


def test_source_add_from_reference_yaml(spark, tmp_path):
    """`source add --source-config <yaml>` accepts the reference's
    source-config file format (source_id/source_type/params)."""
    from quickwit_spark.cli import main

    d = str(tmp_path / "idx")
    main(["index", "create", "--index-dir", d], spark=spark)
    yml = tmp_path / "kinesis.yaml"
    yml.write_text(
        "source_id: hdfs-logs-kinesis-source\n"
        "source_type: kinesis\n"
        "params:\n  stream_name: emr-cluster-logs\n"
    )
    out = main(["source", "add", "--index-dir", d,
                "--source-config", str(yml)], spark=spark)
    assert out["added"] == "hdfs-logs-kinesis-source"
    out = main(["source", "list", "--index-dir", d], spark=spark)
    assert out["sources"][0]["params"] == {"stream_name": "emr-cluster-logs"}


def test_loader_dynamic_mode_indexes_dynamic_field():
    """mode: dynamic + dynamic_mapping.tokenizer: raw (the reference's
    test_search_dynamic_mode doc mapping) indexes `_dynamic` with raw
    json leaves and wires the query-resolution fallback."""
    from quickwit_spark.sources.index_config_yaml import (
        load_reference_index_config,
    )

    yml = """
index_id: dyn-test
doc_mapping:
  field_mappings:
    - name: body
      type: text
      tokenizer: default
  mode: dynamic
  dynamic_mapping:
    tokenizer: raw
indexing_settings:
  sort_field: body
search_settings:
  default_search_fields: [body]
"""
    cfg = load_reference_index_config(yml)["config"]
    assert cfg.dynamic_field == "_dynamic"
    assert cfg.field("_dynamic").tokenizer == "json_raw"
    from quickwit_spark.plans.query import Term, parse_query

    ast = parse_query("body_dynamic:hello", cfg)
    assert ast == Term("_dynamic", "body_dynamic\x1fhello")
    # default dynamic_mapping tokenizer -> json (default leaves)
    cfg2 = load_reference_index_config(
        yml.replace("  dynamic_mapping:\n    tokenizer: raw\n", "")
    )["config"]
    assert cfg2.field("_dynamic").tokenizer == "json"
    # indexed: false -> no dynamic field at all
    cfg3 = load_reference_index_config(
        yml.replace("tokenizer: raw", "indexed: false")
    )["config"]
    assert cfg3.dynamic_field is None
