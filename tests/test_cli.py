"""CLI tests — the quickwit-cli command-tree analog
(quickwit-cli/src/cli.rs:31-46, index.rs:59-178, split.rs:40-108),
driven through ``cli.main(argv, spark=...)`` with the shared session.
"""

from __future__ import annotations

import json
import os
import urllib.request

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickwit_spark.cli import main


@pytest.fixture(scope="module")
def cli_index(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    src = str(base / "turns.parquet")
    pq.write_table(
        pa.Table.from_pandas(corpus, preserve_index=False), src,
        coerce_timestamps="us",
    )
    d = str(base / "idx")
    cfg = {"merge_factor": 2, "max_merge_factor": 4, "min_level_num_docs": 10}
    out = main(["index", "create", "--index-dir", d,
                "--config", json.dumps(cfg)], spark=spark)
    assert out["created"]
    out = main(["index", "ingest", "--index-dir", d, "--input", src,
                "--n-splits", "4"], spark=spark)
    assert out["num_docs"] == len(corpus)
    return d


def test_index_describe_and_list(spark, cli_index, corpus):
    out = main(["index", "describe", "--index-dir", cli_index], spark=spark)
    assert out["num_docs"] == len(corpus)
    assert out["num_published_splits"] == 4
    out = main(["index", "list", "--index-dir", cli_index], spark=spark)
    assert len(out["indexes"]) == 1


def test_index_search(spark, cli_index, oracle):
    out = main(["index", "search", "--index-dir", cli_index,
                "--query", "w00002", "--max-hits", "5"], spark=spark)
    n_o, hits_o = oracle.search("w00002", k=5)
    assert out["num_hits"] == n_o
    assert len(out["hits"]) == 5
    assert [round(h["score"], 9) for h in out["hits"]] == [
        round(h.score, 9) for h in hits_o
    ]
    # sort DSL + timestamp window pass through
    out = main(["index", "search", "--index-dir", cli_index,
                "--query", "w00002", "--sort-by-field=-ts"], spark=spark)
    ts = [h["document"]["ts"] for h in out["hits"]]
    assert ts == sorted(ts, reverse=True)


def test_split_list_describe_extract(spark, cli_index, tmp_path):
    out = main(["split", "list", "--index-dir", cli_index], spark=spark)
    assert len(out["splits"]) == 4
    sid = out["splits"][0]["split_id"]
    desc = main(["split", "describe", "--index-dir", cli_index,
                 "--split", sid], spark=spark)
    assert desc["split_id"] == sid and desc["num_docs"] > 0
    ex = main(["split", "extract", "--index-dir", cli_index,
               "--split", sid, "--target-dir", str(tmp_path / "out")],
              spark=spark)
    assert len(ex["files"]) == 2
    assert all(os.path.getsize(p) > 0 for p in ex["files"])


def test_merge_and_gc(spark, cli_index, oracle):
    before = main(["index", "search", "--index-dir", cli_index,
                   "--query", "w00001", "--max-hits", "10"], spark=spark)
    out = main(["index", "merge", "--index-dir", cli_index], spark=spark)
    assert out["merge_ops"] >= 1
    out = main(["index", "gc", "--index-dir", cli_index,
                "--grace-secs", "0"], spark=spark)
    assert out["removed_splits"]
    after = main(["index", "search", "--index-dir", cli_index,
                  "--query", "w00001", "--max-hits", "10"], spark=spark)
    assert after["num_hits"] == before["num_hits"]
    assert [round(h["score"], 9) for h in after["hits"]] == [
        round(h["score"], 9) for h in before["hits"]
    ]


def test_run_serves_http(spark, cli_index):
    out = main(["run", "--index-dir", cli_index, "--port", "0"],
               spark=spark, serve_forever=False)
    assert out["indexes"] == ["idx"]
    assert out["port"] > 0  # bound an ephemeral port, then shut down


def test_run_http_round_trip(spark, cli_index):
    from quickwit_spark.api import Index
    from quickwit_spark.serve import serve

    server, _t = serve({"idx": Index.open(spark, cli_index)}, port=0)
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/idx/search?query=w00002&max_hits=3"
        ) as r:
            body = json.load(r)
        assert body["num_hits"] > 0 and len(body["hits"]) == 3
    finally:
        server.shutdown()


def test_demux_command(spark, corpus, tmp_path):
    d = str(tmp_path / "dmx")
    cfg = {"tag_fields": ["tool"]}
    main(["index", "create", "--index-dir", d, "--config", json.dumps(cfg)],
         spark=spark)
    src = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.Table.from_pandas(corpus[:400], preserve_index=False), src,
        coerce_timestamps="us",
    )
    main(["index", "ingest", "--index-dir", d, "--input", src,
          "--n-splits", "2"], spark=spark)
    out = main(["index", "demux", "--index-dir", d, "--demux-field", "tool",
                "--demux-factor", "3"], spark=spark)
    assert out["new_splits"]
    desc = main(["index", "describe", "--index-dir", d], spark=spark)
    assert desc["num_docs"] == 400


def test_source_commands_and_resumable_ingest(spark, corpus, tmp_path):
    """source add/list/ingest/disable: a registered file source batch-
    ingests under its own checkpoint namespace, so re-running ingest is
    a no-op (no duplicated docs); disabling blocks ingest."""
    src = str(tmp_path / "turns.parquet")
    pq.write_table(
        pa.Table.from_pandas(corpus, preserve_index=False), src,
        coerce_timestamps="us",
    )
    d = str(tmp_path / "idx")
    main(["index", "create", "--index-dir", d], spark=spark)
    out = main(["source", "add", "--index-dir", d, "--source-id", "turns",
                "--type", "file", "--params", json.dumps({"path": src})],
               spark=spark)
    assert out["added"] == "turns"
    out = main(["source", "list", "--index-dir", d], spark=spark)
    assert [s["source_id"] for s in out["sources"]] == ["turns"]

    out = main(["source", "ingest", "--index-dir", d, "--source-id",
                "turns", "--n-splits", "4"], spark=spark)
    assert out["num_docs"] == len(corpus)
    # resume semantics: same source id -> no duplication
    out = main(["source", "ingest", "--index-dir", d, "--source-id",
                "turns", "--n-splits", "4"], spark=spark)
    assert out["num_docs"] == len(corpus)

    out = main(["source", "describe", "--index-dir", d, "--source-id",
                "turns"], spark=spark)
    assert out["source"]["source_type"] == "file"
    assert out["checkpoint"]  # resume positions under batch/src-turns

    main(["source", "disable", "--index-dir", d, "--source-id", "turns"],
         spark=spark)
    with pytest.raises(ValueError, match="disabled"):
        main(["source", "ingest", "--index-dir", d, "--source-id", "turns"],
             spark=spark)
    out = main(["source", "delete", "--index-dir", d, "--source-id", "turns"],
               spark=spark)
    assert out["deleted"] == "turns"


def test_post_search_json_body(spark, cli_index):
    """POST /search with a JSON body (rest_handler.rs
    search_post_filter) returns the same results as the GET form,
    including aggs and search-field lists."""
    from quickwit_spark.api import Index
    from quickwit_spark.serve import serve

    server, _t = serve({"idx": Index.open(spark, cli_index)}, port=0)
    try:
        port = server.server_address[1]
        url = f"http://127.0.0.1:{port}/api/v1/idx/search"

        def post(payload):
            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"content-type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return json.load(r)

        body = post({"query": "w00002", "max_hits": 3, "format": "json"})
        with urllib.request.urlopen(f"{url}?query=w00002&max_hits=3") as r:
            get_body = json.load(r)
        assert body["num_hits"] == get_body["num_hits"] > 0
        assert [h["score"] for h in body["hits"]] == [
            h["score"] for h in get_body["hits"][:3]
        ]
        body = post({
            "query": "w00002",
            "max_hits": 1,
            "aggs": {"by_role": {"terms": {"field": "role"}}},
        })
        assert body["aggregations"]["by_role"]["buckets"]
        # malformed body -> 400
        req = urllib.request.Request(
            url, data=b"{not json", method="POST",
            headers={"content-type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as exc:
            assert exc.code == 400
    finally:
        server.shutdown()
