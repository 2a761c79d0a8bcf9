"""Minimal HTTP server exposing the reference's REST surface over an
:class:`~quickwit_spark.api.Index` — the quickwit-serve analog
(quickwit-serve/src/search_api/rest_handler.rs:83-166,
rest.rs ingest/tail routes), stdlib-only so the sandbox can run it.

Routes (all JSON):
* ``GET  /api/v1/{index}/search?query=...&max_hits=&start_offset=&
  sort_by_field=&start_timestamp=&end_timestamp=`` — rest_handler.rs
  param names; response = ``Index.search_json`` shape
  (search_api.proto:96-111).
* ``GET  /api/v1/{index}/search/stream?query=...&fast_field=...`` —
  newline-delimited ``{"value": ...}`` rows (CSV-ish stream export).
* ``POST /api/v1/{index}/ingest`` — newline-delimited JSON docs body;
  returns ingest counters.
* ``GET  /api/v1/{index}/tail?num_hits=`` — most recent docs.
* ``GET  /api/v1/{index}/describe`` — CLI `index describe` shape.

The server is a thin translation layer: every route delegates to the
library facade, which is the tested surface; concurrency comes from
``ThreadingHTTPServer`` (queries already fan out through Spark).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from quickwit_spark.api import Index

_ROUTE = re.compile(r"^/api/v1/(?P<index>[\w.-]+)/(?P<verb>search/stream|search|ingest|tail|describe)$")

# flush threshold for chunked /search/stream responses (module-level so
# tests can shrink it to force multi-chunk bodies)
STREAM_CHUNK_BYTES = 64 * 1024


def _search_kwargs(q: dict) -> dict:
    """Translate rest_handler.rs query params to Index.search kwargs."""
    kw: dict = {}
    if "max_hits" in q:
        kw["k"] = int(q["max_hits"][0])
    if "start_offset" in q:
        kw["offset"] = int(q["start_offset"][0])
    if "sort_by_field" in q:
        kw["sort_by"] = q["sort_by_field"][0]
    if "start_timestamp" in q:  # seconds, [start, end) — rest_handler.rs
        kw["start_us"] = int(q["start_timestamp"][0]) * 1_000_000
    if "end_timestamp" in q:
        kw["end_us"] = int(q["end_timestamp"][0]) * 1_000_000
    if "search_field" in q:
        kw["search_fields"] = q["search_field"][0].split(",")
    return kw


class _Handler(BaseHTTPRequestHandler):
    server_version = "quickwit-spark-serve/0.1"
    protocol_version = "HTTP/1.1"  # chunked transfer for /search/stream

    # injected by serve(): {index_name: Index}
    indexes: dict[str, Index] = {}

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _write_chunk(self, data: bytes) -> None:
        """One HTTP/1.1 chunked-transfer frame."""
        self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")

    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _route(self):
        u = urlparse(self.path)
        m = _ROUTE.match(u.path)
        if not m:
            self._json(404, {"error": f"no route {u.path}"})
            return None
        idx = self.indexes.get(m.group("index"))
        if idx is None:
            self._json(404, {"error": f"unknown index {m.group('index')}"})
            return None
        return idx, m.group("verb"), parse_qs(u.query)

    def do_GET(self):  # noqa: N802 - stdlib naming
        r = self._route()
        if r is None:
            return
        idx, verb, q = r
        try:
            if verb == "search":
                query = q.get("query", ["*"])[0]
                self._json(200, idx.search_json(query, **_search_kwargs(q)))
            elif verb == "search/stream":
                query = q.get("query", ["*"])[0]
                fast_field = q["fast_field"][0]
                # stream the export: toLocalIterator pulls one Spark
                # partition at a time into the driver, and chunked
                # transfer forwards it — driver memory stays bounded by
                # one partition + one chunk, never the whole result
                # (the old .collect() + single body string OOMed the
                # driver at real export sizes)
                it = idx.search_stream(query, fast_field).toLocalIterator()
                self.send_response(200)
                self.send_header("content-type", "application/x-ndjson")
                self.send_header("transfer-encoding", "chunked")
                self.end_headers()
                buf: list[bytes] = []
                size = 0
                for row in it:
                    piece = (json.dumps({"value": row.value}) + "\n").encode()
                    buf.append(piece)
                    size += len(piece)
                    if size >= STREAM_CHUNK_BYTES:
                        self._write_chunk(b"".join(buf))
                        buf, size = [], 0
                if buf:
                    self._write_chunk(b"".join(buf))
                self.wfile.write(b"0\r\n\r\n")  # chunked terminator
            elif verb == "tail":
                n = int(q.get("num_hits", ["20"])[0])
                resp = idx.tail(n)
                self._json(200, {
                    "num_hits": resp.num_hits,
                    "hits": [h.doc for h in resp.hits],
                })
            elif verb == "describe":
                self._json(200, idx.describe())
            else:
                self._json(405, {"error": f"GET not supported for {verb}"})
        except (ValueError, KeyError) as exc:
            self._json(400, {"error": str(exc)})

    def do_POST(self):  # noqa: N802
        r = self._route()
        if r is None:
            return
        idx, verb, _q = r
        if verb != "ingest":
            self._json(405, {"error": f"POST not supported for {verb}"})
            return
        length = int(self.headers.get("content-length", "0"))
        body = self.rfile.read(length).decode()
        import os
        import tempfile
        import uuid

        # spool the NDJSON body to a file and reuse the bulk path.
        # The ingest id is a per-request nonce (honoring an optional
        # idempotency key header): ES bulk semantics APPEND on re-POST
        # of an identical body — deriving the id from the body hash
        # made that a silent no-op that still reported counters.
        nonce = self.headers.get(
            "x-idempotency-key", uuid.uuid4().hex[:12]
        )
        fd, tmp = tempfile.mkstemp(prefix="qs_ingest_", suffix=".ndjson")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(body)
            result = idx.ingest_json_lines(
                tmp, n_splits=2, ingest_id=f"r{nonce}"
            )
            self._json(200, result)
        except (ValueError, KeyError) as exc:
            self._json(400, {"error": str(exc)})
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass


def serve(indexes: dict[str, Index], port: int = 0):
    """Start the REST server on ``port`` (0 = ephemeral) serving the
    given indexes by name. Returns ``(server, thread)``; call
    ``server.shutdown()`` to stop. The actual port is
    ``server.server_address[1]``."""
    handler = type("Handler", (_Handler,), {"indexes": dict(indexes)})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t
