"""REST serving over the query index (reference parity S13:
``backend/QueryMainRestApi.py:18-30`` + ``backend/gateway/index.py:23-32``).

Endpoint semantics reproduced exactly:
- ``GET /`` without a ``q`` param → 404 with ``{"error": ...}``,
- ``GET /?q=`` (empty) → ``[]``,
- ``GET /?q=<text>`` → ``{"results": [[title, url], ...], "time": <ms>}``
  (top-10, Query.py:281-282; per-query latency in ms, Query.py:319-364),
- every response carries ``Access-Control-Allow-Origin: *``
  (QueryMainRestApi.py:10-12).

Built on the stdlib http.server (no Flask in this sandbox); the reference
runs uWSGI with 2 processes × 2 threads (init_uwsgi.sh) — the
ThreadingHTTPServer gives the same request-level concurrency shape for a
single process, and the serving layer is stateless over the loaded index so
N replicas scale it the reference's way.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def make_rest_server(query_index, host: str = "127.0.0.1", port: int = 0):
    """ThreadingHTTPServer serving ``query_index`` (pipelines.query.QueryIndex).
    ``port=0`` binds an ephemeral port — read ``server.server_address``."""

    class Handler(BaseHTTPRequestHandler):
        def _respond(self, obj, status: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            qs = parse_qs(urlparse(self.path).query, keep_blank_values=True)
            if "q" not in qs:
                self._respond({"error": "404 Not Found: missing q"}, 404)
                return
            text = qs["q"][0]
            if text == "":
                self._respond([])
                return
            import time as _time

            t0 = _time.perf_counter()
            # results_with_info works for BOTH index classes (the
            # partitioned serving index resolves doc meta lazily via
            # _prefetch_docs; raw doc_info indexing would only work on the
            # in-memory index)
            results = query_index.results_with_info(text)
            ms = (_time.perf_counter() - t0) * 1000.0
            self._respond({"results": results, "time": ms})

        def log_message(self, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(query_index, host: str = "127.0.0.1", port: int = 8000):
    srv = make_rest_server(query_index, host, port)
    print(f"serving on http://{srv.server_address[0]}:{srv.server_address[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
