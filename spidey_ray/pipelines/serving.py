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


class ReplicatedQueryIndex:
    """uWSGI-parity serving pool (the reference's init_uwsgi.sh runs
    2 processes × 2 threads): N stateless replica ACTORS over the on-disk
    partitioned index, round-robined per request.

    Each replica process holds its own footer row-group index and
    stem/doc caches (exactly what a uWSGI worker holds), so queries run in
    true parallel across processes instead of contending on one
    interpreter's GIL.  The REST layer plugs this in unchanged — it only
    calls ``results_with_info`` / ``query``.  Scale-out on a cluster is
    the same object with ``n_replicas`` spread across nodes."""

    def __init__(self, postings_path: str, doc_meta_path: str,
                 num_documents: int, n_replicas: int = 2):
        import itertools

        import ray

        @ray.remote(num_cpus=0.01)   # lookup-bound; don't reserve cores
        class _QueryReplica:
            def __init__(self, postings_path, doc_meta_path, num_documents):
                from .query import PartitionedQueryIndex

                self.qi = PartitionedQueryIndex(
                    postings_path, doc_meta_path, num_documents)

            def results_with_info(self, text):
                return self.qi.results_with_info(text)

            def query(self, text):
                return self.qi.query(text)

        self._ray = ray
        self._replicas = [
            _QueryReplica.remote(postings_path, doc_meta_path, num_documents)
            for _ in range(n_replicas)
        ]
        self._rr = itertools.count()

    def _pick(self):
        return self._replicas[next(self._rr) % len(self._replicas)]

    def results_with_info(self, text: str):
        return self._ray.get(self._pick().results_with_info.remote(text))

    def query(self, text: str):
        return tuple(self._ray.get(self._pick().query.remote(text)))


def serve_forever(query_index, host: str = "127.0.0.1", port: int = 8000):
    srv = make_rest_server(query_index, host, port)
    print(f"serving on http://{srv.server_address[0]}:{srv.server_address[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
