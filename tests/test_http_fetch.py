"""Real-fetcher integration: the crawl engine running through the HTTP
fetcher code path (sources/http_fetch.py) against an in-process cache
server (the reference's download.py:9-12 deployment shape) must match the
serial oracle exactly."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from spidey_ray.sources.synthetic_web import WebConfig


@pytest.fixture(scope="module")
def cache_server():
    """HTTP server speaking the reference cache protocol
    (GET /?q=<url>&u=<agent> → {url, status, content}) over the
    deterministic synthetic web."""
    from spidey_ray.sources import synthetic_web as sw

    cfg = WebConfig()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            qs = parse_qs(urlparse(self.path).query)
            url = qs.get("q", [""])[0]
            page = sw.fetch(cfg, url)
            body = json.dumps({
                "url": page.final_url, "status": page.status,
                "content": page.content,
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield cfg, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestHttpFetcher:
    def test_cache_fetch_fn_roundtrip(self, cache_server):
        from spidey_ray.sources.http_fetch import make_cache_fetch_fn

        cfg, server = cache_server
        fetch = make_cache_fetch_fn(server)
        seed = cfg.seeds()[0]
        final_url, status, content = fetch(seed)
        assert status == 200 and content
        # unknown URL → the synthetic web's 404, faithfully proxied
        _, status404, c404 = fetch("https://h0.example.com/definitely-missing")
        assert status404 == 404 and c404 == ""

    def test_transport_error_no_retry(self):
        from spidey_ray.sources.http_fetch import make_cache_fetch_fn

        fetch = make_cache_fetch_fn("http://127.0.0.1:9", timeout=0.5)
        url, status, content = fetch("https://h0.example.com/")
        assert status == 599 and content == ""   # synthetic no-response code

    def test_crawl_through_real_fetcher_matches_oracle(self, ray_session,
                                                       cache_server, tmp_path):
        """Full engine run where EVERY fetch (pages, robots, sitemaps) goes
        over real HTTP through the cache server — crawl order, seen set and
        token counts must equal the oracle, and the stage must run with
        retries disabled (non-idempotent fetch discipline)."""
        from spidey_ray.pipelines.crawl import CrawlEngine
        from spidey_ray.pipelines.oracle import crawl_serial

        cfg, server = cache_server
        o = crawl_serial(cfg)
        e = CrawlEngine(
            cfg, ckpt_dir=str(tmp_path / "ck"), inline_threshold=0,
            fetch_module="spidey_ray.sources.http_fetch",
            fetch_name="make_cache_fetch_fn",
            fetch_kwargs={"server": server},
        )
        assert not e._synthetic_fetch
        res = e.run()
        assert res.fetch_log == o.fetch_log
        assert res.seen_hashes == o.seen_hashes
        assert res.token_counts == o.token_counts
        assert dict(res.blacklist.permanent) == dict(o.blacklist.permanent)


class TestDirectFetcher:
    def test_direct_get_and_http_error(self):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from spidey_ray.sources.http_fetch import make_direct_fetch_fn

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path == "/missing":
                    self.send_error(404)
                    return
                body = f"hello from {self.path}".encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            fetch = make_direct_fetch_fn()
            final, status, content = fetch(base + "/page/1")
            assert status == 200 and content == "hello from /page/1"
            assert final == base + "/page/1"
            _, status404, c404 = fetch(base + "/missing")
            assert status404 == 404 and c404 == ""
            # no server → synthetic 599, never raises
            _, dead, _ = make_direct_fetch_fn(timeout=0.3)(
                "http://127.0.0.1:9/x")
            assert dead == 599
        finally:
            srv.shutdown()
