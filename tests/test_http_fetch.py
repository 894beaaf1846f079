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


@pytest.fixture(scope="module")
def registration_server(cache_server):
    """Registration endpoint in front of the cache server — the HTTP
    rendition of the reference's spacetime handshake
    (server_registration.py:5-26): the first two polls return a pending
    assignment (exercising the pull_await loop), the third returns the
    cache server's (host, port); the agent 'bad-bot' is rejected."""
    cfg, cache_addr = cache_server
    host, port = cache_addr.removeprefix("http://").split(":")
    polls = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            qs = parse_qs(urlparse(self.path).query)
            agent = qs.get("u", [""])[0]
            if agent == "bad-bot":
                body = json.dumps({"invalid": True}).encode()
            else:
                polls[agent] = polls.get(agent, 0) + 1
                if polls[agent] < 3:
                    body = json.dumps(
                        {"invalid": False, "host": None, "port": None}).encode()
                else:
                    body = json.dumps(
                        {"invalid": False, "host": host,
                         "port": int(port)}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield cfg, f"http://127.0.0.1:{srv.server_address[1]}", cache_addr
    srv.shutdown()


class TestRegistration:
    def test_register_polls_until_assigned(self, registration_server):
        from spidey_ray.sources.http_fetch import register_cache_server

        cfg, reg, cache_addr = registration_server
        got = register_cache_server(reg, user_agent="poller",
                                    poll_interval=0.01)
        assert got == cache_addr

    def test_invalid_user_agent_rejected(self, registration_server):
        from spidey_ray.sources.http_fetch import register_cache_server

        _, reg, _ = registration_server
        with pytest.raises(RuntimeError, match="not acceptable"):
            register_cache_server(reg, user_agent="bad-bot")

    def test_register_then_fetch_then_crawl(self, ray_session,
                                            registration_server, tmp_path):
        """The full deployment path a reference user follows: registration
        handshake → cache fetch → engine crawl, matching the oracle."""
        from spidey_ray.pipelines.crawl import CrawlEngine
        from spidey_ray.pipelines.oracle import crawl_serial
        from spidey_ray.sources.http_fetch import (
            make_registered_cache_fetch_fn)

        cfg, reg, _ = registration_server
        fetch = make_registered_cache_fetch_fn(reg, user_agent="crawler-1")
        _, status, content = fetch(cfg.seeds()[0])
        assert status == 200 and content
        e = CrawlEngine(
            cfg, ckpt_dir=str(tmp_path / "ckreg"), inline_threshold=0,
            fetch_module="spidey_ray.sources.http_fetch",
            fetch_name="make_registered_cache_fetch_fn",
            fetch_kwargs={"registration_server": reg,
                          "user_agent": "crawler-1"},
        )
        res = e.run()
        assert res.fetch_log == crawl_serial(cfg).fetch_log


class TestGatedWireFormats:
    def test_cbor_branch_decodes_and_falls_back(self, monkeypatch):
        """Exercise the CBOR wire branch (download.py:14, response.py:9-11)
        with a stand-in codec: when HAVE_CBOR is on, bodies decode through
        cbor.loads; a body the codec rejects falls back to JSON."""
        import pickle

        from spidey_ray.sources import http_fetch as hf

        class FakeCbor:
            @staticmethod
            def loads(b):
                return pickle.loads(b)

        monkeypatch.setattr(hf, "HAVE_CBOR", True)
        monkeypatch.setattr(hf, "cbor", FakeCbor, raising=False)
        obj = {"url": "https://x/", "status": 200, "content": "hi"}
        assert hf._decode(pickle.dumps(obj)) == obj
        # JSON body: cbor codec raises → JSON fallback
        assert hf._decode(json.dumps(obj).encode()) == obj

    def test_lance_branch_with_fake(self, ray_session, monkeypatch, tmp_path):
        """Exercise the HAVE_LANCE branches (io.py) end to end with a fake
        lance module + patched Ray entry points: table and Dataset
        round-trips must hand back the same rows."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from spidey_ray import io as sio

        class FakeLanceDataset:
            def __init__(self, path):
                self.path = path

            def to_table(self, columns=None):
                files = sorted(os.path.join(self.path, f)
                               for f in os.listdir(self.path)
                               if f.endswith(".parquet"))
                return pa.concat_tables(
                    [pq.read_table(f, columns=columns) for f in files])

        class FakeLance:
            @staticmethod
            def write_dataset(tbl, path, mode="overwrite"):
                pq.write_table(tbl, os.path.join(path, "part-0.parquet"))

            dataset = FakeLanceDataset

        monkeypatch.setattr(sio, "lance", FakeLance, raising=False)
        monkeypatch.setattr(sio, "HAVE_LANCE", True)
        monkeypatch.setattr(
            ray.data, "read_lance",
            lambda path, columns=None: ray.data.read_parquet(
                path, columns=columns),
            raising=False)
        monkeypatch.setattr(
            ray.data.Dataset, "write_lance",
            lambda self, path: self.write_parquet(path), raising=False)

        t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        sio.write_table(t, str(tmp_path / "tbl"))
        assert sio.read_table_arrow(str(tmp_path / "tbl")).equals(t)
        sio.write_table(ray.data.from_arrow(t), str(tmp_path / "tbl2"))
        got = sio.read_table(str(tmp_path / "tbl2")).to_pandas()
        assert sorted(got["a"]) == [1, 2, 3]


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
