"""End-to-end: distributed crawl → documents table → filter/index shuffles →
query serving — the full reference workflow on engine-produced artifacts."""

import pytest

from spidey_ray.sources.synthetic_web import WebConfig


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def chain(self, ray_session, tmp_path_factory):
        import ray.data

        from spidey_ray import io as sio
        from spidey_ray.pipelines.crawl import CrawlEngine
        from spidey_ray.pipelines.filter_index import run_filter_index
        from spidey_ray.pipelines.query import QueryIndex

        root = tmp_path_factory.mktemp("e2e")
        crawl = CrawlEngine(WebConfig(), ckpt_dir=str(root / "ckpt")).run()
        docs_tbl = crawl.documents()
        fi = run_filter_index(ray.data.from_arrow(docs_tbl), str(root / "index"))
        qi = QueryIndex(
            sio.read_table_arrow(fi.postings_path),
            sio.read_table_arrow(fi.doc_meta_path),
            fi.num_documents,
        )
        return crawl, fi, qi

    def test_index_matches_serial_oracle_end_to_end(self, chain):
        """Engine crawl docs → Ray index must equal oracle crawl docs →
        serial index (the whole chain is semantics-preserving)."""
        from spidey_ray.pipelines.index_oracle import filter_index_serial
        from spidey_ray.pipelines.oracle import crawl_serial

        crawl, fi, qi = chain
        o = crawl_serial(WebConfig())
        order = {u: i for i, u in enumerate(o.fetch_log)}
        rows = [dict(doc_id=u, title=o.titles[u], spans=s, crawl_seq=order[u])
                for u, s in o.documents.items()]
        serial = filter_index_serial(rows)
        assert fi.num_documents == serial.num_documents
        # spot-check posting lists through the loaded query index
        for stem, plist in list(serial.postings[False].items())[:200]:
            assert qi.index[False].get(stem) == plist, stem

    def test_query_returns_real_pages(self, chain):
        crawl, fi, qi = chain
        results = qi.results_with_info("home")
        assert results
        for title, url in results:
            assert url.startswith("https://h")

    def test_search_cli_demo_index(self, chain, tmp_path):
        # S13 thin serving driver builds and serves without error
        import ray.data

        from tools.search_cli import build_demo_index

        fi = build_demo_index(str(tmp_path / "demo"))
        assert fi.num_documents > 0


class TestVlmPipelineCli:
    """The composed graft flagship CLI (crawl → interleaved curation →
    resumable export) run as a real subprocess, fresh then resumed."""

    def test_fresh_then_resume(self, tmp_path):
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = str(tmp_path / "vlm")

        def run():
            p = subprocess.run(
                [sys.executable, "tools/run_vlm_pipeline.py", "--out", out,
                 "--hosts", "8", "--pages", "8", "--shards", "4",
                 "--cpus", "4"],
                capture_output=True, text=True, cwd=repo, timeout=300)
            assert p.returncode == 0, p.stderr[-2000:]
            return json.loads(p.stdout.strip().splitlines()[-1])

        a = run()
        assert a["shards_written"] == 4 and a["shards_skipped"] == 0
        assert a["docs_in"] > 0 and a["packed_rows"] > 0
        assert a["n_bins"] <= a["packed_rows"]

        b = run()   # crawl resumes complete, export skips every shard
        assert b["shards_written"] == 0 and b["shards_skipped"] == 4
        assert b["urls_fetched"] == a["urls_fetched"]
        assert b["packed_rows"] == a["packed_rows"]
        assert b["n_bins"] == a["n_bins"]
