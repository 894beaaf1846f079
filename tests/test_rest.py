"""REST serving parity (S13): endpoint semantics of QueryMainRestApi.py
reproduced over the engine's query index."""

import json
import threading
import urllib.error
import urllib.request
from urllib.parse import quote

import pytest


@pytest.fixture(scope="module")
def rest_server(ray_session, tmp_path_factory):
    import ray.data

    from spidey_ray import io as sio
    from spidey_ray.pipelines.filter_index import run_filter_index
    from spidey_ray.pipelines.oracle import crawl_serial
    from spidey_ray.pipelines.query import QueryIndex
    from spidey_ray.pipelines.serving import make_rest_server
    from spidey_ray.sources.synthetic_web import WebConfig

    res = crawl_serial(WebConfig(n_hosts=6, pages_per_host=8, n_seeds=3))
    order = {u: i for i, u in enumerate(res.fetch_log)}
    rows = [dict(doc_id=u, title=res.titles[u], spans=s, crawl_seq=order[u])
            for u, s in res.documents.items()]
    out = str(tmp_path_factory.mktemp("rest_idx"))
    fi = run_filter_index(ray.data.from_items(rows), out)
    qi = QueryIndex(sio.read_table_arrow(fi.postings_path),
                    sio.read_table_arrow(fi.doc_meta_path),
                    fi.num_documents)
    srv = make_rest_server(qi)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, dict(r.headers), json.loads(r.read().decode())


class TestRestEndpoint:
    def test_missing_q_404(self, rest_server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(rest_server + "/")
        assert e.value.code == 404
        assert "error" in json.loads(e.value.read().decode())

    def test_empty_q_empty_list(self, rest_server):
        status, _, body = _get(rest_server + "/?q=")
        assert status == 200 and body == []

    def test_results_shape_and_timing(self, rest_server):
        status, headers, body = _get(rest_server + "/?q=" + quote("home page"))
        assert status == 200
        assert headers.get("Access-Control-Allow-Origin") == "*"
        assert isinstance(body["time"], (int, float))
        assert body["results"], "query should hit the demo corpus"
        assert len(body["results"]) <= 10
        for title, url in body["results"]:
            assert isinstance(title, str) and url.startswith("http")

    def test_concurrent_requests(self, rest_server):
        outs = []

        def hit():
            outs.append(_get(rest_server + "/?q=page")[2])

        threads = [threading.Thread(target=hit) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(outs) == 8
        assert all(o["results"] == outs[0]["results"] for o in outs)


@pytest.fixture(scope="module")
def partitioned_rest_server(ray_session, tmp_path_factory):
    """Same corpus served through the ON-DISK PartitionedQueryIndex — the
    cluster-serving path must work behind the same REST handler."""
    import ray.data

    from spidey_ray.pipelines.filter_index import run_filter_index
    from spidey_ray.pipelines.oracle import crawl_serial
    from spidey_ray.pipelines.query import PartitionedQueryIndex
    from spidey_ray.pipelines.serving import make_rest_server
    from spidey_ray.sources.synthetic_web import WebConfig

    res = crawl_serial(WebConfig(n_hosts=6, pages_per_host=8, n_seeds=3))
    order = {u: i for i, u in enumerate(res.fetch_log)}
    rows = [dict(doc_id=u, title=res.titles[u], spans=s, crawl_seq=order[u])
            for u, s in res.documents.items()]
    out = str(tmp_path_factory.mktemp("rest_pidx"))
    fi = run_filter_index(ray.data.from_items(rows), out)
    qi = PartitionedQueryIndex(fi.postings_path, fi.doc_meta_path,
                               fi.num_documents)
    srv = make_rest_server(qi)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestRestPartitionedServing:
    def test_partitioned_index_behind_rest(self, partitioned_rest_server,
                                           rest_server):
        status, headers, body = _get(
            partitioned_rest_server + "/?q=" + quote("home page"))
        assert status == 200
        assert headers.get("Access-Control-Allow-Origin") == "*"
        assert body["results"]
        # identical ranked [title, url] results as the in-memory index
        _, _, mem_body = _get(rest_server + "/?q=" + quote("home page"))
        assert body["results"] == mem_body["results"]


class TestReplicatedServing:
    def test_replica_pool_behind_rest(self, ray_session, tmp_path_factory,
                                      rest_server):
        """uWSGI-parity replica pool (2 actor replicas, round-robined):
        concurrent REST requests spread across processes yet return the
        same ranked results as the single in-memory index."""
        import ray.data

        from spidey_ray.pipelines.filter_index import run_filter_index
        from spidey_ray.pipelines.oracle import crawl_serial
        from spidey_ray.pipelines.serving import (ReplicatedQueryIndex,
                                                  make_rest_server)
        from spidey_ray.sources.synthetic_web import WebConfig

        res = crawl_serial(WebConfig(n_hosts=6, pages_per_host=8, n_seeds=3))
        order = {u: i for i, u in enumerate(res.fetch_log)}
        rows = [dict(doc_id=u, title=res.titles[u], spans=s,
                     crawl_seq=order[u])
                for u, s in res.documents.items()]
        out = str(tmp_path_factory.mktemp("rest_repl"))
        fi = run_filter_index(ray.data.from_items(rows), out)
        pool = ReplicatedQueryIndex(fi.postings_path, fi.doc_meta_path,
                                    fi.num_documents, n_replicas=2)
        srv = make_rest_server(pool)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            _, _, mem_body = _get(rest_server + "/?q=" + quote("home page"))
            outs = []
            lock = threading.Lock()

            def hit():
                _, _, b = _get(base + "/?q=" + quote("home page"))
                with lock:
                    outs.append(b)

            threads = [threading.Thread(target=hit) for _ in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert len(outs) == 6
            # > n_replicas requests → both replicas served at least once;
            # every response identical to the in-memory index
            assert all(o["results"] == mem_body["results"] for o in outs)
            assert pool.query("home page")[0]
        finally:
            srv.shutdown()
