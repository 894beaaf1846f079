"""REST serving entry point (reference S13: QueryMainRestApi.py run under
uWSGI, init_uwsgi.sh).

Usage:
  python tools/serve_rest.py <index_dir> [port] [--replicas N]
  python tools/serve_rest.py demo [port]           # build + serve demo index

--replicas N serves through N PartitionedQueryIndex actor replicas
(uWSGI-parity: the reference runs 2 processes x 2 threads); default is the
single in-memory index.

<index_dir> is a pipelines.filter_index.run_filter_index output directory.
Endpoint: GET /?q=<text> → {"results": [[title, url], ...], "time": ms}.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import json

    from spidey_ray import io as sio
    from spidey_ray.pipelines.query import QueryIndex
    from spidey_ray.pipelines.serving import serve_forever

    argv = list(sys.argv[1:])
    n_replicas = 0
    if "--replicas" in argv:
        i = argv.index("--replicas")
        n_replicas = int(argv[i + 1])
        del argv[i:i + 2]
    index_dir = argv[0] if argv else "demo"
    port = int(argv[1]) if len(argv) > 1 else 8000
    if index_dir == "demo":
        import tempfile

        from tools.search_cli import build_demo_index

        tmp = tempfile.mkdtemp(prefix="spidey_rest_")
        fi = build_demo_index(tmp)
        index_dir = tmp
        n_docs = fi.num_documents
    else:
        with open(os.path.join(index_dir, "index_meta.json")) as f:
            n_docs = json.load(f)["num_documents"]
    if n_replicas > 0:
        from spidey_ray.pipelines.serving import ReplicatedQueryIndex

        qi = ReplicatedQueryIndex(
            os.path.join(index_dir, "postings"),
            os.path.join(index_dir, "doc_meta"),
            n_docs, n_replicas=n_replicas)
    else:
        qi = QueryIndex(
            sio.read_table_arrow(os.path.join(index_dir, "postings")),
            sio.read_table_arrow(os.path.join(index_dir, "doc_meta")),
            n_docs,
        )
    try:
        serve_forever(qi, port=port)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
