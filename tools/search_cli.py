"""Thin serving driver over the query operator (SURVEY.md §2.1 S13).

The reference serves top-10 [title, url] over Flask/uWSGI
(backend/QueryMainRestApi.py:18-30, backend/QueryMain.py); the engine
equivalent is a small driver over the postings + doc_meta tables.

Usage:
  python tools/search_cli.py <index_dir> "query text"     # one-shot
  python tools/search_cli.py <index_dir>                  # REPL

<index_dir> is the output directory of pipelines.filter_index.run_filter_index
(containing doc_meta/ and postings/). Builds a demo index over the synthetic
web when <index_dir> is 'demo'.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_demo_index(tmpdir: str):
    import ray.data

    from spidey_ray.pipelines.filter_index import run_filter_index
    from spidey_ray.pipelines.oracle import crawl_serial
    from spidey_ray.sources.synthetic_web import WebConfig

    res = crawl_serial(WebConfig())
    order = {u: i for i, u in enumerate(res.fetch_log)}
    rows = [dict(doc_id=u, title=res.titles[u], spans=s, crawl_seq=order[u])
            for u, s in res.documents.items()]
    return run_filter_index(ray.data.from_items(rows), tmpdir)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from spidey_ray import io as sio
    from spidey_ray.pipelines.query import QueryIndex

    index_dir = sys.argv[1] if len(sys.argv) > 1 else "demo"
    if index_dir == "demo":
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="spidey_demo_index_")
        fi = build_demo_index(index_dir)
        num_docs = fi.num_documents
    else:
        if not os.path.isdir(os.path.join(index_dir, "doc_meta")):
            print(f"error: {index_dir!r} is not an index directory "
                  "(expected doc_meta/ and postings/ from "
                  "pipelines.filter_index.run_filter_index; or pass 'demo')",
                  file=sys.stderr)
            sys.exit(2)
        meta = sio.read_table_arrow(os.path.join(index_dir, "doc_meta"))
        num_docs = meta.num_rows
    qi = QueryIndex(
        sio.read_table_arrow(os.path.join(index_dir, "postings")),
        sio.read_table_arrow(os.path.join(index_dir, "doc_meta")),
        num_docs,
    )

    def serve(text: str) -> None:
        ranked, ms = qi.query(text)
        out = [
            {"rank": i + 1, "title": qi.doc_info[d][0],
             "url": qi.doc_info[d][1], "score": s}
            for i, (d, s) in enumerate(ranked)
        ]
        print(json.dumps({"query": text, "ms": round(ms, 2), "results": out},
                         indent=2))

    if len(sys.argv) > 2:
        serve(" ".join(sys.argv[2:]))
    else:
        try:
            while True:
                text = input("query> ").strip()
                if not text or text in ("exit", "quit"):
                    break
                serve(text)
        except (EOFError, KeyboardInterrupt):
            pass
    ray.shutdown()


if __name__ == "__main__":
    main()
