"""End-to-end graft flagship: CRAWL interleaved text+media documents →
VLM CURATION (cross-doc media dedup in the interleave → per-span text
gate → context-window chunking → tokenizer render → FFD packing) →
RESUMABLE SHARDED EXPORT — the crawl tier and the interleaved payload in
one pipeline.

  python tools/run_vlm_pipeline.py --hosts 24 --pages 12 --out /tmp/vlm \
      --seq-budget 256 --shards 8

Re-running with the same --out resumes both ends: the crawl continues
from its round checkpoint and the export skips _SUCCESS-marked shards.
Prints ONE JSON line {urls_fetched, docs_in, packed_rows, n_bins,
shards_written, shards_skipped, sec}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=24)
    ap.add_argument("--pages", type=int, default=12)
    ap.add_argument("--tokens", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seq-budget", type=int, default=256)
    ap.add_argument("--min-doc-tokens", type=int, default=8)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import pyarrow as pa
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from spidey_ray.pipelines.crawl import CrawlEngine
    from spidey_ray.pipelines.export import export_shards, read_shards
    from spidey_ray.pipelines.interleaved import (curate_interleaved,
                                                  normalize_crawl_spans_batch)
    from spidey_ray.sources.synthetic_web import WebConfig
    from spidey_ray.state.politeness import CrawlSettings

    t0 = time.time()

    # ---- 1. crawl (resume-aware, the run_crawl.py discipline) ----
    ckpt = os.path.join(args.out, "crawl")
    web = WebConfig(n_hosts=args.hosts, pages_per_host=args.pages,
                    branching=min(args.pages, 40),
                    tokens_per_page=args.tokens, n_seeds=args.seeds)
    settings = CrawlSettings(round_window=100.0)
    resumable = os.path.isdir(ckpt) and any(
        d.startswith("round=") for d in os.listdir(ckpt))
    if resumable:
        eng = CrawlEngine.resume(ckpt, web, settings,
                                 fetch_concurrency=args.cpus)
    else:
        eng = CrawlEngine(web, settings, ckpt_dir=ckpt,
                          fetch_concurrency=args.cpus)
    res = eng.run()

    # ---- 2. curate the interleave (docs stream from the checkpoint) ----
    docs = res.documents_dataset()
    docs_in = docs.count()
    packed = curate_interleaved(
        docs.map_batches(normalize_crawl_spans_batch,
                         batch_format="pyarrow")
            .map_batches(lambda t: t.select(["crawl_seq", "spans"]),
                         batch_format="pyarrow"),
        id_col="crawl_seq", min_doc_tokens=args.min_doc_tokens,
        seq_budget=args.seq_budget, chunk_budget=args.seq_budget)

    # ---- 3. resumable export (unique key per packed chunk row) ----
    def add_key(t: pa.Table) -> pa.Table:
        key = [f"{s}:{c}" for s, c in zip(t["crawl_seq"].to_pylist(),
                                          t["chunk_id"].to_pylist())]
        return t.append_column("export_id", pa.array(key, type=pa.string()))

    summary = export_shards(
        packed.map_batches(add_key, batch_format="pyarrow"),
        os.path.join(args.out, "shards"), "export_id", args.shards)
    n_bins = (read_shards(os.path.join(args.out, "shards"))
              .to_pandas()["bin_id"].nunique())

    print(json.dumps({
        "urls_fetched": len(res.fetch_log),
        "docs_in": int(docs_in),
        "packed_rows": int(summary["n_rows"].sum()),
        "n_bins": int(n_bins),
        "shards_written": int((~summary["skipped"]).sum()),
        "shards_skipped": int(summary["skipped"].sum()),
        "sec": round(time.time() - t0, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
