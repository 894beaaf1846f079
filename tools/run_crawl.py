"""Crawl job entry point — the `ray job submit` surface of the engine.

On a real cluster:
  ray job submit --working-dir . -- python tools/run_crawl.py \
      --hosts 256 --pages 120 --ckpt /shared/ckpt --cpus 32

In this sandbox it runs against a local session. Resumes automatically from
the last complete round checkpoint when --ckpt already has one (north_rule
resumability); use --restart to wipe and start from the seeds, mirroring the
reference's --restart flag (backend/crawler/launch.py:9-15).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--pages", type=int, default=40)
    ap.add_argument("--tokens", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--ckpt", default="/tmp/spidey_ray_crawl")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    ap.add_argument("--seen-shards", type=int, default=4)
    ap.add_argument("--host-shards", type=int, default=4)
    ap.add_argument("--window", type=float, default=100.0)
    ap.add_argument("--max-rounds", type=int, default=None)
    ap.add_argument("--restart", action="store_true",
                    help="wipe the checkpoint and start from the seeds")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")

    from spidey_ray.pipelines.crawl import CrawlEngine
    from spidey_ray.sources.synthetic_web import WebConfig
    from spidey_ray.state.politeness import CrawlSettings

    web = WebConfig(n_hosts=args.hosts, pages_per_host=args.pages,
                    branching=min(args.pages, 40), tokens_per_page=args.tokens,
                    n_seeds=args.seeds)
    settings = CrawlSettings(round_window=args.window)

    if args.restart:
        shutil.rmtree(args.ckpt, ignore_errors=True)
    resumable = os.path.isdir(args.ckpt) and any(
        d.startswith("round=") for d in os.listdir(args.ckpt))
    kwargs = dict(n_seen_shards=args.seen_shards, n_host_shards=args.host_shards,
                  fetch_concurrency=args.cpus)
    if resumable:
        eng = CrawlEngine.resume(args.ckpt, web, settings, **kwargs)
        print(f"resuming from round {eng.start_round}", file=sys.stderr)
    else:
        eng = CrawlEngine(web, settings, ckpt_dir=args.ckpt, **kwargs)

    t0 = time.time()
    res = eng.run(max_rounds=args.max_rounds)
    elapsed = time.time() - t0
    print(json.dumps({
        "urls_fetched": len(res.fetch_log),
        "rounds": res.rounds,
        "unique_pages": res.gate.unique_url_count,
        "sec": round(elapsed, 2),
        "urls_per_sec": round(len(res.fetch_log) / max(elapsed, 1e-9), 1),
        "ckpt": args.ckpt,
        "top_tokens": res.top_tokens(10),
        "host_counts": dict(sorted(res.host_counts().items())[:10]),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
