"""Scale smoke: a 512-host crawl with driver-RSS tracking.

Evidence for the O(round) driver-memory claim (BASELINE.md): run a crawl two
orders of magnitude above test size WITH per-round checkpointing and token
reporting on, sampling the driver's RSS throughout.  Prints one JSON line:

  {"urls", "rounds", "sec", "urls_per_sec", "rss_start_mb", "rss_peak_mb",
   "rss_end_mb", "top_tokens_sec", "resume_sec"}

Flat RSS across rounds + a top-10 token report computed WITHOUT ever
materializing the vocabulary on the driver (EngineResult.top_tokens runs a
distributed fat-bucket aggregation over the checkpointed partials) is the
pass condition; `resume_sec` additionally times a cold resume from the final
checkpoint.

Usage: python tools/smoke_scale.py [--hosts 512] [--pages 1000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssSampler(threading.Thread):
    def __init__(self, interval: float = 0.5):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak = rss_mb()
        self.samples: list[float] = []
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            r = rss_mb()
            self.samples.append(r)
            self.peak = max(self.peak, r)
            self._stop.wait(self.interval)

    def stop(self):
        self._stop.set()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=512)
    ap.add_argument("--pages", type=int, default=1000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--ckpt", default="/tmp/smoke_scale_ckpt")
    args = ap.parse_args()

    import logging

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from spidey_ray.pipelines.crawl import CrawlEngine
    from spidey_ray.sources.synthetic_web import WebConfig
    from spidey_ray.state.politeness import CrawlSettings

    cfg = WebConfig(n_hosts=args.hosts, pages_per_host=args.pages,
                    branching=8, cross_links=2, tokens_per_page=400,
                    n_seeds=args.hosts)
    shutil.rmtree(args.ckpt, ignore_errors=True)

    rss0 = rss_mb()
    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    eng = CrawlEngine(cfg, CrawlSettings(round_window=40.0),
                      ckpt_dir=args.ckpt, n_seen_shards=4, n_host_shards=8,
                      fetch_concurrency=args.cpus, fetch_batch_size=16)
    res = eng.run()
    crawl_sec = time.time() - t0

    # token reporting ON, driver stays O(round): the distributed top-k path
    t1 = time.time()
    top = res.top_tokens(10)
    top_sec = time.time() - t1
    sampler.stop()

    n_urls = res.host_counts()
    n_urls = sum(n_urls.values())

    t2 = time.time()
    resumed = CrawlEngine.resume(args.ckpt, cfg)
    resume_sec = time.time() - t2
    assert resumed.start_round == res.rounds

    print(json.dumps({
        "urls": n_urls,
        "rounds": res.rounds,
        "sec": round(crawl_sec, 2),
        "urls_per_sec": round(n_urls / crawl_sec, 1),
        "rss_start_mb": round(rss0, 1),
        "rss_peak_mb": round(sampler.peak, 1),
        "rss_end_mb": round(rss_mb(), 1),
        "top_tokens_sec": round(top_sec, 2),
        "top_token": top[0][0] if top else None,
        "resume_sec": round(resume_sec, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
