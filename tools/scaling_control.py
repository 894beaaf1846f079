"""Bare-Ray scaling CONTROL for the N→4N efficiency criterion.

Runs the same CPU-shaped work as the crawl's fused round stage (synthetic
fetch + span parse + tokenize + simhash over the bench web's pages) as plain
``@ray.remote`` tasks with ZERO engine code — no frontier, no politeness, no
checkpoints, no round barrier.  Whatever efficiency THIS measures at a given
CPU pair is this machine's ceiling for pure compute; the engine's measured
efficiency should be compared against it, not against 1.0 (BASELINE.md:
hypervisor steal and the single socket's memory bandwidth cap the ceiling
well below ideal on this VM).

Usage: python tools/scaling_control.py [lo hi]   (defaults 4 16)
Prints one JSON line: {"cpus_lo", "sec_lo", "cpus_hi", "sec_hi", "eff"}.
Each level runs in a fresh Ray session in a fresh subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = 24_000
BATCH = 250
# page shape mirrors bench.py's BENCH_WEB exactly (256 hosts × 400 pages,
# branching 400, 1600 tokens/page) — a control with lighter pages would
# overstate the ceiling: heavier per-page compute hides memory-bandwidth
# contention that the real bench pages do feel
PAGE_CFG = dict(n_hosts=256, pages_per_host=400, branching=400,
                cross_links=2, tokens_per_page=1600, n_seeds=256)


def _level(num_cpus: int) -> float:
    import time

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")

    @ray.remote
    def parse_batch(start: int, n: int) -> int:
        from spidey_ray.functions.htmlspans import parse_document
        from spidey_ray.functions.simhash import simhash_from_tokens
        from spidey_ray.functions.tokenize import crawl_tokenize
        from spidey_ray.sources import synthetic_web as sw

        cfg = sw.WebConfig(**PAGE_CFG)
        total = 0
        for i in range(start, start + n):
            url = f"https://h{i % 256}.example.com/p/{i // 256 % 400}"
            page = sw.fetch(cfg, url)
            doc = parse_document(page.content, url, "utf-8")
            toks = crawl_tokenize(" ".join(s.text for s in doc.spans))
            simhash_from_tokens(toks)
            total += len(toks)
        return total

    # warmup: spin up the worker pool untimed
    ray.get([parse_batch.remote(0, BATCH) for _ in range(num_cpus)])
    t0 = time.time()
    def _stat():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(v), v[7] if len(v) > 7 else 0

    t_0, s_0 = _stat()
    refs = [parse_batch.remote(s, BATCH) for s in range(0, N_PAGES, BATCH)]
    ray.get(refs)
    sec = time.time() - t0
    t_1, s_1 = _stat()
    ray.shutdown()
    return sec, round(100.0 * (s_1 - s_0) / max(1, t_1 - t_0), 2)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--level":
        sec, steal = _level(int(sys.argv[2]))
        print(json.dumps({"sec": sec, "steal_pct": steal}))
        return
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    secs, steals = {}, {}
    for cpus in (lo, hi):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", str(cpus)],
            capture_output=True, text=True, check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        secs[cpus], steals[cpus] = r["sec"], r["steal_pct"]
    eff = (secs[lo] / secs[hi]) / (hi / lo)
    print(json.dumps({
        "cpus_lo": lo, "sec_lo": round(secs[lo], 2),
        "cpus_hi": hi, "sec_hi": round(secs[hi], 2),
        "steal_lo_pct": steals[lo], "steal_hi_pct": steals[hi],
        "eff": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
