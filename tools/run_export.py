"""Resumable sharded-export job entry point: any parquet table in, N
deterministic shuffle shards out (pipelines/export.export_shards —
``shard=NNNNN/part.parquet`` + ``_SUCCESS`` per shard; re-runs skip
finished shards and complete missing ones byte-identically).

  python tools/run_export.py --input /root/testdata/sf0.01/documents.parquet \
      --out /tmp/export --shards 16 --id-col doc_id

Prints ONE JSON line: {shards_written, shards_skipped, rows, sec, out}.
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
    ap.add_argument("--input",
                    default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--seed", default="42")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from spidey_ray.pipelines.export import export_shards

    t0 = time.time()
    summary = export_shards(ray.data.read_parquet(args.input), args.out,
                            args.id_col, args.shards, seed=args.seed)
    print(json.dumps({
        "shards_written": int((~summary["skipped"]).sum()),
        "shards_skipped": int(summary["skipped"].sum()),
        "rows": int(summary["n_rows"].sum()),
        "sec": round(time.time() - t0, 2),
        "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
