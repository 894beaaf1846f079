"""Training-data curation job entry point: documents parquet in, a
cleaned / quality-gated / LM-gated / near-deduped / mix-rebalanced
corpus out, as partitioned parquet (pipelines/curation.curate — the
composed C4 + Gopher + CCNet-LM + MinHash + mix chain).

  python tools/run_curation.py --input /root/testdata/sf0.01/documents.parquet \
      --out /tmp/curated --decorate-c4 --mix en=0.4,zh=0.15,es=0.15,de=0.15,fr=0.15

``--decorate-c4`` builds punctuated 10-token lines from the flat
synthetic token corpus (the same deterministic decoration the oracle
queries use); real corpora with natural lines skip it.

Prints ONE JSON line: {docs_in, docs_out, sec, out}.
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
    ap.add_argument("--input", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--decorate-c4", action="store_true")
    ap.add_argument("--mix", default=None,
                    help="lang=share,... target proportions (over --mix-key)")
    ap.add_argument("--mix-key", default="lang")
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--lm-min-micro-per-token", type=int, default=-6_000_000)
    ap.add_argument("--max-dup-line-bp", type=int, default=5000)
    ap.add_argument("--max-top-2gram-bp", type=int, default=2500)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from spidey_ray.pipelines.curation import curate
    from spidey_ray.stages.textstats import tokens_of

    shares = None
    if args.mix:
        shares = {k: float(v) for k, v in
                  (kv.split("=") for kv in args.mix.split(","))}

    t0 = time.time()
    docs = ray.data.read_parquet(args.input)
    meta = [c for c in docs.schema().names if c not in ("text",)]
    meta.remove("doc_id")
    docs_in = docs.count()

    if args.decorate_c4:
        def decorate(t: pa.Table) -> pa.Table:
            out = []
            for d, txt in zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist()):
                toks = tokens_of(txt)
                lines = []
                for li in range(max(1, (len(toks) + 9) // 10)):
                    base = toks[li * 10:li * 10 + 10]
                    if (d + li) % 5 == 0:
                        base = base[:2]
                    s = " ".join(base)
                    if (d + li) % 7 == 0:
                        s = "javascript " + s
                    if (d + li) % 4 != 0:
                        s = s + "."
                    lines.append(s)
                out.append("\n".join(lines))
            return t.set_column(t.schema.get_field_index("text"), "text",
                                pa.array(out, type=pa.string()))

        docs = docs.map_batches(decorate, batch_format="pyarrow")

    out = curate(
        docs, meta_cols=meta,
        max_dup_line_bp=args.max_dup_line_bp,
        max_top_2gram_bp=args.max_top_2gram_bp,
        lm_min_micro_per_token=args.lm_min_micro_per_token,
        minhash_threshold=args.minhash_threshold,
        mix_key=args.mix_key if shares else None,
        mix_shares=shares,
    )
    out.write_parquet(args.out)
    n_out = ray.data.read_parquet(args.out).count()
    print(json.dumps({
        "docs_in": docs_in, "docs_out": n_out,
        "sec": round(time.time() - t0, 2), "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
