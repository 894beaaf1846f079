"""Benchmark decontamination + sequence packing — the two training-data
curation steps between dedup and tokenization in an LLM data pipeline.

- :func:`decontaminate`: GPT-3-appendix-C-style n-gram overlap filtering
  (Brown et al. 2020 used 13-grams; The Pile / Llama reports follow the
  same shape): drop or flag every training document that shares at least
  one n-token shingle with an evaluation/benchmark corpus.
- :func:`pack_sequences`: greedy first-fit-decreasing packing of documents
  into fixed token-budget bins (context windows), partition-local — the
  standard distributed approximation (bins never span partitions, so no
  shuffle is needed at all).

Scale posture: the BENCHMARK side is the small side by definition (eval
sets are thousands of documents, not billions) — its shingle-hash set is
built distributed, then ``ray.put`` ONCE and probed per batch with a
binary search (never re-shipped per batch, never a shuffle).  The
training side streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dedup import shingle_hashes
from .textstats import tokens_of


def _benchmark_shingles(benchmark: "ray.data.Dataset", n: int,
                        text_col: str) -> np.ndarray:
    """Sorted unique n-gram hashes of the benchmark corpus (distributed
    shingling; only the deduplicated uint64 hashes reach the driver)."""

    def sh_batch(batch: pa.Table) -> pa.Table:
        hs = [shingle_hashes(t, n) for t in batch[text_col].to_pylist()]
        merged = (np.unique(np.concatenate(hs)) if hs
                  else np.empty(0, dtype=np.uint64))
        return pa.table({"sh": pa.array(merged, type=pa.uint64())})

    parts = benchmark.map_batches(sh_batch, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return np.empty(0, dtype=np.uint64)
    return np.unique(parts["sh"].to_numpy().astype(np.uint64))


def contamination_report(ds: "ray.data.Dataset",
                         benchmark: "ray.data.Dataset", n: int = 13,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document contamination counts: (id, n_shingles, n_contaminated).

    A document's shingle hashes are probed against the broadcast benchmark
    set with one vectorized searchsorted per doc."""
    bench = _benchmark_shingles(benchmark, n, text_col)
    ref = ray.put(bench)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids, n_sh, n_hit = [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            sh = shingle_hashes(t, n)
            if len(m):
                pos = np.searchsorted(m, sh)
                pos[pos == len(m)] = 0
                hits = int((m[pos] == sh).sum())
            else:
                hits = 0
            ids.append(i)
            n_sh.append(len(sh))
            n_hit.append(hits)
        return pa.table({
            id_col: pa.array(ids),
            "n_shingles": pa.array(n_sh, type=pa.int64()),
            "n_contaminated": pa.array(n_hit, type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def decontaminate(ds: "ray.data.Dataset", benchmark: "ray.data.Dataset",
                  n: int = 13, text_col: str = "text",
                  max_hits: int = 0) -> "ray.data.Dataset":
    """Drop every training document sharing more than ``max_hits``
    n-token shingles with the benchmark corpus (``max_hits=0`` = the
    GPT-3 rule: any overlap disqualifies)."""
    bench = _benchmark_shingles(benchmark, n, text_col)
    ref = ray.put(bench)

    def keep(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        if not len(m):
            return batch
        mask = []
        for t in batch[text_col].to_pylist():
            sh = shingle_hashes(t, n)
            pos = np.searchsorted(m, sh)
            pos[pos == len(m)] = 0
            mask.append(int((m[pos] == sh).sum()) <= max_hits)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(ds: "ray.data.Dataset", max_tokens: int,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    """Greedy first-fit-decreasing packing of documents into token-budget
    bins: (bin_id, doc_id, n_tokens, bin_fill).

    Packing runs PER BLOCK (first-fit-decreasing inside each batch; bins
    never span blocks) — the standard distributed approximation: FFD is
    within 11/9·OPT+1 bins of optimal per partition, and cross-partition
    packing would need a global shuffle for a ~1% fill gain.  bin_id is
    ``(min_block_doc_id << 21) | local_bin``: blocks partition the rows, so
    the minimum id of a block is unique across blocks and the bin ids are
    EXACTLY globally unique (for integer ids < 2^42 and < 2^21 bins per
    block — both checked; a 100 TB corpus is ~10^11 docs and Ray blocks are
    ≪ 2M rows).  Non-integer ids fall back to a full-32-bit crc32 tag
    shifted clear of local_bin — unique only up to crc collisions across
    blocks (birthday bound ~65k blocks), stated here rather than claimed
    away.  Documents longer than ``max_tokens`` become singleton oversized
    bins (flagged via ``bin_fill > max_tokens``) — truncation policy
    belongs to the tokenizer stage, not the packer."""

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        counts = np.fromiter(
            (len(tokens_of(t)) for t in batch[text_col].to_pylist()),
            dtype=np.int64, count=len(ids))
        bin_ids, fills = ffd_assign_block(ids, counts, max_tokens)
        return pa.table({
            "bin_id": pa.array(bin_ids, type=pa.int64()),
            id_col: batch[id_col],
            "n_tokens": pa.array(counts, type=pa.int64()),
            "bin_fill": pa.array(fills, type=pa.int64()),
        })

    return ds.map_batches(pack, batch_format="pyarrow")


def ffd_assign_block(ids: list, counts: np.ndarray, max_tokens: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """The per-block FFD core of :func:`pack_sequences`: returns
    (globally-unique bin_id, bin_fill) per row — shared by the flat-text
    packer above and the interleaved cost packer
    (:func:`pack_by_cost`)."""
    order = np.argsort(-counts, kind="stable")          # FFD: biggest first
    bins_fill: list[int] = []
    assign = np.empty(len(ids), dtype=np.int64)
    for k in order:
        c = int(counts[k])
        placed = False
        for b, fill in enumerate(bins_fill):            # first fit
            if fill + c <= max_tokens:
                bins_fill[b] = fill + c
                assign[k] = b
                placed = True
                break
        if not placed:
            assign[k] = len(bins_fill)
            bins_fill.append(c)
    # block-unique prefix: the block's min id (blocks partition rows, so
    # this is exact); crc32 fallback for non-integer id columns
    n_bins = len(bins_fill)
    if n_bins >= 1 << 21:
        raise ValueError(
            f"pack_sequences: {n_bins} bins in one block overflows the "
            "21-bit local_bin field — reduce the block/batch size")
    if ids and all(isinstance(i, int) for i in ids):
        tag = min(ids)
        if not 0 <= tag < 1 << 42:
            raise ValueError(
                f"pack_sequences: doc id {tag} outside [0, 2^42) — "
                "bin_id packing needs a narrower id space")
        base = np.int64(tag) << np.int64(21)
    else:
        import zlib

        tag = zlib.crc32(",".join(map(str, ids)).encode()) & 0xFFFFFFFF
        base = np.int64(tag) << np.int64(21)
    fills = np.fromiter((bins_fill[a] for a in assign), dtype=np.int64,
                        count=len(ids))
    return base + assign, fills


def pack_by_cost(ds: "ray.data.Dataset", max_tokens: int,
                 cost_col: str, id_col: str = "doc_id") -> "ray.data.Dataset":
    """:func:`pack_sequences` over a PRECOMPUTED integer cost column
    (e.g. the interleaved render's ``n_positions``, where media spans
    charge a fixed patch-token budget); all input columns are carried
    through with ``bin_id`` / ``bin_fill`` appended."""

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        counts = batch[cost_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        bin_ids, fills = ffd_assign_block(ids, counts, max_tokens)
        return (batch
                .append_column("bin_id", pa.array(bin_ids, type=pa.int64()))
                .append_column("bin_fill", pa.array(fills, type=pa.int64())))

    return ds.map_batches(pack, batch_format="pyarrow")
