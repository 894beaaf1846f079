"""Sketch operators for corpus-scale aggregation: HyperLogLog distinct
counting (Flajolet et al. '07, with the small-range linear-counting
correction).

Shape: each batch folds its values into one 2^p-byte register array
(``map_batches`` emitting ONE packed row per block); register arrays merge
associatively by elementwise max, so the driver-side merge is O(blocks ×
16 KB) regardless of cardinality — the exact-distinct ``groupby`` this
replaces is an all-to-all shuffle of every distinct value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_HASH_KEY = "spidey-hll-00000"  # fixed: deterministic across workers


def _hll_hash(values: pd.Series) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False, hash_key=_HASH_KEY,
                                   categorize=False)
    return h.to_numpy(dtype=np.uint64)


def hll_partial_batch(batch: pa.Table, col: str, p: int = 14) -> pa.Table:
    """One packed register row per block: registers[j] = max rank of the
    hashes landing in bucket j (rank = leading-zeros-of-suffix + 1)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(batch):
        h = _hll_hash(batch.select([col]).to_pandas()[col])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)          # suffix shifted to the top
        # rank: position of the first 1-bit in w (1-based), 64-p+1 if w==0
        rank = np.zeros(len(h), dtype=np.uint8)
        nz = w != 0
        # count leading zeros via float trick is lossy; do it in integer steps
        ww = w[nz]
        lz = np.full(len(ww), 0, dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = ww < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            ww = np.where(mask, ww << np.uint64(shift), ww)
        rank[nz] = lz + 1
        rank[~nz] = 64 - p + 1
        np.maximum.at(regs, idx, rank)
    return pa.table({
        "p": pa.array([p], type=pa.int32()),
        "registers": pa.array([regs.tolist()], type=pa.list_(pa.uint8())),
    })


def merge_registers(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for r in parts[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)        # linear counting, small range
    return float(est)


def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 14) -> int:
    """Approximate COUNT(DISTINCT col): ±~0.8% at p=14 (16 KB state)."""
    parts = ds.map_batches(
        hll_partial_batch, fn_kwargs={"col": col, "p": p},
        batch_format="pyarrow",
    ).to_pandas()
    if not len(parts):
        return 0
    regs = merge_registers(
        [np.asarray(r, dtype=np.uint8) for r in parts["registers"]])
    return round(hll_estimate(regs, p))
