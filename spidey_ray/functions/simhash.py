"""Stable 64-bit simhash footprints + similarity.

Reference semantics: 64-bit simhash over a token-frequency dict, +freq when
the token-hash bit is 1 else -freq, sign -> bit
(backend/crawler/scraper.py:327-344; duplicate logic backend/Filter.py:24-40),
compared by fraction of equal bits plus min/max token-length ratio
(backend/crawler/scraper.py:308-323).

The reference feeds Python's salted ``hash()`` (scraper.py:333) so its
footprints are not reproducible across processes (SURVEY.md §7.5.1).  The
rebuild replaces it with the first 8 bytes of sha1(token) — stable across
processes and machines — shared by the serial oracle so golden outputs are
deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np


def token_hash64(token: str) -> int:
    """Stable unsigned 64-bit token hash (first 8 bytes of sha1)."""
    return int.from_bytes(hashlib.sha1(token.encode("utf-8")).digest()[:8], "big")


# worker-local token→hash cache: vocabulary is Zipfian, so most tokens
# repeat across a worker's batches; bounded so a worker never holds an
# unbounded vocabulary (same policy as the sign-matrix cache below)
_TOKEN_H64: dict[str, int] = {}
_TOKEN_H64_MAX = 1 << 20


def token_hash64_cached(token: str) -> int:
    h = _TOKEN_H64.get(token)
    if h is None:
        if len(_TOKEN_H64) >= _TOKEN_H64_MAX:
            _TOKEN_H64.clear()
        h = _TOKEN_H64[token] = token_hash64(token)
    return h


# The ±1 sign row of a token IS the bit pattern of its 64-bit hash
# (bit→+1, 0→−1, MSB-first), so the old token→sign-matrix cache was a
# second copy of ``_TOKEN_H64`` in disguise.  simhash64 now gathers the
# cached uint64 hashes with a C-level ``map`` (no per-token Python frame
# — the 1M+ ``_sign_index`` calls per bench round were ~20% of the crawl
# parse stage) and unpacks bits with one vectorized shift.  Eviction
# mid-gather is harmless by construction here: hash VALUES are immutable
# copies, unlike the old matrix row indices.
_BIT_SHIFTS = np.arange(63, -1, -1, dtype=np.uint64)   # MSB-first


def simhash64(freq: dict[str, int]) -> int:
    """64-bit simhash of a token-frequency dict; bit j is the MSB-first
    position, matching the reference's ``format(hash(i), '0>64b')`` layout.
    vector_j = Σ count·(+1 if bit_j else -1), computed as one int8 matmul
    over the unpacked hash bits: counts@bits*2 − Σcounts."""
    if not freq:
        return 0
    keys = list(freq.keys())
    n = len(keys)
    try:
        h = np.fromiter(map(_TOKEN_H64.__getitem__, keys),
                        dtype=np.uint64, count=n)
    except KeyError:
        # first sighting of some tokens on this worker: fill the shared
        # hash cache (Zipfian vocab → this path vanishes after warmup)
        if len(_TOKEN_H64) + n >= _TOKEN_H64_MAX:
            _TOKEN_H64.clear()
        for t in keys:
            if t not in _TOKEN_H64:
                _TOKEN_H64[t] = token_hash64(t)
        h = np.fromiter(map(_TOKEN_H64.__getitem__, keys),
                        dtype=np.uint64, count=n)
    bits = ((h[:, None] >> _BIT_SHIFTS) & np.uint64(1)).astype(np.int8)
    counts = np.fromiter(freq.values(), dtype=np.int64, count=n)
    vector = 2 * (counts @ bits) - counts.sum()
    out = (vector >= 1).astype(np.uint8)
    return int.from_bytes(np.packbits(out).tobytes(), "big")


def simhash64_block(token_lists: list[list[str]]) -> np.ndarray:
    """Vectorized simhash64 for a BLOCK of token lists (uint64 array, one
    hash per doc), byte-identical to ``simhash64(Counter(tokens))`` per doc
    (property-tested).  One pandas factorize + one sha1 per distinct token
    + cache-sized segment-sums over the flat occurrence stream replaces the
    per-doc Counter + matmul (measured 1.2× at 800-token docs, 1.5× at
    40-token docs — the win is the removed per-doc Python frames).

    vector_j(doc) = Σ_occurrences (2·bit_j − 1) = 2·S_j − n_tokens, so
    per-token counts never need materializing: S is a plain segment sum of
    the unpacked hash bits over each doc's occurrence run.  The occurrence
    gather is chunked at 16 Ki tokens (1 MiB of int16 lanes — L2-resident;
    64 KiB-token int16 chunks measured 1.6× slower, the original 256 Ki
    int32 chunks 6×) and runs split only at doc boundaries; a single doc
    longer than 32 Ki tokens would overflow an int16 segment sum, so such
    runs gather as int32.
    """
    import pandas as pd

    ndocs = len(token_lists)
    out = np.zeros(ndocs, dtype=np.uint64)
    if ndocs == 0:
        return out
    lens = np.fromiter((len(t) for t in token_lists),
                       dtype=np.int64, count=ndocs)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.empty(total, dtype=object)
    i = 0
    for toks in token_lists:
        flat[i:i + len(toks)] = toks
        i += len(toks)
    codes, uniques = pd.factorize(flat, sort=False)
    hu = np.fromiter(map(token_hash64_cached, uniques),
                     dtype=np.uint64, count=len(uniques))
    bits16 = ((hu[:, None] >> _BIT_SHIFTS) & np.uint64(1)).astype(np.int16)
    starts = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    S = np.zeros((ndocs, 64), dtype=np.int64)
    CHUNK = 1 << 14
    d = 0
    while d < ndocs:
        e, run = d, 0
        while e < ndocs and (run == 0 or run + lens[e] <= CHUNK):
            run += int(lens[e])
            e += 1
        if run:
            pos = int(starts[d])
            src = bits16 if run <= 32767 else bits16.astype(np.int32)
            seg = src[codes[pos:pos + run]]
            ne = np.nonzero(lens[d:e] > 0)[0]
            # consecutive non-empty starts bound the segments exactly:
            # empty docs between them contribute zero tokens
            S[d + ne] = np.add.reduceat(seg, starts[d:e][ne] - pos, axis=0)
        d = e
    vector = 2 * S - lens[:, None]
    packed = np.packbits((vector >= 1).astype(np.uint8), axis=1)
    return packed.view(">u8").ravel().astype(np.uint64)


def simhash_from_tokens(tokens: list[str]) -> tuple[int, int]:
    """(simhash, n_tokens) footprint (scraper.py:327-344)."""
    from collections import Counter

    return simhash64(Counter(tokens)), len(tokens)


def bit_similarity(h1: int, h2: int) -> float:
    """Fraction of equal bits out of 64 (scraper.py:308-318)."""
    return (64 - (h1 ^ h2).bit_count()) / 64.0


def length_ratio(n1: int, n2: int) -> float:
    return min(n1, n2) / max(n1, n2) if max(n1, n2) else 1.0


def footprints_similar(
    h1: int, n1: int, h2: int, n2: int, bit_thresh: float, len_thresh: float
) -> bool:
    """Strict-inequality thresholds, as the reference compares with ``>``
    (scraper.py:465,475; Filter.py:107)."""
    return bit_similarity(h1, h2) > bit_thresh and length_ratio(n1, n2) > len_thresh


def hamming_popcount(xor: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    v = xor.copy()
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((v * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
