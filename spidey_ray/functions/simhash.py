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
