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


# token → row INDEX into one contiguous ±1 sign matrix (int8[·,64],
# MSB-first); vocabulary is Zipfian so the cache hit rate is high across
# pages within a worker process.  A single growable matrix + fancy-index
# gather replaces the old per-call ``np.stack`` of many tiny cached arrays
# — that stack was the dominant allocation in the crawl parse hot path and
# a memory-bandwidth consumer at high worker counts (BASELINE.md 8→32 note).
_SIGN_INDEX: dict[str, int] = {}
_SIGN_MATRIX: np.ndarray = np.empty((1024, 64), dtype=np.int8)
_SIGN_CACHE_MAX = 1 << 20


def _maybe_reset_sign_cache() -> None:
    """Evict the cache ONLY between documents.  A reset inside the
    ``simhash64`` gather loop would swap ``_SIGN_MATRIX`` out from under
    indices already collected against the old matrix (growth is safe — it
    copies existing rows — eviction is not)."""
    global _SIGN_MATRIX
    if len(_SIGN_INDEX) >= _SIGN_CACHE_MAX:
        _SIGN_INDEX.clear()
        _SIGN_MATRIX = np.empty((1024, 64), dtype=np.int8)


def _sign_index(token: str) -> int:
    idx = _SIGN_INDEX.get(token)
    if idx is None:
        global _SIGN_MATRIX
        idx = len(_SIGN_INDEX)
        if idx >= len(_SIGN_MATRIX):
            grown = np.empty((len(_SIGN_MATRIX) * 2, 64), dtype=np.int8)
            grown[:len(_SIGN_MATRIX)] = _SIGN_MATRIX
            _SIGN_MATRIX = grown
        h = hashlib.sha1(token.encode("utf-8")).digest()[:8]
        bits = np.unpackbits(np.frombuffer(h, dtype=np.uint8))  # MSB-first
        _SIGN_MATRIX[idx] = bits.astype(np.int8) * 2 - 1        # bit→+1, 0→-1
        _SIGN_INDEX[token] = idx
    return idx


def simhash64(freq: dict[str, int]) -> int:
    """64-bit simhash of a token-frequency dict; bit j is the MSB-first
    position, matching the reference's ``format(hash(i), '0>64b')`` layout.
    vector_j = Σ count·(+1 if bit_j else -1); one matmul over gathered rows."""
    if not freq:
        return 0
    _maybe_reset_sign_cache()
    idx = np.fromiter((_sign_index(t) for t in freq), dtype=np.int64,
                      count=len(freq))
    counts = np.fromiter(freq.values(), dtype=np.int64, count=len(freq))
    vector = counts @ _SIGN_MATRIX[idx]
    bits = (vector >= 1).astype(np.uint8)
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def simhash_from_tokens(tokens: list[str]) -> tuple[int, int]:
    """(simhash, n_tokens) footprint (scraper.py:327-344)."""
    from collections import Counter

    return simhash64(Counter(tokens)), len(tokens)


def bit_similarity(h1: int, h2: int) -> float:
    """Fraction of equal bits out of 64 (scraper.py:308-318)."""
    return (64 - int(bin(h1 ^ h2).count("1"))) / 64.0


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
