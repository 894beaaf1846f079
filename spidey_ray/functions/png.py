"""Pure-stdlib PNG codec (zlib + the five scanline filters, RFC 2083).

Exists so the REAL-pixels branch of the multimodal stages is testable in
environments without Pillow (this sandbox): PNG is just DEFLATE plus a
per-scanline byte predictor, both implementable with ``zlib`` + numpy.
The decoder covers the still-image core an LLM data pipeline actually
meets in practice — 8-bit depth, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), no interlace — and refuses loudly
(``ValueError``) outside it; exotic depths/interlace stay on the Pillow
branch (``stages/multimodal.py``).

The encoder writes any of the five filter types (fixed, or per row), so
round-trip tests exercise every unfilter path against forward-filtered
ground truth.

Reference anchor: the reference repo has no media pipeline at all; this
backs SURVEY §2.11 X12 (multimodal decode plumbing).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield typ, body
        pos += 12 + length  # length + type + body + crc
        if typ == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (h, w, channels); palette images
    are expanded to RGB.  8-bit, non-interlaced only (ValueError else)."""
    if not is_png(data):
        raise ValueError("not a PNG payload (bad signature)")
    ihdr = None
    plte = None
    idat = bytearray()
    for typ, body in _chunks(data):
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace="
            f"{interlace}): only 8-bit non-interlaced is decoded here")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG IDAT length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)   # working copy, headroom for sums

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y]
        if f == 0:                                   # None
            rec = cur
        elif f == 1:                                 # Sub
            # recon[x] = filt[x] + recon[x-ch]: each byte lane mod ch is
            # an independent cumulative sum mod 256 — vectorized
            rec = np.cumsum(cur.reshape(w, ch), axis=0,
                            dtype=np.int64).reshape(stride) % 256
        elif f == 2:                                 # Up
            rec = (cur + prev) % 256
        elif f == 3:                                 # Average
            rec = cur.copy()
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                rec[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:                                 # Paeth
            rec = cur.copy()
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                rec[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)

    px = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def to_gray(px: np.ndarray) -> np.ndarray:
    """(h, w, ch) → (h, w) uint8 integer luma (BT.601 weights, floor —
    deterministic across platforms; alpha is ignored)."""
    if px.ndim == 2:
        return px
    ch = px.shape[2]
    if ch in (1, 2):          # gray / gray+alpha
        return px[:, :, 0]
    p = px.astype(np.int64)
    return ((p[:, :, 0] * 299 + p[:, :, 1] * 587 + p[:, :, 2] * 114)
            // 1000).astype(np.uint8)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def encode_png(px: np.ndarray, filters=0) -> bytes:
    """uint8 array (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA → PNG
    bytes.  ``filters``: one filter type 0-4 for all rows, or a per-row
    sequence — forward filtering is fully vectorized (it reads only
    original bytes), which is exactly why it makes good unfilter-path
    ground truth."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    stride = w * ch
    rows = px.reshape(h, stride).astype(np.int32)
    if isinstance(filters, int):
        filters = [filters] * h
    if len(filters) != h:
        raise ValueError("per-row filters must have one entry per row")

    body = bytearray()
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = rows[y]
        prev = rows[y - 1] if y else zero
        a = np.concatenate((np.zeros(ch, dtype=np.int32), cur[:-ch]))
        b = prev
        c = np.concatenate((np.zeros(ch, dtype=np.int32), prev[:-ch]))
        f = int(filters[y])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - a
        elif f == 2:
            filt = cur - b
        elif f == 3:
            filt = cur - ((a + b) >> 1)
        elif f == 4:
            p = a + b - c
            pa_ = np.abs(p - a)
            pb = np.abs(p - b)
            pc = np.abs(p - c)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                            np.where(pb <= pc, b, c))
            filt = cur - pred
        else:
            raise ValueError(f"bad filter type {f}")
        body.append(f)
        body.extend((filt % 256).astype(np.uint8).tobytes())

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
            + _chunk(b"IEND", b""))
