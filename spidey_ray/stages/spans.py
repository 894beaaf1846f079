"""Analytics over INTERLEAVED text+media span documents — the exact
input shape this engine crawls into (``stages/round_stage.py:SPAN_TYPE``,
the BASELINE input_hint: ``spans: array<struct<kind, text, media_ref,
offset>>``) treated as a first-class queryable column.

``span_stats_batch`` is a pure ``map_batches`` stage that never leaves
Arrow: the nested column is flattened ONCE (``pc.list_flatten`` — an
offset-buffer view, zero copy of the span payloads), per-span predicates
run as Arrow/numpy kernels, and per-doc aggregation is ``np.bincount``
over ``list_parent_indices``.  No Python loop touches a span, so the
stage streams at any scale; media payloads themselves stay out-of-row
(``media_ref`` pointers), exactly how the crawl stores them.

Outputs are integer counts plus one bool, byte-comparable to a SQL
oracle (the ``order_ok`` column asserts the span-sequence ORDER
invariant — offsets strictly increasing — that the reference's
row-for-row span equality check depends on).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def span_stats_batch(batch: pa.Table, spans_col: str = "spans",
                     id_col: str = "doc_id") -> pa.Table:
    """Per-document span-sequence analytics, one row per input doc:

    - ``n_spans`` / ``n_text_spans`` / ``n_media_spans``;
    - ``text_chars``: total characters across text spans;
    - ``n_media_refs``: DISTINCT media_ref values among media spans;
    - ``order_ok``: offsets strictly increasing across the sequence
      (the span-order invariant of the reference equality check).
    """
    col = batch[spans_col].combine_chunks()
    flat = pc.list_flatten(col)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    n = len(batch)
    n_spans = np.bincount(parent, minlength=n).astype(np.int64)

    if len(flat):
        is_text = pc.equal(flat.field("kind"), "text").to_numpy(
            zero_copy_only=False)
        # fill_null before the weights: a null text/offset field would
        # put NaN weights through np.bincount (garbage int64 on cast) —
        # the crawler never emits null span fields, but the operator
        # shouldn't rely on that contract silently
        txt_len = pc.utf8_length(
            pc.fill_null(flat.field("text"), "")).to_numpy(
            zero_copy_only=False)
        off = pc.fill_null(flat.field("offset"), -1).to_numpy(
            zero_copy_only=False)
        n_text = np.bincount(parent[is_text], minlength=n).astype(np.int64)
        text_chars = np.bincount(
            parent, weights=np.where(is_text, txt_len, 0),
            minlength=n).astype(np.int64)
        media = ~is_text
        uniq = pd.DataFrame({
            "p": parent[media],
            "r": flat.field("media_ref").to_pandas()[media],
        }).drop_duplicates()
        n_refs = np.bincount(uniq["p"].to_numpy(),
                             minlength=n).astype(np.int64)
        order_ok = np.ones(n, dtype=bool)
        if len(off) > 1:
            same_doc = parent[1:] == parent[:-1]
            viol = same_doc & (off[1:] <= off[:-1])
            order_ok[parent[1:][viol]] = False
    else:
        n_text = text_chars = n_refs = np.zeros(n, dtype=np.int64)
        order_ok = np.ones(n, dtype=bool)

    return pa.table({
        id_col: batch[id_col],
        "n_spans": pa.array(n_spans),
        "n_text_spans": pa.array(n_text),
        "n_media_spans": pa.array(n_spans - n_text),
        "text_chars": pa.array(text_chars),
        "n_media_refs": pa.array(n_refs),
        "order_ok": pa.array(order_ok),
    })


def explode_media_refs_batch(batch: pa.Table, spans_col: str = "spans",
                             id_col: str = "doc_id") -> pa.Table:
    """Flatten the media side of interleaved docs into a (doc_id,
    media_ref, offset) table — the fan-out step that feeds media
    pipelines (``stages/multimodal.py``) from crawled span documents.
    Pure Arrow: list_flatten + a boolean filter, no per-span Python."""
    col = batch[spans_col].combine_chunks()
    flat = pc.list_flatten(col)
    parent = pc.list_parent_indices(col)
    ids = batch[id_col].take(parent)
    media = pc.invert(pc.equal(flat.field("kind"), "text"))
    return pa.table({
        id_col: pc.filter(ids.combine_chunks(), media),
        "media_ref": pc.filter(flat.field("media_ref"), media),
        "offset": pc.filter(flat.field("offset"), media),
    })
