"""Interleaved (VLM) curation: the composed pipeline over text+media span
documents — the axis-B counterpart of ``pipelines/curation.py``'s flat-text
recipe, built from the span operator family:

    cross-doc media dedup (keep-first, in the interleave)
      → per-span text gate (drop empty / sub-minimum text spans,
        drop docs whose total text budget is too small)
      → render for the tokenizer (text + media placeholders,
        integer sequence cost: media spans charge a fixed
        patch-token budget)
      → FFD packing into fixed-budget training sequences

Composition rules (the lessons the flat pipeline's round-4 verdict paid
for, applied from the start):

- the input is persisted ONCE before the media dedup consumes it twice
  (candidate exchange + rewrite) — the upstream chain never re-executes;
- every per-doc step is one fused ``map_batches`` stage over the nested
  Arrow column (flat-mask + vectorized list rebuild, no per-span Python);
- the only exchange is the one the semantics force: the media-ref
  keep-first bucketing inside ``strip_duplicate_media_spans``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.contamination import pack_by_cost
from ..stages.spans import (_flat_with_pos, _rebuild_spans,
                            _whitespace_word_counts, chunk_interleaved_batch,
                            spans_to_text_batch,
                            strip_duplicate_media_spans)
from .curation import _persist


def normalize_crawl_spans_batch(batch: pa.Table,
                                spans_col: str = "spans") -> pa.Table:
    """Adapt CRAWLED span docs to the input_hint interleave the VLM
    operator family consumes: the crawler emits kind = parent tag for
    visible text, 'link' for anchors, 'media' for img/video/audio/embed
    (functions/htmlspans.py:121,125,141); here media spans become
    ``kind='image'`` (text cleared, media_ref kept) and everything else
    becomes ``kind='text'`` carrying its visible text (anchor text
    included — the OBELICS convention) with media_ref cleared.  Pure
    Arrow kernels over the flattened column; the list layout is reused
    verbatim (same offsets, zero per-span Python)."""
    col = batch[spans_col].combine_chunks()
    flat = pc.list_flatten(col)
    is_media = pc.equal(pc.fill_null(flat.field("kind"), ""), "media")
    kind = pc.if_else(is_media, "image", "text")
    text = pc.if_else(is_media, "", pc.fill_null(flat.field("text"), ""))
    ref = pc.if_else(is_media,
                     pc.fill_null(flat.field("media_ref"), ""), "")
    new_flat = pa.StructArray.from_arrays(
        [kind, text, ref, flat.field("offset")],
        names=["kind", "text", "media_ref", "offset"])
    spans_arr = pa.ListArray.from_arrays(col.offsets, new_flat)
    out = {c: batch[c] for c in batch.column_names}
    out[spans_col] = spans_arr
    return pa.table(out)


def gate_text_spans_batch(batch: pa.Table, spans_col: str = "spans",
                          id_col: str = "doc_id",
                          min_span_tokens: int = 1,
                          min_doc_tokens: int = 8) -> pa.Table:
    """Per-span text gate, in place in the interleave: text spans with
    fewer than ``min_span_tokens`` whitespace tokens are removed (media
    spans always survive this gate), then docs whose REMAINING text-token
    total is under ``min_doc_tokens`` are dropped entirely.  One flat
    pass: token counts and the keep mask are Arrow/numpy kernels, the
    list rebuild is the shared vectorized helper."""
    col = batch[spans_col].combine_chunks()
    flat, parent, _pos, _lens = _flat_with_pos(col)
    n = len(batch)
    if len(flat):
        is_text = pc.equal(flat.field("kind"), "text").to_numpy(
            zero_copy_only=False)
        txt = pc.fill_null(flat.field("text"), "")
        # whitespace-word metric (str.split() semantics) — the same count
        # spans_to_text_batch charges the packing budget with, so the
        # gate and the budget agree on every span
        toks = _whitespace_word_counts(txt)
        keep = ~is_text | (toks >= min_span_tokens)
        spans_arr, _dropped = _rebuild_spans(col, keep, n)
        doc_tokens = np.bincount(
            parent, weights=np.where(keep & is_text, toks, 0),
            minlength=n).astype(np.int64)
    else:
        spans_arr = col
        doc_tokens = np.zeros(n, dtype=np.int64)
    out = pa.table({
        id_col: batch[id_col],
        spans_col: spans_arr,
        "n_text_tokens": pa.array(doc_tokens),
    })
    return out.filter(pa.array(doc_tokens >= min_doc_tokens))


def curate_interleaved(docs: "ray.data.Dataset", *,
                       spans_col: str = "spans", id_col: str = "doc_id",
                       min_span_tokens: int = 1, min_doc_tokens: int = 8,
                       media_token: str = "<|image|>",
                       media_tokens: int = 4,
                       seq_budget: int = 1024,
                       chunk_budget: int | None = None,
                       checkpoint_dir: str | None = None
                       ) -> "ray.data.Dataset":
    """The composed interleaved pipeline; returns packed training rows
    (doc_id, rendered_text, n_text_tokens, n_media_spans, n_positions,
    bin_id, bin_fill) — every doc assigned to a ``seq_budget``-capped
    sequence bin, media spans costing ``media_tokens`` positions each.

    ``chunk_budget`` (typically ``= seq_budget``) splits docs LONGER than
    the budget into span-boundary chunks before rendering
    (``chunk_interleaved_batch``), so every packed item fits and no bin
    can exceed ``seq_budget`` — without it, an over-budget doc rides into
    FFD whole and lands alone in an over-budget bin.  Chunked rows carry
    ``chunk_id`` (0 for unsplit docs)."""
    docs = _persist(docs, checkpoint_dir, "interleaved_in")
    deduped = strip_duplicate_media_spans(
        docs, spans_col=spans_col, id_col=id_col)

    def gate(t: pa.Table) -> pa.Table:
        return gate_text_spans_batch(
            t.select([id_col, spans_col]), spans_col=spans_col,
            id_col=id_col, min_span_tokens=min_span_tokens,
            min_doc_tokens=min_doc_tokens)

    gated = deduped.map_batches(gate, batch_format="pyarrow")

    if chunk_budget is not None:
        def chunk(t: pa.Table) -> pa.Table:
            return chunk_interleaved_batch(
                t.select([id_col, spans_col]), spans_col=spans_col,
                id_col=id_col, budget=chunk_budget,
                media_tokens=media_tokens)

        gated = gated.map_batches(chunk, batch_format="pyarrow")

    def render(t: pa.Table) -> pa.Table:
        r = spans_to_text_batch(
            t.select([id_col, spans_col]), spans_col=spans_col,
            id_col=id_col, media_token=media_token,
            media_tokens=media_tokens)
        if "chunk_id" in t.column_names:
            r = r.append_column("chunk_id", t["chunk_id"])
        return r

    rendered = gated.map_batches(render, batch_format="pyarrow")
    return pack_by_cost(rendered, seq_budget, "n_positions", id_col=id_col)
