"""Ingest: raw crawled page data → the interleaved `documents` table.

The reference's filter stage consumes one JSON object per page,
``{content, encoding, url}`` (backend/Filter.py:43-48), extracted from tar
parts (backend/FilterMain.py:22-54).  A user of the reference switches to
this engine by pointing ``documents_from_pages`` at the same rows (read with
``ray.data.read_json`` / ``from_items`` / any source producing those three
columns); the span parser emits the input_hint table shape
(doc_id, spans, title, crawl_seq).

Exact-URL dedup (urldefrag + first wins, Filter.py:49-51) is left to the
downstream filter pipeline, which needs it anyway; crawl_seq here is the
source row order (the reference's directory enumeration order).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.htmlspans import parse_document, spans_to_pylist
from ..functions.urltools import absolute_url  # noqa: F401 (re-export)
from ..stages.round_stage import DOCS_SCHEMA


def pages_to_documents_batch(batch: pa.Table) -> pa.Table:
    """{content, encoding, url, crawl_seq} rows → documents rows."""
    out = {n: [] for n in DOCS_SCHEMA.names}
    seqs = (
        batch["crawl_seq"].to_pylist()
        if "crawl_seq" in batch.column_names
        else list(range(len(batch)))
    )
    for content, encoding, url, seq in zip(
        batch["content"].to_pylist(),
        batch["encoding"].to_pylist() if "encoding" in batch.column_names
        else [""] * len(batch),
        batch["url"].to_pylist(),
        seqs,
    ):
        from urllib.parse import urldefrag

        url = urldefrag(url)[0]           # Filter.py:49
        doc = parse_document(content, url, encoding or "utf-8")
        out["doc_id"].append(url)
        out["spans"].append(spans_to_pylist(doc.spans))
        out["title"].append(doc.title)
        out["crawl_seq"].append(seq)
    return pa.Table.from_pydict(out, schema=DOCS_SCHEMA)


def documents_from_pages(pages_ds, concurrency: int | None = None):
    """ray.data.Dataset of page rows → Dataset of documents rows."""
    kwargs = dict(batch_format="pyarrow")
    return pages_ds.map_batches(pages_to_documents_batch, **kwargs)
