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


# ---------------------------------------------------------------------------
# tar-part page-data readers (reference FilterMain.py:22-54: `cat
# data.tar.gz-part* > data.tar.gz`, extract, rglob('*.json'))
# ---------------------------------------------------------------------------

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("content", pa.string()),
    ("encoding", pa.string()),
    ("crawl_seq", pa.int64()),
])


def _page_row(data: dict) -> tuple[str, str, str]:
    return (data.get("url", ""), data.get("content", "") or "",
            data.get("encoding", "") or "utf-8")


def iter_tar_pages(part_paths: list[str]):
    """Stream page dicts out of split tar parts WITHOUT materializing the
    joined archive (the reference shells out to ``cat part* > data.tar.gz``
    and extracts to disk, FilterMain.py:33-41; the parts are byte-slices of
    ONE gzip stream, so they must be read as a single sequential stream)."""
    import io
    import json
    import tarfile

    class _Chain(io.RawIOBase):
        def __init__(self, paths):
            self.paths = list(paths)
            self.i = 0
            self.f = open(self.paths[0], "rb") if self.paths else None

        def readable(self):
            return True

        def readinto(self, b):
            while self.f is not None:
                n = self.f.readinto(b)
                if n:
                    return n
                self.f.close()
                self.i += 1
                if self.i >= len(self.paths):
                    self.f = None
                    return 0
                self.f = open(self.paths[self.i], "rb")
            return 0

    with tarfile.open(fileobj=io.BufferedReader(_Chain(part_paths)),
                      mode="r|gz") as tar:
        for member in tar:
            if not member.isfile() or not member.name.endswith(".json"):
                continue
            f = tar.extractfile(member)
            if f is None:
                continue
            try:
                yield json.loads(f.read().decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                continue


def read_tar_parts(parts_glob: str, rows_per_block: int = 512) -> "ray.data.Dataset":
    """``data.tar.gz-part*`` → Dataset of page rows (url, content, encoding,
    crawl_seq).  The single gzip stream forces a sequential READ, but blocks
    are handed to Ray as they fill so parsing downstream runs in parallel.
    crawl_seq is tar member order (the reference's enumeration order is its
    extraction-directory rglob; both are deterministic).

    Scale note: a split single-stream archive cannot be read in parallel —
    at corpus scale write one COMPLETE tar per shard and use
    :func:`read_tar_shards`, which opens shards concurrently."""
    import glob as _glob

    import ray
    import ray.data

    _empty = pa.Table.from_pydict(
        {"url": [], "content": [], "encoding": [], "crawl_seq": []},
        schema=PAGES_SCHEMA)
    paths = sorted(_glob.glob(parts_glob))
    if not paths:                       # zero-byte stream would ReadError
        return ray.data.from_arrow([_empty])
    # Each filled block goes straight into the OBJECT STORE (ray.put) so
    # driver heap stays O(rows_per_block) — the store spills to disk if the
    # archive outsizes memory; only the refs list grows on the driver.
    refs, cols = [], {n: [] for n in ("url", "content", "encoding")}
    seq = 0
    for data in iter_tar_pages(paths):
        url, content, encoding = _page_row(data)
        cols["url"].append(url)
        cols["content"].append(content)
        cols["encoding"].append(encoding)
        seq += 1
        if len(cols["url"]) >= rows_per_block:
            cols["crawl_seq"] = list(range(seq - len(cols["url"]), seq))
            refs.append(ray.put(pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)))
            cols = {n: [] for n in ("url", "content", "encoding")}
    if cols["url"]:
        cols["crawl_seq"] = list(range(seq - len(cols["url"]), seq))
        refs.append(ray.put(pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)))
    if not refs:
        return ray.data.from_arrow([_empty])
    return ray.data.from_arrow_refs(refs)


def read_tar_shards(shards_glob: str) -> "ray.data.Dataset":
    """Parallel page-archive reader: each matching file is a COMPLETE
    ``.tar.gz`` (one per shard) and is opened in its own Ray task.
    crawl_seq = shard_index · 2³² + member_index — a total order that
    respects shard file order, so first-wins dedup downstream is
    deterministic."""
    import glob as _glob

    import ray.data

    paths = sorted(_glob.glob(shards_glob))

    def read_shard(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in PAGES_SCHEMA.names}
        for path, shard_i in zip(batch["path"].to_pylist(),
                                 batch["shard_i"].to_pylist()):
            for i, data in enumerate(iter_tar_pages([path])):
                url, content, encoding = _page_row(data)
                cols["url"].append(url)
                cols["content"].append(content)
                cols["encoding"].append(encoding)
                cols["crawl_seq"].append((shard_i << 32) + i)
        return pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)

    files = pa.table({
        "path": pa.array(paths, type=pa.string()),
        "shard_i": pa.array(range(len(paths)), type=pa.int64()),
    })
    # one row (file) per block so each shard extracts in its own task
    return ray.data.from_arrow(
        [files.slice(i, 1) for i in range(len(files))] or [files]
    ).map_batches(read_shard, batch_format="pyarrow")


def read_jsonl_pages(paths_glob: str) -> "ray.data.Dataset":
    """Loose JSONL page files (one ``{url, content, encoding}`` object per
    line — the reference's per-page JSON shape without the tar wrapper) →
    the PAGES_SCHEMA Dataset.  Files read in parallel (one task per file);
    crawl_seq = ``file_index · 2³² + line_index``, a total order that
    respects sorted-file order so downstream first-wins dedup is
    deterministic (same convention as :func:`read_tar_shards`)."""
    import glob as _glob
    import json as _json

    import ray.data

    paths = sorted(_glob.glob(paths_glob))
    if not paths:
        return ray.data.from_arrow([pa.Table.from_pydict(
            {n: [] for n in PAGES_SCHEMA.names}, schema=PAGES_SCHEMA)])

    def read_file(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in PAGES_SCHEMA.names}
        for path, file_i in zip(batch["path"].to_pylist(),
                                batch["file_i"].to_pylist()):
            with open(path, "r", encoding="utf-8") as f:
                for line_i, line in enumerate(f):
                    line = line.strip()
                    if not line:
                        continue
                    url, content, encoding = _page_row(_json.loads(line))
                    cols["url"].append(url)
                    cols["content"].append(content)
                    cols["encoding"].append(encoding)
                    cols["crawl_seq"].append((file_i << 32) + line_i)
        return pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)

    files = pa.table({
        "path": pa.array(paths, type=pa.string()),
        "file_i": pa.array(range(len(paths)), type=pa.int64()),
    })
    return ray.data.from_arrow(
        [files.slice(i, 1) for i in range(len(files))]
    ).map_batches(read_file, batch_format="pyarrow")
