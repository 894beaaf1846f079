"""Filter + indexer pipeline: documents table → doc_meta + postings tables.

The reference runs two sequential full passes with an in-memory spill dict
and a k-way file merge (backend/IndexerMain.py:38-47, Indexer.py:228-306);
here the entire thing is three Ray Data stages and one groupby shuffle — the
shuffle IS the k-way merge (SURVEY.md §2.1 S7/S8):

1. ``filter_prepare_batch``: compact per-doc features (40 bytes/doc — spans
   never enter the dedup shuffle),
2. exact dedup by doc_id + bucketed simhash near-dup
   (``groupby(len_bucket).map_groups``) with first-in-crawl-order-wins
   (Filter.py:49-51, 94-110),
3. doc-number assignment by crawl order (the reference's
   enumeration-order doc ids, Indexer.py:96; SURVEY.md §2.9) — a rank over
   crawl_seq; driver-side here, a prefix-sum over sorted block counts at
   cluster scale,
4. ``emit_postings_batch`` + ``groupby(stem, is_bigram).map_groups`` for
   df/tf-idf/per-stem ordering — replacing offload files, k-way merge and
   the post-index scoring rewrite (Indexer.py:142-173).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .. import io as sio
from ..stages.index_stages import (
    doc_extents,
    doc_token_stream,
    emit_postings_batch,
    filter_prepare_batch,
    near_dup_group,
    score_stem_group,
)

DOC_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("title", pa.string()),
        ("url", pa.string()),
        ("n_tokens", pa.int64()),
        ("tag_extents", pa.list_(pa.struct(
            [("tag", pa.string()), ("start", pa.int32()), ("end", pa.int32())]))),
    ]
)


@dataclass
class FilterIndexResult:
    doc_meta_path: str
    postings_path: str
    num_documents: int


def _doc_meta_batch(batch: pa.Table, doc_num: dict) -> pa.Table:
    out = {n: [] for n in DOC_META_SCHEMA.names}
    for url, title, spans in zip(
        batch["doc_id"].to_pylist(), batch["title"].to_pylist(),
        batch["spans"].to_pylist(),
    ):
        if url not in doc_num:
            continue
        stream = doc_token_stream(spans)
        extents = doc_extents(spans)
        out["doc_id"].append(doc_num[url])
        out["title"].append(title)
        out["url"].append(url)
        out["n_tokens"].append(len(stream))
        out["tag_extents"].append(
            [{"tag": t, "start": e[0], "end": e[1]}
             for t in extents for e in extents[t]]
        )
    return pa.Table.from_pydict(out, schema=DOC_META_SCHEMA)


def _postings_input_batch(batch: pa.Table, doc_num: dict) -> pa.Table:
    mask = pa.array([u in doc_num for u in batch["doc_id"].to_pylist()])
    t = batch.filter(mask)
    nums = pa.array([doc_num[u] for u in t["doc_id"].to_pylist()], type=pa.int64())
    return t.append_column("doc_num", nums)


def _doc_meta_batch_joined(batch: pa.Table) -> pa.Table:
    """doc_meta over the docs ⋈ doc-numbers join output (scale path: the
    join already filtered non-survivors and attached ``doc_num``)."""
    out = {n: [] for n in DOC_META_SCHEMA.names}
    for url, title, spans, num in zip(
        batch["doc_id"].to_pylist(), batch["title"].to_pylist(),
        batch["spans"].to_pylist(), batch["doc_num"].to_pylist(),
    ):
        stream = doc_token_stream(spans)
        extents = doc_extents(spans)
        out["doc_id"].append(int(num))
        out["title"].append(title)
        out["url"].append(url)
        out["n_tokens"].append(len(stream))
        out["tag_extents"].append(
            [{"tag": t, "start": e[0], "end": e[1]}
             for t in extents for e in extents[t]]
        )
    return pa.Table.from_pydict(out, schema=DOC_META_SCHEMA)


def assign_doc_numbers(survivors: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed rank over crawl_seq → (doc_id, doc_num) with contiguous
    crawl-order ordinals (the reference's enumeration doc ids, Indexer.py:96):
    sort, then a prefix-sum over the sorted blocks' row counts gives each
    block its offset — no driver-side enumeration of the corpus."""
    import ray

    mat = survivors.sort("crawl_seq").materialize()
    bundles = list(mat.iter_internal_ref_bundles())

    @ray.remote
    def _rank_block(block, offset: int) -> pa.Table:
        import numpy as np
        import pandas as pd

        if isinstance(block, pd.DataFrame):        # pandas-format block
            ids = (block["doc_id"].tolist()
                   if "doc_id" in block.columns else [])
        elif len(block) and "doc_id" in block.column_names:
            ids = block["doc_id"].to_pylist()
        else:                                      # empty shuffle block
            ids = []
        return pa.table({
            "doc_id": pa.array(ids, type=pa.string()),
            "doc_num": pa.array(
                np.arange(offset, offset + len(ids), dtype=np.int64)),
        })

    refs, off = [], 0
    for b in bundles:
        for block_ref, meta in zip(b.block_refs, b.metadata):
            refs.append(_rank_block.remote(block_ref, off))
            off += meta.num_rows
    if not refs:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.string()),
            "doc_num": pa.array([], type=pa.int64())}))
    return ray.data.from_arrow_refs(refs)


# above this many survivors, attach doc numbers by a streaming hash join
# instead of broadcasting a url→ordinal dict into the stage closures
_DOCNUM_BROADCAST_LIMIT = 2_000_000


def run_filter_index(
    documents: "ray.data.Dataset",
    out_dir: str,
    bucket_size: int = 100,
    dup_threshold: float = 0.975,
    broadcast_limit: int = _DOCNUM_BROADCAST_LIMIT,
) -> FilterIndexResult:
    """documents(doc_id, spans, title, crawl_seq) → doc_meta + postings."""
    docs = documents

    # 1-2. features + exact dedup (first crawl wins) + bucketed near-dup
    feats = docs.map_batches(
        filter_prepare_batch, fn_kwargs={"bucket_size": bucket_size},
        batch_format="pyarrow",
    )
    # exact dedup first-crawl-wins, fat-bucketed: grouping on the raw
    # doc_id URL would make one near-singleton group per document over the
    # whole corpus (the sort-shuffle slow path) — instead hash(doc_id)%256
    # is the shuffle key and min-crawl_seq per doc_id is a vectorized
    # idxmin inside each bucket (idxmin = stable-sort head(1): first
    # occurrence of the minimum wins ties, same as before)
    def _docid_bucket(t: pa.Table, num_buckets: int = 256) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t["doc_id"].to_pandas(), index=False,
            hash_key="spidey-fidx-0000", categorize=False)
        return t.append_column(
            "_db", pa.array((h % num_buckets).astype(np.int32).to_numpy()))

    def _first_crawl_wins(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby("doc_id")["crawl_seq"].idxmin()]
        return keep.drop(columns=["_db"])

    survivors = (
        feats
        .map_batches(_docid_bucket, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(_first_crawl_wins, batch_format="pandas")
        .groupby("len_bucket")
        .map_groups(
            lambda g: near_dup_group(g, dup_threshold), batch_format="pandas",
        )
        .select_columns(["doc_id", "crawl_seq"])
    )

    # 3. doc-number assignment by crawl order (reference doc-id semantics):
    # a distributed rank; stays a Dataset end-to-end
    ranked = assign_doc_numbers(survivors).materialize()
    n_docs = ranked.count()

    if n_docs <= broadcast_limit:
        # fast path: the ordinal map fits comfortably in a broadcast
        rdf = ranked.to_pandas()
        doc_num = dict(zip(rdf["doc_id"], rdf["doc_num"]))
        doc_meta = docs.map_batches(
            _doc_meta_batch, fn_kwargs={"doc_num": doc_num},
            batch_format="pyarrow")
        numbered = docs.map_batches(
            _postings_input_batch, fn_kwargs={"doc_num": doc_num},
            batch_format="pyarrow")
    else:
        # scale path: survivors ⋈ docs by doc_id — both sides stream, the
        # ordinal map never materializes anywhere (round-1 verdict: the
        # closure-captured dict is corpus-sized at 100×)
        from ..stages.joins import hash_join

        numbered = hash_join(docs, ranked, on="doc_id",
                             num_buckets=256).materialize()
        doc_meta = numbered.map_batches(
            _doc_meta_batch_joined, batch_format="pyarrow")

    # serving layout: key-sorted + compacted (≈262k docs per file) so the
    # serving replica's footer index (_RowGroupIndex) prunes every lookup to
    # O(1) files with tight row-group statistics — dozens of writer-block-
    # sized fragments were the dominant cold-query cost
    meta_path = os.path.join(out_dir, "doc_meta")
    sio.write_table(
        doc_meta.sort("doc_id").repartition(max(1, n_docs // 262_144)),
        meta_path)

    # 4b. postings: emit + df/tf-idf/per-stem order in ONE shuffle, keyed on
    # the stable stem-hash bucket (512 fat groups — grouping on the raw stem
    # would make millions of one-row bigram groups, see emit_postings_batch)
    postings = (
        numbered
        .map_batches(emit_postings_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: score_stem_group(g, n_docs), batch_format="pyarrow",
        )
    )
    # compact the per-bucket map_groups blocks (order-preserving coalesce:
    # bucket runs stay contiguous, within-stem posting order survives);
    # ~4k docs' postings per file keeps per-query reads to a file or two
    postings_path = os.path.join(out_dir, "postings")
    sio.write_table(postings.repartition(max(1, n_docs // 4096)),
                    postings_path)

    # num_documents.txt analog (Filter.py:130-131) so an index directory is
    # self-describing for serving
    import json

    with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
        json.dump({"num_documents": n_docs}, f)

    return FilterIndexResult(meta_path, postings_path, n_docs)
