"""Serial filter+indexer oracle: the reference's record-at-a-time control
flow (backend/Filter.py:42-131, backend/Indexer.py:66-173) executed directly
over document rows, producing golden doc_meta + postings for conformance
tests against the distributed pipeline (pipelines/filter_index.py)."""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..functions import simhash as sh
from ..stages.index_stages import (
    doc_extents,
    doc_stem_positions,
    doc_token_stream,
    positions_to_rank,
)


@dataclass
class SerialIndexResult:
    doc_meta: list[dict] = field(default_factory=list)
    # (is_bigram -> {stem: [[doc_id, positions, tfidf], ...]})
    postings: dict[bool, dict[str, list]] = field(default_factory=dict)
    num_documents: int = 0


def filter_index_serial(
    documents: list[dict], bucket_size: int = 100, dup_threshold: float = 0.975
) -> SerialIndexResult:
    """documents rows: {doc_id(url), title, spans, crawl_seq}."""
    res = SerialIndexResult(postings={False: {}, True: {}})

    rows = sorted(documents, key=lambda r: r["crawl_seq"])
    encountered = set()
    footprints: dict[int, list] = {}   # bucket -> [(simhash, n_tokens)]
    survivors = []
    for row in rows:
        if row["doc_id"] in encountered:     # Filter.py:49-51
            continue
        stream = doc_token_stream(row["spans"])
        if not stream:                        # Filter.py:91-92
            continue
        freq: dict[str, int] = {}
        for tok, _ in stream:
            freq[tok] = freq.get(tok, 0) + 1
        n = len(stream)
        h = sh.simhash64(freq)
        bucket = n // bucket_size            # Filter.py:97
        dup = any(
            sh.footprints_similar(h, n, h2, n2, dup_threshold, dup_threshold)
            for h2, n2 in footprints.get(bucket, [])
        )
        if dup:
            continue
        footprints.setdefault(bucket, []).append((h, n))
        encountered.add(row["doc_id"])
        survivors.append((row, stream, n))

    res.num_documents = len(survivors)

    # indexing pass: doc ids by enumeration order (Indexer.py:96)
    raw: dict[bool, dict[str, list]] = {False: {}, True: {}}
    for doc_id, (row, stream, n) in enumerate(survivors):
        extents = doc_extents(row["spans"])
        res.doc_meta.append(
            dict(doc_id=doc_id, title=row["title"], url=row["doc_id"],
                 n_tokens=n,
                 tag_extents=[{"tag": t, "start": e[0], "end": e[1]}
                              for t in extents for e in extents[t]])
        )
        for is_bigram in (False, True):
            for stem, positions in doc_stem_positions(
                    row["title"], stream, is_bigram).items():
                raw[is_bigram].setdefault(stem, []).append(
                    [doc_id, positions, positions_to_rank(positions, extents)])

    # scoring pass (Indexer.py:142-173)
    n_docs = res.num_documents
    for is_bigram, stems in raw.items():
        for stem, plist in stems.items():
            dfreq = len(plist)
            idf = math.log10(n_docs / dfreq)
            scored = [
                [d, pos, round((1.0 + math.log10(w)) * idf, 4) if w > 0 else 0.0]
                for d, pos, w in plist
            ]
            if not is_bigram:
                scored.sort(key=lambda x: x[2], reverse=True)  # stable
            res.postings[is_bigram][stem] = scored
    return res
