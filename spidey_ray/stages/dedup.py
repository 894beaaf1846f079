"""Deduplication operators for training-data pipelines (SURVEY.md §2.7 +
the large-scale extensions): exact, MinHash+LSH, SimHash-banded, n-gram
Jaccard, embedding-cosine near-dup.

All follow the same scale shape: a vectorized signature stage
(``map_batches``), a bucket ``groupby`` that only ever co-locates CANDIDATE
rows (never all-pairs over the corpus), pair verification inside the group,
and a final min-label resolution.  Broadcast joins are used for the
survivor filter.  Public algorithm references: Broder '97 (minhash),
Indyk-Gionis-Motwani '99 (LSH banding), Charikar '02 (simhash),
Schleimer '03 (winnowing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.simhash import hamming_popcount, simhash64, token_hash64
from .textstats import tokens_of

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column("content_hash", pa.array(h, type=pa.string()))


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Hash-partition by content hash, keep min(id) per group
    (the distributed form of Filter.py:49-51's first-wins set)."""
    return (
        ds.map_batches(content_hash_batch, fn_kwargs={"text_col": text_col},
                       batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(lambda g: g.sort_values(id_col).head(1), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = tokens_of(text)
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([token_hash64(s) for s in shingles], dtype=np.uint64))


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minimums of (a*h+b) mod p — vectorized (perm × shingle)."""
    with np.errstate(over="ignore"):
        vals = (sh[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class MinHashStage:
    """doc rows → one row per doc: (doc_id, signature, per-band hashes).
    Signatures stay one-per-doc; only the tiny (band, hash, doc_id) rows
    enter the bucket shuffle."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 text_col: str = "text", seed: int = 42):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_sig, out_bh = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch[self.text_col].to_pylist()):
            sig = minhash_signature(shingle_hashes(text, self.k), self.a, self.b)
            bhs = [
                hashlib.sha1(
                    sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                    .tobytes()).hexdigest()[:16]
                for b in range(self.bands)
            ]
            out_doc.append(doc_id)
            out_sig.append(sig.tolist())
            out_bh.append(bhs)
        return pa.table({
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "signature": pa.array(out_sig, type=pa.list_(pa.uint64())),
            "band_hashes": pa.array(out_bh, type=pa.list_(pa.string())),
        })


_MINHASH_CACHE: dict = {}


def _minhash_batch(batch: pa.Table, num_perm: int, bands: int,
                   text_col: str) -> pa.Table:
    """Task-stage wrapper: permutation params are cheap to rebuild, so
    stateless tasks (full cluster width) beat a small actor pool."""
    key = (num_perm, bands, text_col)
    stage = _MINHASH_CACHE.get(key)
    if stage is None:
        stage = _MINHASH_CACHE[key] = MinHashStage(
            num_perm=num_perm, bands=bands, text_col=text_col)
    return stage(batch)


def _explode_bands(batch: pa.Table) -> pa.Table:
    n_bands = len(batch["band_hashes"][0].as_py()) if len(batch) else 0
    docs = np.repeat(np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64),
                     n_bands)
    import pyarrow.compute as _pc

    flat = _pc.list_flatten(batch["band_hashes"].combine_chunks())
    bands = np.tile(np.arange(n_bands, dtype=np.int32), len(batch))
    return pa.table({
        "doc_id": pa.array(docs),
        "band": pa.array(bands),
        "band_hash": flat,
    })


def _bucket_pairs_ids(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (ids only; verified later)."""
    ids = sorted(set(g["doc_id"].tolist()))
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pd.DataFrame({"doc_a": a_out, "doc_b": b_out})


def minhash_lsh_pairs(ds: "ray.data.Dataset", threshold: float = 0.8,
                      num_perm: int = 64, bands: int = 16,
                      text_col: str = "text") -> "ray.data.Dataset":
    """Near-duplicate candidate pairs via banded minhash LSH.

    Shuffle discipline: signatures (num_perm × 8 bytes each) never enter the
    bucket shuffle — only (band, band_hash, doc_id) rows do.  Candidate
    pairs are verified against a broadcast doc_id→signature map (``ray.put``
    once); at corpus scale the verification becomes a hash-partitioned join
    on doc_id instead of a broadcast."""
    sigs = ds.map_batches(
        _minhash_batch,
        fn_kwargs=dict(num_perm=num_perm, bands=bands, text_col=text_col),
        batch_format="pyarrow",
    ).materialize()

    sig_df = sigs.select_columns(["doc_id", "signature"]).to_pandas()
    sig_map = {int(d): np.asarray(s, dtype=np.uint64)
               for d, s in zip(sig_df["doc_id"], sig_df["signature"])}
    sig_ref = ray.put(sig_map)

    def verify(batch: pa.Table) -> pa.Table:
        m = ray.get(sig_ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        a_out, b_out, j_out = [], [], []
        for x, y in zip(a, b):
            est = float((m[x] == m[y]).mean())
            if est >= threshold:
                a_out.append(x)
                b_out.append(y)
                j_out.append(round(est, 4))
        return pa.table({
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "jaccard_est": pa.array(j_out, type=pa.float64()),
        })

    return (
        sigs.select_columns(["doc_id", "band_hashes"])
        .map_batches(_explode_bands, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs_ids, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])          # same pair from several bands
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .map_batches(verify, batch_format="pyarrow")
    )


def resolve_duplicates(pairs_df: pd.DataFrame) -> dict[int, int]:
    """Union-find min-label resolution over verified pairs (driver-side: the
    candidate-pair set is orders of magnitude smaller than the corpus)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def minhash_dedup(ds: "ray.data.Dataset", threshold: float = 0.8,
                  text_col: str = "text") -> "ray.data.Dataset":
    """Corpus minus minhash-LSH near-duplicates (component min-id survives)."""
    pairs = minhash_lsh_pairs(ds, threshold, text_col=text_col).to_pandas()
    labels = resolve_duplicates(pairs)
    drop = {d for d, rep in labels.items() if rep != d}
    return ds.map_batches(
        lambda t: t.filter(
            pa.array([int(d) not in drop for d in t["doc_id"].to_pylist()])),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# simhash near-dup
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = []
    for t in batch[text_col].to_pylist():
        freq: dict[str, int] = {}
        for tok in tokens_of(t):
            freq[tok] = freq.get(tok, 0) + 1
        hs.append(simhash64(freq))
    out = pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(hs, type=pa.uint64()),
    })
    return out


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 3,
                  text_col: str = "text") -> "ray.data.Dataset":
    """Near-dup pairs with hamming distance <= k, banded on 4×16-bit chunks:
    any pair within distance 3 shares at least one exact chunk (pigeonhole)."""
    sigs = ds.map_batches(simhash_batch, fn_kwargs={"text_col": text_col},
                          batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        doc, band, key, sim = [], [], [], []
        for d, h in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            for bandi in range(4):
                doc.append(d)
                band.append(bandi)
                key.append((h >> (16 * bandi)) & 0xFFFF)
                sim.append(h)
        return pa.table({
            "doc_id": pa.array(doc, type=pa.int64()),
            "band": pa.array(band, type=pa.int32()),
            "chunk": pa.array(key, type=pa.int32()),
            "simhash": pa.array(sim, type=pa.uint64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            d = hamming_popcount(hs[i] ^ hs[i + 1:])
            hits = np.nonzero(d <= max_hamming)[0]
            for j in hits:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[i + 1 + j]))
                d_out.append(int(d[j]))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "hamming": d_out})

    pairs = sigs.map_batches(explode, batch_format="pyarrow") \
        .groupby(["band", "chunk"]).map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, within LSH candidate buckets)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds: "ray.data.Dataset", threshold: float = 0.6,
                        ngram: int = 3, text_col: str = "text") -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard over LSH-bucketed candidates: a cheap banded
    minhash proposes buckets, the group stage recomputes TRUE Jaccard from
    the shingle sets (carried as hashed shingles, not text)."""

    class SigStage:
        def __init__(self):
            self.a, self.b = _perm_params(32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc, band, bh, sh_out = [], [], [], []
            for d, t in zip(batch["doc_id"].to_pylist(),
                            batch[text_col].to_pylist()):
                sh = shingle_hashes(t, ngram)
                sig = minhash_signature(sh, self.a, self.b)
                for bandi in range(8):
                    chunk = sig[bandi * 4:(bandi + 1) * 4]
                    doc.append(d)
                    band.append(bandi)
                    bh.append(hashlib.sha1(chunk.tobytes()).hexdigest()[:16])
                    sh_out.append(sh.tolist())
            return pa.table({
                "doc_id": pa.array(doc, type=pa.int64()),
                "band": pa.array(band, type=pa.int32()),
                "band_hash": pa.array(bh, type=pa.string()),
                "shingles": pa.array(sh_out, type=pa.list_(pa.uint64())),
            })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sets = [set(map(int, s)) for s in g["shingles"]]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(round(jac, 4))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "jaccard": j_out})

    sig_cache: dict = _MINHASH_CACHE

    def sig_batch(batch: pa.Table) -> pa.Table:
        key = ("ngram-sig", ngram, text_col)
        stage = sig_cache.get(key)
        if stage is None:
            stage = sig_cache[key] = SigStage()
        return stage(batch)

    pairs = (
        ds.map_batches(sig_batch, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(ds: "ray.data.Dataset", threshold: float = 0.95,
                        n_planes: int = 12, seed: int = 42,
                        emb_col: str = "embedding",
                        id_col: str = "vec_id") -> "ray.data.Dataset":
    """Cosine near-dup via random-hyperplane LSH buckets + exact verification
    within buckets (Charikar '02). Multi-probe: 4 independent plane sets so
    near pairs rarely miss every bucket."""

    def sig_stage(batch: pa.Table) -> pa.Table:
        emb = np.array(batch[emb_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = emb / norms
        dim = emb.shape[1]
        doc, table_i, key, vec = [], [], [], []
        for t in range(4):
            planes = np.random.default_rng(seed + t).standard_normal((n_planes, dim))
            bits = (unit @ planes.T) > 0
            keys = np.packbits(bits, axis=1)[:, :2].copy().view(np.uint16).ravel()
            for i, d in enumerate(batch[id_col].to_pylist()):
                doc.append(d)
                table_i.append(t)
                key.append(int(keys[i]))
                vec.append(unit[i].tolist())
        return pa.table({
            "doc_id": pa.array(doc, type=pa.int64()),
            "table_i": pa.array(table_i, type=pa.int32()),
            "bucket": pa.array(key, type=pa.int32()),
            "unit": pa.array(vec, type=pa.list_(pa.float64())),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].tolist()
        mat = np.array([np.asarray(v) for v in g["unit"]])
        a_out, b_out, c_out = [], [], []
        if len(ids) > 1:
            sims = mat @ mat.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            for i, j in zip(ii, jj):
                a_out.append(ids[i])
                b_out.append(ids[j])
                c_out.append(round(float(sims[i, j]), 4))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "cosine": c_out})

    pairs = (
        ds.map_batches(sig_stage, batch_format="pyarrow")
        .groupby(["table_i", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
