"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``: brute-force scan — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, fetched in each task), per-batch
  partial top-k, tiny global merge.  The baseline and the exactness oracle.
- ``IvfIndex``: IVF-flat scale path — k-means coarse centroids, vectors
  bucketed by nearest centroid (a groupby shuffle), queries probe the
  ``n_probe`` nearest buckets only.  (Jégou et al., "Product Quantization
  for Nearest Neighbor Search", PAMI'11 — coarse quantizer part.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def cosine_topk(ds: "ray.data.Dataset", query_vecs: np.ndarray, k: int = 10,
                emb_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Exact top-k by cosine for each query row. Returns
    (query_idx, vec_id, cosine, rank) — ties broken by vec_id asc."""
    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        mat = _unit(np.array(batch[emb_col].to_pylist(), dtype=np.float64))
        sims = mat @ qm.T                                  # (n, nq)
        ids = np.array(batch[id_col].to_pylist(), dtype=np.int64)
        out_q, out_id, out_c = [], [], []
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            take = min(k, len(ids))
            idx = np.argpartition(-col, take - 1)[:take]
            for i in idx:
                out_q.append(qi)
                out_id.append(int(ids[i]))
                out_c.append(float(col[i]))
        return pa.table({
            "query_idx": pa.array(out_q, type=pa.int32()),
            "vec_id": pa.array(out_id, type=pa.int64()),
            "cosine": pa.array(out_c, type=pa.float64()),
        })

    partials = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    rows = {"query_idx": [], "vec_id": [], "cosine": [], "rank": []}
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        for rank, (vid, cos) in enumerate(zip(g["vec_id"], g["cosine"]), 1):
            rows["query_idx"].append(int(qi))
            rows["vec_id"].append(int(vid))
            rows["cosine"].append(round(float(cos), 4))
            rows["rank"].append(rank)
    return pa.table({
        "query_idx": pa.array(rows["query_idx"], type=pa.int32()),
        "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
        "cosine": pa.array(rows["cosine"], type=pa.float64()),
        # int64 to match SQL row_number() (the driver hash is dtype-aware)
        "rank": pa.array(rows["rank"], type=pa.int64()),
    })


@ray.remote
def _block_list_ids(block: pa.Table) -> set:
    if "list_id" not in block.column_names:   # empty shuffle block
        return set()
    return set(block["list_id"].to_pylist())


@ray.remote
def _probe_block(block: pa.Table, q: np.ndarray, k: int,
                 wanted: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Partial top-k over one bucket block, restricted to the probed lists."""
    import pyarrow.compute as pc

    t = block.filter(pc.is_in(block["list_id"],
                              value_set=pa.array(wanted, type=pa.int32())))
    if len(t) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(t["unit"].to_pylist(), dtype=np.float64)
    sims = mat @ q
    idx = np.lexsort((ids, -sims))[:k]
    return ids[idx], sims[idx]


@ray.remote
def _pq_scan_block(block: pa.Table, dist_table: np.ndarray,
                   k: int) -> tuple[np.ndarray, np.ndarray]:
    """ADC scan of one code block: distance = Σ_m dist_table[m, code_m]
    (pure table lookups — the raw vectors never exist here)."""
    if "codes" not in block.column_names or len(block) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    ids = np.asarray(block["vec_id"].to_pylist(), dtype=np.int64)
    codes = np.array(block["codes"].to_pylist(), dtype=np.uint8)   # (n, M)
    m = codes.shape[1]
    dists = dist_table[np.arange(m)[None, :], codes].sum(axis=1)
    idx = np.lexsort((ids, dists))[:k]
    return ids[idx], dists[idx]


class PqIndex:
    """Product-quantization ANN (Jégou et al., PAMI'11): unit vectors split
    into M subspaces, each encoded as one of 256 k-means codewords — a
    D-float vector becomes M bytes (e.g. 16 floats → 4 bytes, 16×
    compression).  Search is asymmetric distance (ADC): the query builds an
    (M, 256) distance table once, and every corpus block is scanned with
    pure table lookups.

    Scale posture mirrors IvfIndex: code blocks stay in the object store,
    scanned by targeted Ray tasks returning per-block top-k partials; the
    driver holds only the codebooks (M × 256 × D/M floats) and block refs.
    Cosine on unit vectors is served via L2 (‖a−b‖² = 2 − 2·cos)."""

    def __init__(self, m: int = 4, seed: int = 42, train_iters: int = 12):
        self.m = m
        self.seed = seed
        self.train_iters = train_iters
        self.codebooks: np.ndarray | None = None     # (M, 256, dsub)
        self._block_refs: list = []

    def _train_subspace(self, x: np.ndarray, rng) -> np.ndarray:
        k = min(256, len(x))
        c = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(self.train_iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        if len(c) < 256:                      # pad so codes stay uint8-valid
            c = np.vstack([c, np.repeat(c[-1:], 256 - len(c), axis=0)])
        return c

    def build(self, ds: "ray.data.Dataset", emb_col: str = "embedding",
              id_col: str = "vec_id", sample_fraction: float = 0.5) -> "PqIndex":
        sample = ds.random_sample(sample_fraction, seed=self.seed).to_pandas()
        train = _unit(np.array(sample[emb_col].tolist(), dtype=np.float64))
        dim = train.shape[1]
        assert dim % self.m == 0, "dim must divide by m"
        dsub = dim // self.m
        rng = np.random.default_rng(self.seed)
        self.codebooks = np.stack([
            self._train_subspace(train[:, i * dsub:(i + 1) * dsub], rng)
            for i in range(self.m)
        ])
        cb_ref = ray.put(self.codebooks)
        m, _ = self.m, dsub

        def encode(batch: pa.Table) -> pa.Table:
            cb = ray.get(cb_ref)
            mat = _unit(np.array(batch[emb_col].to_pylist(), dtype=np.float64))
            codes = np.empty((len(mat), m), dtype=np.uint8)
            for i in range(m):
                sub = mat[:, i * dsub:(i + 1) * dsub]
                d = ((sub[:, None, :] - cb[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d.argmin(axis=1).astype(np.uint8)
            return pa.table({
                "vec_id": batch[id_col],
                "codes": pa.array([c.tolist() for c in codes],
                                  type=pa.list_(pa.uint8())),
            })

        encoded = ds.map_batches(encode, batch_format="pyarrow").materialize()
        self._block_refs = [
            ref for b in encoded.iter_internal_ref_bundles()
            for ref in b.block_refs
        ]
        return self

    def search(self, query_vec: np.ndarray, k: int = 10) -> list[tuple[int, float]]:
        q = _unit(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))[0]
        dsub = self.codebooks.shape[2]
        dist_table = np.stack([
            ((self.codebooks[i] - q[i * dsub:(i + 1) * dsub][None, :]) ** 2
             ).sum(axis=1)
            for i in range(self.m)
        ])                                             # (M, 256)
        parts = ray.get([
            _pq_scan_block.remote(ref, dist_table, k)
            for ref in self._block_refs
        ])
        ids = np.concatenate([p[0] for p in parts])
        dists = np.concatenate([p[1] for p in parts])
        if len(ids) == 0:
            return []
        idx = np.lexsort((ids, dists))[:k]
        # approx cosine back from L2 on unit vectors
        return [(int(ids[i]), round(float(1 - dists[i] / 2), 4)) for i in idx]


class IvfIndex:
    """IVF-flat index: centroids trained on a sample, vectors assigned to
    nearest centroid via map_batches.

    Scale posture: the driver holds ONLY the centroids and a tiny
    block→list_ids index.  Assigned vectors stay in the object store as
    Arrow blocks, clustered by ``list_id`` (one groupby shuffle), and each
    query probes only the blocks containing its ``n_probe`` nearest lists
    via targeted Ray tasks — nothing corpus-sized ever materializes on the
    driver."""

    def __init__(self, n_lists: int = 16, n_probe: int = 4, seed: int = 42):
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self._block_refs: list = []
        self._block_lists: list[set] = []

    def _kmeans(self, x: np.ndarray, iters: int = 10) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        c = x[rng.choice(len(x), size=min(self.n_lists, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ c.T, axis=1)          # cosine on unit vecs
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    m = members.mean(axis=0)
                    n = np.linalg.norm(m)
                    if n > 0:
                        c[j] = m / n
        return c

    def build(self, ds: "ray.data.Dataset", emb_col: str = "embedding",
              id_col: str = "vec_id", sample_fraction: float = 0.25) -> "IvfIndex":
        sample = ds.random_sample(sample_fraction, seed=self.seed).to_pandas()
        train = _unit(np.array(sample[emb_col].tolist(), dtype=np.float64))
        self.centroids = self._kmeans(train)
        c_ref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            mat = _unit(np.array(batch[emb_col].to_pylist(), dtype=np.float64))
            lst = np.argmax(mat @ c.T, axis=1).astype(np.int32)
            return pa.table({
                "list_id": pa.array(lst),
                "vec_id": batch[id_col],
                "unit": pa.array([r.tolist() for r in mat],
                                 type=pa.list_(pa.float64())),
            })

        # cluster by list_id (one shuffle) so each Arrow block holds few
        # lists, keep the blocks in the object store, record which lists
        # live in which block (tiny driver metadata)
        assigned = (
            ds.map_batches(assign, batch_format="pyarrow")
            .groupby("list_id")
            .map_groups(lambda g: g, batch_format="pyarrow")
            .materialize()
        )
        self._block_refs = [
            ref for bundle in assigned.iter_internal_ref_bundles()
            for ref in bundle.block_refs
        ]
        self._block_lists = ray.get(
            [_block_list_ids.remote(b) for b in self._block_refs])
        return self

    def search(self, query_vec: np.ndarray, k: int = 10) -> list[tuple[int, float]]:
        q = _unit(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))[0]
        order = np.argsort(-(self.centroids @ q))[: self.n_probe]
        wanted = set(int(x) for x in order)
        tasks = [
            _probe_block.remote(ref, q, k, sorted(wanted))
            for ref, lists in zip(self._block_refs, self._block_lists)
            if lists & wanted
        ]
        if not tasks:
            return []
        parts = ray.get(tasks)
        ids = np.concatenate([p[0] for p in parts])
        sims = np.concatenate([p[1] for p in parts])
        if len(ids) == 0:
            return []
        idx = np.lexsort((ids, -sims))[:k]
        return [(int(ids[i]), round(float(sims[i]), 4)) for i in idx]
