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
        "rank": pa.array(rows["rank"], type=pa.int32()),
    })


class IvfIndex:
    """IVF-flat index: centroids trained on a sample, vectors assigned to
    nearest centroid via map_batches, buckets kept as Arrow tables."""

    def __init__(self, n_lists: int = 16, n_probe: int = 4, seed: int = 42):
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self.buckets: dict[int, tuple[np.ndarray, np.ndarray]] = {}

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

        assigned = ds.map_batches(assign, batch_format="pyarrow").to_pandas()
        for lid, g in assigned.groupby("list_id"):
            self.buckets[int(lid)] = (
                g["vec_id"].to_numpy(dtype=np.int64),
                np.array([np.asarray(u) for u in g["unit"]]),
            )
        return self

    def search(self, query_vec: np.ndarray, k: int = 10) -> list[tuple[int, float]]:
        q = _unit(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))[0]
        order = np.argsort(-(self.centroids @ q))[: self.n_probe]
        cand_ids, cand_sims = [], []
        for lid in order:
            b = self.buckets.get(int(lid))
            if b is None:
                continue
            ids, mat = b
            sims = mat @ q
            cand_ids.append(ids)
            cand_sims.append(sims)
        if not cand_ids:
            return []
        ids = np.concatenate(cand_ids)
        sims = np.concatenate(cand_sims)
        idx = np.lexsort((ids, -sims))[:k]
        return [(int(ids[i]), round(float(sims[i]), 4)) for i in idx]
