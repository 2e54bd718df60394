"""Similarity search over an embedding column (list<float>).

Reference parity: cosine-similarity feature comparison
(porcine/pig_extract.py:3142-3175) and the two-stage lead-candidate ranking
(porcine/pig_extract.py:1487-1525) re-expressed as top-k retrieval.

- ``cosine_topk``: brute-force cosine top-k — the baseline. The query
  matrix is broadcast once (``ray.put``); each batch does one float64
  matmul; global top-k = sort + limit.
- ``lsh_topk``: random-hyperplane LSH-bucketed approximate variant — the
  scale path. Buckets are assigned per batch from seeded projections; only
  buckets probed by the query (exact + 1-bit-flip neighbors) are scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _unwrap(batch: pa.Table, id_col: str, vec_col: str):
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    v = batch[vec_col].combine_chunks()
    mat = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return ids, mat.reshape(len(ids), -1)


def cosine_topk(emb: rd.Dataset, query: np.ndarray, k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_ids: tuple = ()) -> rd.Dataset:
    """(id, cos_sim) of the k nearest rows by cosine; deterministic order
    (rounded score desc, id asc)."""
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    qref = ray.put(q / qn)
    excl = set(int(x) for x in exclude_ids)

    def score(batch: pa.Table) -> pa.Table:
        qq = ray.get(qref)
        ids, mat = _unwrap(batch, id_col, vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qq) / norms
        keep = ~np.isin(ids, list(excl)) if excl else np.ones(len(ids), bool)
        fixed = np.floor(sims[keep] * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "cos_sim": pa.array(fixed, pa.int64()),
        })

    scored = emb.map_batches(score, batch_format="pyarrow")
    return scored.sort(key=["cos_sim", id_col], descending=[True, False]).limit(k)


def lsh_topk(emb: rd.Dataset, query: np.ndarray, k: int = 10, *, n_planes: int = 8,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> rd.Dataset:
    """Approximate top-k: scan only LSH buckets within Hamming distance 1 of
    the query's bucket. Recall measured in tests against cosine_topk."""
    q = np.asarray(query, dtype=np.float64)
    dim = len(q)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qsig = int((planes @ q > 0) @ (1 << np.arange(n_planes)))
    probe = {qsig} | {qsig ^ (1 << b) for b in range(n_planes)}
    pref = ray.put((planes, q / (np.linalg.norm(q) or 1.0), frozenset(probe)))

    def score(batch: pa.Table) -> pa.Table:
        pl, qq, probe_set = ray.get(pref)
        ids, mat = _unwrap(batch, id_col, vec_col)
        sigs = ((mat @ pl.T) > 0) @ (1 << np.arange(pl.shape[0]))
        keep = np.array([int(s) in probe_set for s in sigs], dtype=bool)
        ids, mat = ids[keep], mat[keep]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qq) / norms
        fixed = np.floor(sims * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cos_sim": pa.array(fixed, pa.int64()),
        })

    scored = emb.map_batches(score, batch_format="pyarrow")
    return scored.sort(key=["cos_sim", id_col], descending=[True, False]).limit(k)
