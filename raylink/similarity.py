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


def _kmeans(sample: np.ndarray, n_lists: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd iterations on a (normalized) training sample —
    the IVF coarse quantizer. Pure numpy; empty clusters re-seeded from the
    farthest points."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_lists, n), replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
            else:
                cent[c] = sample[d.min(axis=1).argmax()]
    return cent


def ivf_topk(emb: rd.Dataset, query: np.ndarray, k: int = 10, *,
             n_lists: int = 32, n_probe: int = 4, train_sample: int = 8192,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> rd.Dataset:
    """IVF approximate top-k (ROADMAP 6): a coarse k-means quantizer is
    trained once on a bounded driver sample of normalized vectors; each
    batch assigns its vectors to the nearest centroid (one matmul) and
    scores ONLY vectors whose list is among the query's ``n_probe``
    nearest lists. Work scales ~ n_probe/n_lists of brute force; recall
    rises with n_probe (measured in tests against cosine_topk).

    Scale note: training reads ``train_sample`` rows (bounded, not
    corpus-proportional); centroids (n_lists x dim) broadcast once."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    train = []
    got = 0
    for b in emb.select_columns([vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=4096):
        v = b[vec_col].combine_chunks()
        m = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = m.reshape(b.num_rows, -1)
        train.append(m)
        got += len(m)
        if got >= train_sample:
            break
    mat = np.concatenate(train)[:train_sample]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    cent = _kmeans(mat / norms[:, None], n_lists, seed=seed)

    qd = ((qn[None, :] - cent) ** 2).sum(axis=1)
    probe = frozenset(np.argsort(qd, kind="stable")[:n_probe].tolist())
    ref = ray.put((cent, qn, probe))

    def score(batch: pa.Table) -> pa.Table:
        c, qq, probe_set = ray.get(ref)
        ids, m = _unwrap(batch, id_col, vec_col)
        nm = np.linalg.norm(m, axis=1)
        nm[nm == 0] = 1.0
        unit = m / nm[:, None]
        # nearest centroid via the matmul identity argmin||u-c|| = argmax u.c - |c|^2/2
        scores_c = unit @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        assign = scores_c.argmax(axis=1)
        keep = np.isin(assign, list(probe_set))
        sims = unit[keep] @ qq
        fixed = np.floor(sims * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "cos_sim": pa.array(fixed, pa.int64()),
        })

    scored = emb.map_batches(score, batch_format="pyarrow")
    return scored.sort(key=["cos_sim", id_col], descending=[True, False]).limit(k)
