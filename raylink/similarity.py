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

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _unwrap(batch: pa.Table, id_col: str, vec_col: str):
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    if len(ids) == 0:
        # reshape(0, -1) raises; callers must check len(ids) before matmul
        return ids, np.zeros((0, 0), dtype=np.float64)
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
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.int64())})
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
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.int64())})
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


def _kmeanspp_init(sample: np.ndarray, n_lists: int, rng) -> np.ndarray:
    """Seeded k-means++ seeding (D^2 sampling): spreads initial centroids
    proportionally to squared distance from the chosen set — much better
    list balance than uniform seeding on clustered corpora, deterministic
    under the fixed rng."""
    n = len(sample)
    L = min(n_lists, n)
    cent = np.empty((L, sample.shape[1]), dtype=np.float64)
    cent[0] = sample[int(rng.integers(n))]
    d2 = ((sample - cent[0]) ** 2).sum(axis=1)
    for i in range(1, L):
        tot = d2.sum()
        if tot <= 0:
            cent[i:] = sample[rng.choice(n, size=L - i)]
            break
        cent[i] = sample[int(rng.choice(n, p=d2 / tot))]
        d2 = np.minimum(d2, ((sample - cent[i]) ** 2).sum(axis=1))
    return cent


def _nearest_centroid(unit: np.ndarray, cent: np.ndarray) -> np.ndarray:
    # argmin ||u - c||^2 == argmax u.c - |c|^2/2 — one matmul, no pairwise
    # difference tensor
    return (unit @ cent.T - 0.5 * (cent * cent).sum(axis=1)[None, :]).argmax(axis=1)


def _kmeans(sample: np.ndarray, n_lists: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd iterations on a (normalized) training sample —
    the IVF coarse quantizer. k-means++ init; matmul assignment; empty
    clusters re-seeded from the farthest points."""
    rng = np.random.default_rng(seed)
    cent = _kmeanspp_init(sample, n_lists, rng)
    for _ in range(iters):
        assign = _nearest_centroid(sample, cent)
        far = None
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
            else:
                if far is None:
                    best = (sample @ cent.T
                            - 0.5 * (cent * cent).sum(axis=1)[None, :]).max(axis=1)
                    far = best.argmin()
                cent[c] = sample[far]
    return cent


@dataclass
class IvfIndex:
    """Persisted IVF state (ROADMAP 6 "assign once, reuse across queries"):
    centroids live on the driver (n_lists x dim, tiny) and the corpus
    carries a materialized ``ivf_list`` int32 column — per query only a
    cheap ``is_in`` filter runs before scoring, no re-assignment matmul.
    ``assigned`` can be written to parquet and re-read: the column is
    ordinary data."""

    centroids: np.ndarray
    assigned: rd.Dataset
    id_col: str
    vec_col: str


def ivf_build(emb: rd.Dataset, *, n_lists: int = 32, train_sample: int = 8192,
              seed: int = 42, id_col: str = "vec_id",
              vec_col: str = "embedding",
              train: np.ndarray | None = None) -> IvfIndex:
    """Train the coarse quantizer on a bounded driver sample (k-means++ +
    Lloyd, never corpus-proportional) and persist each vector's list id as
    an ``ivf_list`` column (one matmul pass, centroids broadcast once).

    ``train``: explicit (rows, dim) training matrix. Streaming a sample
    out of ``emb`` depends on Ray's block delivery order; an explicit
    matrix (e.g. the first N file-order rows of the source parquet) makes
    the whole index — and so the query result — deterministic and
    SQL-replayable (round 4: the emb_knn_ivf exact oracle)."""
    if train is not None:
        mat = np.asarray(train, dtype=np.float64)[:train_sample]
    else:
        parts = []
        got = 0
        for b in emb.select_columns([vec_col]).iter_batches(
                batch_format="pyarrow", batch_size=4096):
            v = b[vec_col].combine_chunks()
            m = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            m = m.reshape(b.num_rows, -1)
            parts.append(m)
            got += len(m)
            if got >= train_sample:
                break
        mat = np.concatenate(parts)[:train_sample]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    cent = _kmeans(mat / norms[:, None], n_lists, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        if batch.num_rows == 0:
            return batch.append_column("ivf_list", pa.array([], pa.int32()))
        _, m = _unwrap(batch, id_col, vec_col)
        nm = np.linalg.norm(m, axis=1)
        nm[nm == 0] = 1.0
        lists = _nearest_centroid(m / nm[:, None], c)
        return batch.append_column(
            "ivf_list", pa.array(lists.astype(np.int32), pa.int32()))

    assigned = emb.map_batches(assign, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    return IvfIndex(centroids=cent, assigned=assigned, id_col=id_col,
                    vec_col=vec_col)


def ivf_query(index: IvfIndex, query: np.ndarray, k: int = 10, *,
              n_probe: int = 4) -> rd.Dataset:
    """Top-k over the ``n_probe`` nearest lists of a built index. Work is
    ~ n_probe/n_lists of brute force; recall rises with n_probe (measured
    in the recall harness, tests/test_ops.py)."""
    import pyarrow.compute as pc

    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    qd = ((qn[None, :] - index.centroids) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(qd, kind="stable")[:n_probe]).astype(np.int32)
    id_col, vec_col = index.id_col, index.vec_col
    ref = ray.put((qn, probe))

    def score(batch: pa.Table) -> pa.Table:
        qq, probe_ids = ray.get(ref)
        sub = batch.filter(pc.is_in(batch["ivf_list"],
                                    value_set=pa.array(probe_ids, pa.int32())))
        ids, m = _unwrap(sub, id_col, vec_col)
        if len(ids) == 0:  # guard BEFORE any matmul: m is (0, 0) here
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.int64())})
        nm = np.linalg.norm(m, axis=1)
        nm[nm == 0] = 1.0
        sims = (m / nm[:, None]) @ qq
        fixed = np.floor(sims * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cos_sim": pa.array(fixed, pa.int64()),
        })

    scored = index.assigned.map_batches(score, batch_format="pyarrow",
                                        zero_copy_batch=True)
    return scored.sort(key=["cos_sim", id_col], descending=[True, False]).limit(k)


def ivf_topk(emb: rd.Dataset, query: np.ndarray, k: int = 10, *,
             n_lists: int = 32, n_probe: int = 4, train_sample: int = 8192,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding",
             train: np.ndarray | None = None) -> rd.Dataset:
    """One-shot IVF approximate top-k: :func:`ivf_build` then
    :func:`ivf_query` (build the index once with ``ivf_build`` when
    serving several queries)."""
    index = ivf_build(emb, n_lists=n_lists, train_sample=train_sample,
                      seed=seed, id_col=id_col, vec_col=vec_col,
                      train=train)
    return ivf_query(index, query, k, n_probe=n_probe)


@dataclass
class IvfPqIndex:
    """IVF + product-quantization index (ROADMAP 6, the memory-bound scale
    path): the compressed corpus carries only (id, ivf_list:int32,
    pq_code: M uint8 bytes) — M bytes/vector instead of 4*dim float32, a
    32x shrink at dim=64 / M=8 — so a 10^12-vector corpus's codes fit the
    cluster's aggregate RAM where raw vectors cannot. Centroids + codebooks
    are tiny driver state, broadcast per query."""

    centroids: np.ndarray       # (L, dim) coarse quantizer, unit-space
    codebooks: np.ndarray       # (M, ksub, dim//M) residual codebooks
    compressed: rd.Dataset      # (id_col, ivf_list, pq_code)
    id_col: str
    dim: int


def ivfpq_build(emb: rd.Dataset, *, n_lists: int = 32, m_subspaces: int = 8,
                train_sample: int = 8192, seed: int = 42,
                id_col: str = "vec_id",
                vec_col: str = "embedding",
                train: np.ndarray | None = None) -> IvfPqIndex:
    """Train coarse + residual quantizers on a bounded driver sample, then
    one encode pass over the corpus (centroids/codebooks broadcast once via
    ``ray.put``) that emits ONLY ids, list ids and M-byte PQ codes — the
    raw vector column never enters the compressed dataset.

    Residual PQ: each unit vector v with coarse list l is stored as
    per-subspace nearest codebook entries of (v - centroid_l); a query
    scores it as q.centroid_l + sum_j LUT[j, code_j] (asymmetric distance
    computation — one 256-entry table lookup per subspace, no decode).

    ``train``: explicit training matrix, same contract as
    :func:`ivf_build` (deterministic, oracle-replayable index)."""
    if train is not None:
        mat = np.asarray(train, dtype=np.float64)[:train_sample]
    else:
        parts = []
        got = 0
        for b in emb.select_columns([vec_col]).iter_batches(
                batch_format="pyarrow", batch_size=4096):
            v = b[vec_col].combine_chunks()
            m = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            m = m.reshape(b.num_rows, -1)
            parts.append(m)
            got += len(m)
            if got >= train_sample:
                break
        mat = np.concatenate(parts)[:train_sample]
    dim = mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    ds = dim // m_subspaces
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    cent = _kmeans(unit, n_lists, seed=seed)
    resid = unit - cent[_nearest_centroid(unit, cent)]
    ksub = min(256, len(resid))
    books = np.stack([
        _kmeans(np.ascontiguousarray(resid[:, j * ds:(j + 1) * ds]),
                ksub, seed=seed + 1 + j)
        for j in range(m_subspaces)
    ])
    ref = ray.put((cent, books))

    def encode(batch: pa.Table) -> pa.Table:
        c, cb = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "ivf_list": pa.array([], pa.int32()),
                             "pq_code": pa.array([], pa.list_(pa.uint8()))})
        ids, m = _unwrap(batch, id_col, vec_col)
        nm = np.linalg.norm(m, axis=1)
        nm[nm == 0] = 1.0
        u = m / nm[:, None]
        lists = _nearest_centroid(u, c)
        r = u - c[lists]
        codes = np.empty((len(u), len(cb)), dtype=np.uint8)
        for j in range(len(cb)):
            codes[:, j] = _nearest_centroid(
                np.ascontiguousarray(r[:, j * ds:(j + 1) * ds]), cb[j])
        n, M = codes.shape
        code_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * M, M, dtype=np.int32), pa.int32()),
            pa.array(codes.ravel(), pa.uint8()))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "ivf_list": pa.array(lists.astype(np.int32), pa.int32()),
            "pq_code": code_col,
        })

    compressed = emb.map_batches(encode, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    return IvfPqIndex(centroids=cent, codebooks=books, compressed=compressed,
                      id_col=id_col, dim=dim)


def ivfpq_query(index: IvfPqIndex, query: np.ndarray, k: int = 10, *,
                n_probe: int = 4) -> rd.Dataset:
    """Approximate top-k over the PQ-compressed corpus: probe the
    ``n_probe`` nearest lists, score by ADC table lookups only (the per
    batch work is one (n, M) fancy-index + row sum — no vector math, no
    raw vectors in memory). Returns (id, cos_sim) fixed-point 1e6 like the
    other ANN scorers."""
    import pyarrow.compute as pc

    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    qd = ((qn[None, :] - index.centroids) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(qd, kind="stable")[:n_probe]).astype(np.int32)
    offsets = index.centroids @ qn                     # (L,) q.centroid_l
    M, ksub, ds = index.codebooks.shape
    lut = np.stack([index.codebooks[j] @ qn[j * ds:(j + 1) * ds]
                    for j in range(M)])                # (M, ksub)
    id_col = index.id_col
    ref = ray.put((probe, offsets, lut))

    def score(batch: pa.Table) -> pa.Table:
        probe_ids, offs, tab = ray.get(ref)
        sub = batch.filter(pc.is_in(batch["ivf_list"],
                                    value_set=pa.array(probe_ids, pa.int32())))
        if sub.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.int64())})
        ids = sub[id_col].to_numpy(zero_copy_only=False)
        lists = sub["ivf_list"].to_numpy(zero_copy_only=False)
        cl = sub["pq_code"].combine_chunks()
        codes = cl.flatten().to_numpy(zero_copy_only=False).reshape(
            sub.num_rows, -1)
        sims = offs[lists] + tab[np.arange(codes.shape[1])[None, :],
                                 codes].sum(axis=1)
        fixed = np.floor(sims * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cos_sim": pa.array(fixed, pa.int64()),
        })

    scored = index.compressed.map_batches(score, batch_format="pyarrow",
                                          zero_copy_batch=True)
    return scored.sort(key=["cos_sim", id_col], descending=[True, False]).limit(k)


def ivfpq_topk(emb: rd.Dataset, query: np.ndarray, k: int = 10, *,
               n_lists: int = 32, m_subspaces: int = 8, n_probe: int = 4,
               train_sample: int = 8192, seed: int = 42,
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               train: np.ndarray | None = None) -> rd.Dataset:
    """One-shot IVF-PQ approximate top-k (build the index once with
    :func:`ivfpq_build` when serving several queries)."""
    index = ivfpq_build(emb, n_lists=n_lists, m_subspaces=m_subspaces,
                        train_sample=train_sample, seed=seed,
                        id_col=id_col, vec_col=vec_col, train=train)
    return ivfpq_query(index, query, k, n_probe=n_probe)


def cosine_topk_multi(emb: rd.Dataset, queries: np.ndarray, k: int = 10, *,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      query_ids=None) -> rd.Dataset:
    """Batched multi-query top-k: ONE matmul per batch scores every query
    against every row ((n x d) @ (d x Q)), the batch pre-selects its local
    top-k per query (ties on the rounded score kept, so the global cut is
    exact), and one ``groupby(query_id)`` finalizes. Per-batch emission is
    bounded by ~Q*k rows; total shuffle ~ Q*k*blocks — never corpus-sized.
    The batch-inference shape for ANN: serving Q queries costs one scan,
    not Q scans (SURVEY §2.11 batched model scoring)."""
    Q = np.asarray(queries, dtype=np.float64)
    if Q.ndim == 1:
        Q = Q[None, :]
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qu = Q / qn[:, None]
    qids = (np.arange(len(Q), dtype=np.int64) if query_ids is None
            else np.asarray(query_ids, dtype=np.int64))
    ref = ray.put((Qu, qids))

    def score(batch: pa.Table) -> pa.Table:
        qu, qi = ray.get(ref)
        ids, m = _unwrap(batch, id_col, vec_col)
        if len(ids) == 0:  # guard BEFORE any matmul: m is (0, 0) here
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.int64())})
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qu.T) / norms[:, None]          # (n, Q) — one matmul
        fixed = np.floor(sims * 1_000_000.0 + 0.5).astype(np.int64)
        qs, vs, ss = [], [], []
        for j in range(fixed.shape[1]):
            col = fixed[:, j]
            if len(col) > k:
                kth = np.partition(col, -k)[-k]
                sel = np.flatnonzero(col >= kth)    # keep rounded-score ties
            else:
                sel = np.arange(len(col))
            qs.append(np.full(len(sel), qi[j], np.int64))
            vs.append(ids[sel])
            ss.append(col[sel])
        return pa.table({
            "query_id": pa.array(np.concatenate(qs), pa.int64()),
            id_col: pa.array(np.concatenate(vs), pa.int64()),
            "cos_sim": pa.array(np.concatenate(ss), pa.int64()),
        })

    cands = emb.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)

    def head(group: pa.Table) -> pa.Table:
        s = group["cos_sim"].to_numpy(zero_copy_only=False)
        v = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]
        return group.take(pa.array(order, pa.int64()))

    return cands.groupby("query_id").map_groups(head, batch_format="pyarrow")


def pca_fit(emb: rd.Dataset, k: int, *, id_col: str = "vec_id",
            vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Distributed PCA fit: ONE pass of per-batch (n, sum_x, X^T X)
    partials (each a (d+1) x d float block — d is the embedding width, so
    the driver reduction is O(d^2) regardless of corpus size), then a
    d x d eigendecomposition on the driver.

    Returns (mean, components) with components of shape (k, d), rows =
    top-k eigenvectors of the covariance, deterministically sign-fixed
    (largest-|coordinate| entry positive; ties to the earlier index)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids, mat = _unwrap(batch, id_col, vec_col)
        if len(ids) == 0:
            return pa.table({"blob": pa.array([], pa.binary())})
        import pickle

        n = len(ids)
        s = mat.sum(axis=0)
        g = mat.T @ mat
        return pa.table({"blob": pa.array(
            [pickle.dumps((n, s, g))], pa.binary())})

    import pickle

    n_tot, s_tot, g_tot = 0, None, None
    for row in emb.select_columns([id_col, vec_col]).map_batches(
            partial, batch_format="pyarrow").take_all():
        n, s, g = pickle.loads(row["blob"])
        n_tot += n
        s_tot = s if s_tot is None else s_tot + s
        g_tot = g if g_tot is None else g_tot + g
    if n_tot == 0:
        raise ValueError("PCA fit over an empty embedding table")
    mean = s_tot / n_tot
    cov = g_tot / n_tot - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)            # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T           # (k, d), descending
    for i in range(comps.shape[0]):       # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_transform(emb: rd.Dataset, mean: np.ndarray,
                  components: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  out_col: str = "proj") -> rd.Dataset:
    """Project each embedding onto the fitted components (broadcast once
    via ``ray.put``; per-batch float64 matmul)."""
    ref = ray.put((np.asarray(mean, np.float64),
                   np.asarray(components, np.float64)))

    def f(batch: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        ids, mat = _unwrap(batch, id_col, vec_col)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.list_(pa.float64()))})
        proj = (mat - m) @ c.T
        return pa.table({id_col: batch[id_col],
                         out_col: pa.array(list(proj),
                                           pa.list_(pa.float64()))})

    return emb.select_columns([id_col, vec_col]).map_batches(
        f, batch_format="pyarrow")
