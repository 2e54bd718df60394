"""Deduplication family (SURVEY-extension, first-class at 100 TB):

- exact:      content hash -> hash-shuffle group -> keep-first
- minhash+LSH: shingle -> minhash signature -> banded bucketing -> candidate
               pairs -> exact-Jaccard verify -> connected clusters
- simhash:    64-bit sign-aggregated token hash; near-dup = small Hamming
- ngram Jaccard: exact verification kernel (shared by minhash verify)
- embedding near-dup: cosine over an embedding column

Partitioning notes (per-operator, SURVEY §2 custom-op rule):
- exact dedup shuffles only (fp, id) pairs, not text;
- LSH bucket groupby shuffles (band, bucket_hash, doc_id) triples — O(docs ×
  bands) small rows; candidate verification broadcasts the shingle-hash sets
  at sandbox scale (scale path: co-partitioned pair join shipping sketches);
- cluster formation = min-label propagation over the candidate-pair graph —
  the same CC kernel family; done driver-side here because verified pair sets
  are tiny relative to the corpus (documented assumption).

Reference parity: exact dedup mirrors overlap-peak reconciliation
(peak_detect_v4.py:1710-1728, set-intersection keep-richest); candidate
banding mirrors the banded proximity join of discords to invalid peaks
(ml/anomaly/stump_anom.py:89-103).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ray.data.aggregate import Count, Min

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> rd.Dataset:
    """(fp, keep_id, n_copies): md5 group -> min id kept. The shuffle moves
    only (fp, id) pairs."""

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        fps = [hashlib.md5((t or "").encode()).hexdigest()
               for t in batch[text_col].to_pylist()]
        return pa.table({"fp": pa.array(fps, pa.string()), id_col: ids})

    pairs = docs.map_batches(fp, batch_format="pyarrow")
    return pairs.groupby("fp").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------------------
# shingles / minhash
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)]
    out = np.unique(np.array(
        [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
         for s in shingles], dtype=np.uint64))
    return out


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: doc -> minhash signature (list<int64>).
    Permutation parameters derived once per worker from the seed."""

    def __init__(self, k: int = 3, num_perm: int = 64, seed: int = 42) -> None:
        self.k = k
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text or "", self.k)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.int64)
        # (a*h + b) mod p, min over shingles, vectorized across permutations
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.array(sigs, pa.list_(pa.int64())),
        })


def minhash_signatures(docs: rd.Dataset, *, k: int = 3, num_perm: int = 64,
                       seed: int = 42, concurrency=2) -> rd.Dataset:
    return docs.map_batches(
        MinHasher, fn_constructor_kwargs={"k": k, "num_perm": num_perm, "seed": seed},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency,
    )


def lsh_candidate_pairs(sigs: rd.Dataset, *, bands: int = 16) -> rd.Dataset:
    """signatures -> banded buckets -> distinct candidate pairs (a < b).

    Shuffle payload: (band, bucket_hash, doc_id). Pair explosion happens
    per bucket group; a bucket of g docs yields C(g,2) pairs — buckets are
    capped (cap documented) to bound worst-case blowup on degenerate data.
    """

    def to_buckets(batch: pa.Table) -> pa.Table:
        sig = batch["sig"].combine_chunks()
        flat = sig.flatten().to_numpy(zero_copy_only=False)
        offs = sig.offsets.to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rows_band, rows_hash, rows_id = [], [], []
        for i in range(len(ids)):
            s = flat[offs[i]: offs[i + 1]]
            r = len(s) // bands
            for b in range(bands):
                chunk = s[b * r: (b + 1) * r]
                hb = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                rows_band.append(b)
                rows_hash.append(int.from_bytes(hb, "little") >> 1)
                rows_id.append(int(ids[i]))
        return pa.table({
            "band": pa.array(rows_band, pa.int32()),
            "bucket": pa.array(rows_hash, pa.int64()),
            "doc_id": pa.array(rows_id, pa.int64()),
        })

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    CAP = 256  # max docs per bucket considered (degenerate-data guard)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())[:CAP]
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii].astype("int64"),
                             "b": ids[jj].astype("int64")})

    cand = buckets.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs across bands
    return cand.groupby(["a", "b"]).count().select_columns(["a", "b"])


def verify_jaccard(pairs: rd.Dataset, docs: rd.Dataset, *, k: int = 3,
                   threshold: float = 0.0) -> rd.Dataset:
    """(a, b, jaccard) with exact k-shingle Jaccard; docs broadcast once
    (scale path: co-partitioned join shipping shingle sketches)."""
    texts = {}
    for b in docs.select_columns(["doc_id", "text"]).iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            texts[b["doc_id"][i].as_py()] = b["text"][i].as_py()
    ref = ray.put(texts)

    def f(batch: pa.Table) -> pa.Table:
        t = ray.get(ref)
        a = batch["a"].to_pylist()
        bb = batch["b"].to_pylist()
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, bb):
            ha = _shingle_hashes(t.get(x, "") or "", k)
            hb = _shingle_hashes(t.get(y, "") or "", k)
            inter = np.intersect1d(ha, hb, assume_unique=True).size
            union = len(ha) + len(hb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(x); out_b.append(y); out_j.append(round(j, 6))
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return pairs.map_batches(f, batch_format="pyarrow")


def near_dup_clusters(verified_pairs: rd.Dataset) -> dict[int, int]:
    """Verified pairs -> cluster id (min doc_id) per doc. Driver union-find;
    assumption (documented): verified near-dup pairs are tiny vs the corpus.
    At scale: run the CC kernel on the pair graph instead."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for b in verified_pairs.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            a, c = b["a"][i].as_py(), b["b"][i].as_py()
            ra, rc = find(a), find(c)
            if ra != rc:
                lo, hi = min(ra, rc), max(ra, rc)
                parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def ngram_jaccard_pairs(docs: rd.Dataset, *, lang_col: str = "lang",
                        len_col: str = "n_chars", window: int = 10,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> rd.Dataset:
    """Exact word-set Jaccard for candidate pairs bucketed by (lang, length
    window): pairs (a < b) with equal ``lang_col`` and |len diff| <= window.

    Physical plan: groupby(lang) -> within group, sort by length and sweep a
    sliding window (the banded range-join pattern, SURVEY §2.7); word sets
    are built once per doc per group. Jaccard emitted as fixed-point int64
    (floor(j*1e6+0.5), SQL-twin exact). Pairs where either side has no
    words are dropped (matches the SQL inner join on non-empty word sets).
    """

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([len_col, id_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        lens = g[len_col].to_numpy()
        sets = [set((t or "").split()) for t in g[text_col]]
        a_out, b_out, j_out = [], [], []
        for i in range(len(g)):
            if not sets[i]:
                continue
            j = i + 1
            while j < len(g) and lens[j] - lens[i] <= window:
                if sets[j]:
                    inter = len(sets[i] & sets[j])
                    union = len(sets[i]) + len(sets[j]) - inter
                    a, b = (int(ids[i]), int(ids[j])) if ids[i] < ids[j] else (
                        int(ids[j]), int(ids[i]))
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(int(np.floor(inter / float(union) * 1_000_000 + 0.5)))
                j += 1
        return pd.DataFrame({
            "a_id": pd.Series(a_out, dtype="int64"),
            "b_id": pd.Series(b_out, dtype="int64"),
            "jaccard": pd.Series(j_out, dtype="int64"),
        })

    return docs.groupby(lang_col).map_groups(per_lang, batch_format="pandas")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: 64-bit simhash over whitespace tokens."""

    def __init__(self) -> None:
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                               "little")
            bits = (h >> self.bits) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        v = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                v |= np.uint64(1) << np.uint64(i)
        return int(np.int64(v.astype(np.int64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.simhash(t) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(vals, pa.int64())})


def simhash_table(docs: rd.Dataset, *, concurrency=2) -> rd.Dataset:
    return docs.map_batches(SimHasher, batch_format="pyarrow", batch_size=1024,
                            concurrency=concurrency)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(emb: rd.Dataset, *, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> rd.Dataset:
    """(a_id, b_id, cos_sim) for pairs with cosine > threshold.

    Physical plan: the (id, matrix) block is broadcast once; each batch
    computes a vectorized float64 matmul against the broadcast side and
    keeps pairs a < b. Scale path: LSH-bucket by random hyperplane signs
    and compare within buckets (similarity.lsh_buckets)."""
    rows = pa.concat_tables(list(
        emb.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
    ids = rows[id_col].to_numpy(zero_copy_only=False)
    vec = rows[vec_col].combine_chunks()
    mat = vec.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(mat) // max(1, len(ids))
    mat = mat.reshape(len(ids), dim)
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    ref = ray.put((ids, mat, norm))

    def f(batch: pa.Table) -> pa.Table:
        all_ids, all_mat, all_norm = ray.get(ref)
        bid = batch[id_col].to_numpy(zero_copy_only=False)
        bv = batch[vec_col].combine_chunks()
        bm = bv.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        bm = bm.reshape(len(bid), -1)
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        sims = (bm @ all_mat.T) / bn[:, None] / all_norm[None, :]
        ii, jj = np.nonzero((sims > threshold) & (bid[:, None] < all_ids[None, :]))
        fixed = np.floor(sims[ii, jj] * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({
            "a_id": pa.array(bid[ii], pa.int64()),
            "b_id": pa.array(all_ids[jj], pa.int64()),
            "cos_sim": pa.array(fixed, pa.int64()),
        })

    return emb.map_batches(f, batch_format="pyarrow", batch_size=2048)
