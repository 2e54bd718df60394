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
  bands) small rows; oversized buckets are truncated WITH a logged warning;
- candidate verification is a co-partitioned two-hop join keyed by doc_id
  shipping precomputed shingle-hash arrays (no text broadcast anywhere);
- cluster formation runs the distributed CC kernel over the verified-pair
  graph (min doc_id labels) — same superstep machinery as the web graph.

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

from ray.data.aggregate import Count, Min, Sum

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _xd_map_task(tabs, K: int, id_col: str):
    """Exchange map for exact_dedup_groups: partition (fp, id) pairs by
    the precomputed int64 fp prefix % K (equal fps always
    co-partition) — pure vectorized modulo, no fp re-parsing."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return [None] * K
    from .exchange import scatter_by_part

    tab = pa.concat_tables(tabs)
    pre = tab["pre"].to_numpy(zero_copy_only=False)
    return scatter_by_part(tab, pre % K, K, ["fp", id_col])


def _xd_reduce_task(k: int, slices, id_col: str):
    """Exchange reduce: per-fp (min id, count) — exact, fp wholly owned."""
    tabs = [s for s in slices if s is not None and s.num_rows]
    if not tabs:
        return pa.table({"fp": pa.array([], pa.string()),
                         "keep_id": pa.array([], pa.int64()),
                         "n_copies": pa.array([], pa.int64())})
    return (pa.concat_tables(tabs).group_by("fp")
            .aggregate([(id_col, "min"), ([], "count_all")])
            .rename_columns(["fp", "keep_id", "n_copies"]))


def exact_dedup_groups(docs: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> rd.Dataset:
    """(fp, keep_id, n_copies): md5 group -> min id kept. The shuffle moves
    only (fp, id) pairs — as ONE `exchange.exchange` raw-task round by
    default (fp-prefix partition, per-partition Arrow min/count; Dataset
    groupby twin behind ``RAYLINK_EXACTDD_EXCHANGE=dataset``)."""

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        digs = [hashlib.md5((t or "").encode()).digest()
                for t in batch[text_col].to_pylist()]
        # int64 fp prefix computed ONCE here (the md5 loop already runs);
        # the exchange map's partitioning is then a vectorized modulo
        pre = (np.frombuffer(b"".join(d[:8] for d in digs), dtype=">u8")
               .astype(np.int64) & np.int64((1 << 62) - 1)
               if digs else np.array([], np.int64))
        return pa.table({"fp": pa.array([d.hex() for d in digs],
                                        pa.string()),
                         "pre": pa.array(pre, pa.int64()),
                         id_col: ids})

    pairs = docs.map_batches(fp, batch_format="pyarrow")

    import os as _os

    if _os.environ.get("RAYLINK_EXACTDD_EXCHANGE", "") != "dataset":
        from .exchange import exchange as _exchange

        refs = pairs.materialize().to_arrow_refs()
        K = min(32, max(1, len(refs)))
        red = _exchange(refs, K, _xd_map_task, _xd_reduce_task,
                        map_args=(id_col,), reduce_args=(id_col,))
        return rd.from_arrow_refs(red)

    return pairs.select_columns(["fp", id_col]).groupby("fp").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------------------
# shingles / minhash
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_SH_SEED = 17
_SH_A = np.uint64(0x9E3779B97F4A7C15)  # odd mix constants for k-gram combine
# wraparound square, computed in Python ints to avoid a noisy numpy
# overflow RuntimeWarning in every worker's import log
_SH_A2 = np.uint64((0x9E3779B97F4A7C15 * 0x9E3779B97F4A7C15)
                   & 0xFFFFFFFFFFFFFFFF)


def _token_hashes(texts: pa.Array | pa.ChunkedArray):
    """Bulk token hashing for a batch of texts: one Arrow whitespace split +
    ONE polars hash over the flattened token array. Returns (hashes, offs)
    with empty tokens masked out. The per-shingle Python/blake2b loop of
    round 1 is gone; determinism is pinned to the polars hash like
    graph.hash64."""
    import polars as pl
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.coalesce(texts, pa.scalar("")))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return np.array([], np.uint64), offs
    h = pl.from_arrow(flat).hash(seed=_SH_SEED).to_numpy().astype(np.uint64)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = tok_len > 0
    if not keep.all():
        # rebuild offsets over kept tokens (whitespace runs make empties)
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), offs[:-1]) \
            if len(offs) > 1 and offs[-1] > 0 else np.zeros(len(offs) - 1, np.int64)
        kept_per_doc[np.diff(offs) == 0] = 0
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)])
        h = h[keep]
    return h, offs


def _shingles_from_tokens(h: np.ndarray, lo: int, hi: int, k: int) -> np.ndarray:
    """Sorted distinct k-gram shingle hashes of one doc's token-hash slice:
    a vectorized polynomial combine of k consecutive token hashes (uint64
    wraparound). Docs shorter than k collapse to one whole-text shingle,
    matching the round-1 join semantics."""
    t = h[lo:hi]
    n = len(t)
    if n == 0:
        return np.array([], np.uint64)
    if n < k:
        acc = np.uint64(0)
        for v in t:  # < k elements
            acc = acc * _SH_A + v
        return np.array([acc], np.uint64)
    acc = np.zeros(n - k + 1, np.uint64)
    for j in range(k):  # k tiny vectorized passes
        acc = acc * _SH_A + t[j: n - k + 1 + j]
    return np.unique(acc)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Single-doc convenience wrapper (tests)."""
    h, offs = _token_hashes(pa.array([text or ""], pa.string()))
    return _shingles_from_tokens(h, 0, len(h), k)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: doc -> minhash signature (list<int64>).
    Permutation parameters derived once per worker from the seed.

    Round 2: fully batch-vectorized — one bulk token hash per batch, one
    polynomial k-gram combine, then per-permutation segment minima via
    ``np.minimum.reduceat`` (64 vectorized passes; no per-shingle Python)."""

    def __init__(self, k: int = 3, num_perm: int = 64, seed: int = 42) -> None:
        self.k = k
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text or "", self.k)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.int64)
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, offs = _token_hashes(batch["text"])
        n = batch.num_rows
        sh_parts = [ _shingles_from_tokens(h, offs[i], offs[i + 1], self.k)
                     for i in range(n) ]
        lens = np.array([len(s) for s in sh_parts], np.int64)
        sigs = np.zeros((n, self.num_perm), np.int64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            SH = np.concatenate(sh_parts)
            starts = np.concatenate([[0], np.cumsum(lens)])[:-1][nonempty]
            M = np.uint64(_MERSENNE)
            for p in range(self.num_perm):  # each pass fully vectorized
                vals = (SH * self.a[p] + self.b[p]) % M
                sigs[nonempty, p] = np.minimum.reduceat(vals, starts).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.array(list(sigs), pa.list_(pa.int64())),
        })


def minhash_signatures(docs: rd.Dataset, *, k: int = 3, num_perm: int = 64,
                       seed: int = 42, concurrency=2) -> rd.Dataset:
    return docs.map_batches(
        MinHasher, fn_constructor_kwargs={"k": k, "num_perm": num_perm, "seed": seed},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency,
    )


# fixed odd multipliers for the vectorized polynomial band hash (equal band
# chunks -> equal hash; unequal -> collision only at ~2^-63, and any such
# false candidate is filtered by verify_jaccard)
_BAND_COEFS = np.random.default_rng(1234).integers(
    1, 1 << 62, size=256, dtype=np.int64).astype(np.uint64) | np.uint64(1)
_GOLD64 = np.uint64(0x9E3779B97F4A7C15)


def _lshb_map_task(tabs, K: int):
    """Exchange map for LSH banding: partition (band, bucket, doc_id)
    rows by a (band, bucket) hash % K — a bucket is wholly owned by one
    reduce."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return [None] * K
    from .exchange import scatter_by_part

    tab = pa.concat_tables(tabs)
    band = tab["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
    bucket = tab["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    part = ((bucket * np.uint64(1_000_003) + band)
            % np.uint64(K)).astype(np.int64)
    return scatter_by_part(tab, part, K)


def _lshb_reduce_task(k: int, slices, cap: int):
    """Exchange reduce: per-(band, bucket) pair explosion with the SAME
    logged cap-truncation as the Dataset twin, then a local distinct
    (cross-band duplicates within this partition collapse here; the
    global distinct is the second exchange)."""
    tabs = [s for s in slices if s is not None and s.num_rows]
    if not tabs:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    tab = pa.concat_tables(tabs)
    band = tab["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = tab["bucket"].to_numpy(zero_copy_only=False)
    ids = tab["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, band, bucket))
    band, bucket, ids = band[order], bucket[order], ids[order]
    new = np.r_[True, (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])]
    seg = np.flatnonzero(new)
    seg = np.append(seg, len(ids))
    outs_a, outs_b = [], []
    for s, e in zip(seg[:-1], seg[1:]):
        g = np.sort(ids[s:e])
        if len(g) > cap:
            import logging

            logging.getLogger("raylink.dedup").warning(
                "LSH bucket truncated: band=%s bucket=%s had %d docs, "
                "kept %d (dropped %d candidate sources)",
                band[s], bucket[s], len(g), cap, len(g) - cap)
            g = g[:cap]
        if len(g) < 2:
            continue
        ii, jj = np.triu_indices(len(g), k=1)
        outs_a.append(g[ii])
        outs_b.append(g[jj])
    if not outs_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    a = np.concatenate(outs_a)
    b = np.concatenate(outs_b)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return pa.table({"a": pa.array(a[keep], pa.int64()),
                     "b": pa.array(b[keep], pa.int64())})


def _pairdist_map_task(tabs, K: int):
    """Second exchange map: partition (a, b) pairs by a pair hash % K."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return [None] * K
    from .exchange import scatter_by_part

    tab = pa.concat_tables(tabs)
    a = tab["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = tab["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    part = ((a * np.uint64(1_000_003) + b)
            % np.uint64(K)).astype(np.int64)
    return scatter_by_part(tab, part, K)


def _pairdist_reduce_task(k: int, slices):
    """Second exchange reduce: global distinct (a, b) in this partition."""
    tabs = [s for s in slices if s is not None and s.num_rows]
    if not tabs:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    tab = pa.concat_tables(tabs)
    a = tab["a"].to_numpy(zero_copy_only=False)
    b = tab["b"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return pa.table({"a": pa.array(a[keep], pa.int64()),
                     "b": pa.array(b[keep], pa.int64())})


def lsh_candidate_pairs(sigs: rd.Dataset, *, bands: int = 16,
                        cap: int = 256) -> rd.Dataset:
    """signatures -> banded buckets -> distinct candidate pairs (a < b).

    Shuffle payload: (band, bucket_hash, doc_id). Banding is fully
    vectorized: the signature matrix is reshaped (n, bands, r) and each
    band row is hashed with one polynomial dot product — no per-row
    Python. Pair explosion happens per bucket group; a bucket of g docs
    yields C(g,2) pairs, so buckets larger than ``cap`` are truncated to
    bound degenerate blowup — every truncation is LOGGED (bucket id +
    dropped count) rather than silent.

    Default physical plan (round-5 session 3): TWO `exchange.exchange`
    raw-task rounds — (band, bucket)-keyed explosion with an in-reduce
    local distinct, then pair-keyed global distinct; the Dataset
    sort-shuffle twins stay behind ``RAYLINK_LSH_EXCHANGE=dataset``.
    """

    def to_buckets(batch: pa.Table) -> pa.Table:
        sig = batch["sig"].combine_chunks()
        flat = sig.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        if n == 0 or len(flat) == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        num_perm = len(flat) // n
        r = num_perm // bands
        mat = flat.reshape(n, num_perm)[:, : bands * r].reshape(n, bands, r)
        hb = (mat * _BAND_COEFS[None, None, :r]).sum(axis=2)  # mod 2^64
        hb = ((hb * _GOLD64) >> np.uint64(1)).astype(np.int64)  # 63-bit, >=0
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                             pa.int32()),
            "bucket": pa.array(hb.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
        })

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow",
                               zero_copy_batch=True)

    import os as _os

    if _os.environ.get("RAYLINK_LSH_EXCHANGE", "") != "dataset":
        from .exchange import exchange as _exchange

        refs = buckets.materialize().to_arrow_refs()
        K = min(32, max(1, len(refs)))
        red = _exchange(refs, K, _lshb_map_task, _lshb_reduce_task,
                        reduce_args=(int(cap),))
        red2 = _exchange(red, K, _pairdist_map_task, _pairdist_reduce_task)
        return rd.from_arrow_refs(red2)

    def pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) > cap:
            import logging

            logging.getLogger("raylink.dedup").warning(
                "LSH bucket truncated: band=%s bucket=%s had %d docs, "
                "kept %d (dropped %d candidate sources)",
                g["band"][0].as_py(), g["bucket"][0].as_py(), len(ids),
                cap, len(ids) - cap)
            ids = ids[:cap]
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ii], pa.int64()),
                         "b": pa.array(ids[jj], pa.int64())})

    cand = buckets.groupby(["band", "bucket"]).map_groups(
        pairs, batch_format="pyarrow")
    # distinct pairs across bands
    return cand.groupby(["a", "b"]).count().select_columns(["a", "b"])


class _Shingler:
    """Actor-pool stage: doc -> sorted k-shingle hash array (list<uint64>).
    The same shingle hashes minhash is built from; computed once and
    SHIPPED through the verify join instead of re-broadcasting texts."""

    def __init__(self, k: int = 3) -> None:
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = [_shingle_hashes(t or "", self.k)
              for t in batch["text"].to_pylist()]
        return pa.table({
            "key": batch["doc_id"],
            "kind": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
            "other": pa.array(np.full(batch.num_rows, -1), pa.int64()),
            "sh": pa.array(sh, pa.list_(pa.uint64())),
        }, schema=_VJ_SCHEMA)


_VJ_SCHEMA = pa.schema([
    pa.field("key", pa.int64()), pa.field("kind", pa.int8()),
    pa.field("other", pa.int64()), pa.field("sh", pa.list_(pa.uint64())),
])


def verify_jaccard(pairs: rd.Dataset, docs: rd.Dataset, *, k: int = 3,
                   threshold: float = 0.0, concurrency=2) -> rd.Dataset:
    """(a, b, jaccard) with exact k-shingle Jaccard, as a CO-PARTITIONED
    two-hop join shipping precomputed shingle-hash arrays (round 2 — no
    corpus-sized text broadcast anywhere):

      hop 1: ``groupby(a)`` co-locates each candidate pair with doc a's
             shingle row and re-keys the pair by b, carrying sh_a;
      hop 2: ``groupby(b)`` attaches sh_b; the intersection per pair is a
             vectorized sorted-array ``intersect1d``.

    Only shingle arrays of docs that actually appear in pairs ride the
    second hop; the shuffles are keyed by doc_id (no skew beyond a doc's
    pair fan-out)."""
    shingles = docs.select_columns(["doc_id", "text"]).map_batches(
        _Shingler, fn_constructor_kwargs={"k": k}, batch_format="pyarrow",
        batch_size=1024, concurrency=concurrency).materialize()

    def pair_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty_sh = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32), pa.int32()),
            pa.array([], pa.uint64()))
        return pa.table({
            "key": batch["a"],
            "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            "other": batch["b"],
            "sh": empty_sh,
        }, schema=_VJ_SCHEMA)

    def _unwrap(g: pa.Table):
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        sh = g["sh"].combine_chunks()
        flat = sh.flatten().to_numpy(zero_copy_only=False)
        offs = sh.offsets.to_numpy(zero_copy_only=False)
        return kinds, flat, offs

    def hop1(g: pa.Table) -> pa.Table:
        kinds, flat, offs = _unwrap(g)
        di = np.flatnonzero(kinds == 0)
        pi = np.flatnonzero(kinds == 1)
        if len(pi) == 0 or len(di) == 0:
            return _VJ_SCHEMA.empty_table()
        a = int(g["key"][0].as_py())
        sha = flat[offs[di[0]]: offs[di[0] + 1]]
        bs = g["other"].to_numpy(zero_copy_only=False)[pi]
        n = len(bs)
        sh_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * len(sha), pa.int32()),
            pa.array(np.tile(sha, n), pa.uint64()))
        return pa.table({
            "key": pa.array(bs, pa.int64()),
            "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            "other": pa.array(np.full(n, a), pa.int64()),
            "sh": sh_col,
        }, schema=_VJ_SCHEMA)

    def hop2(g: pa.Table) -> pa.Table:
        kinds, flat, offs = _unwrap(g)
        di = np.flatnonzero(kinds == 0)
        pi = np.flatnonzero(kinds == 1)
        if len(pi) == 0 or len(di) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        b_id = int(g["key"][0].as_py())
        shb = flat[offs[di[0]]: offs[di[0] + 1]]
        others = g["other"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_j = [], [], []
        for i in pi:
            sha = flat[offs[i]: offs[i + 1]]
            inter = np.intersect1d(sha, shb, assume_unique=True).size
            union = len(sha) + len(shb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(int(others[i]))
                out_b.append(b_id)
                out_j.append(round(j, 6))
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    prows = pairs.map_batches(pair_rows, batch_format="pyarrow")
    mid = shingles.union(prows).groupby("key").map_groups(
        hop1, batch_format="pyarrow")
    return shingles.union(mid).groupby("key").map_groups(
        hop2, batch_format="pyarrow")


def near_dup_components(verified_pairs: rd.Dataset, *, P: int = 8) -> rd.Dataset:
    """Verified pairs -> (doc_id, cluster) via the DISTRIBUTED CC kernel
    (round 2: the pair graph is a graph — min-doc_id labels come from the
    same superstep machinery as the web-graph components; round 1's driver
    union-find removed). Docs in no verified pair are absent (singletons)."""
    from .graph import build_graph
    from .kernels import connected_components
    from .pipelines.flagship import join_keys

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["a"], "dst": batch["b"]})

    edges = verified_pairs.map_batches(to_edges, batch_format="pyarrow")
    sg = build_graph(edges, P=P, symmetric=True)
    comps = connected_components(sg, init="key")
    keyed = join_keys(comps, sg, "comp")

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["key"], "cluster": batch["comp"]})

    return keyed.map_batches(proj, batch_format="pyarrow")


def near_dup_clusters(verified_pairs: rd.Dataset) -> dict[int, int]:
    """Driver dict view of :func:`near_dup_components` (tests / small
    results only — the dataset form is the scale path)."""
    df = near_dup_components(verified_pairs).to_pandas()
    return dict(zip(df["doc_id"].astype(int), df["cluster"].astype(int)))


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
    """Actor-pool stage: 64-bit simhash over whitespace tokens, fully
    vectorized (round 2 — the per-token Python loop removed): one Arrow
    whitespace split + ONE bulk polars token hash per batch, a (tokens, 64)
    sign matrix, and a per-doc segment reduction (``np.add.reduceat``).
    Determinism is pinned to the polars hash like graph.hash64."""

    _SEED = 9

    def __init__(self) -> None:
        self.bitpos = np.arange(64, dtype=np.uint64)

    def _sim_batch(self, texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
        import pyarrow.compute as pc

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        toks = pc.utf8_split_whitespace(pc.coalesce(texts, pa.scalar("")))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            return np.zeros(n, np.int64)
        import polars as pl

        h = pl.from_arrow(flat).hash(seed=self._SEED).to_numpy().astype(np.uint64)
        signed = (((h[:, None] >> self.bitpos[None, :]) & np.uint64(1))
                  .astype(np.int32) * 2 - 1)
        # whitespace runs can yield empty tokens: they must not vote
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        signed[tok_len == 0] = 0
        counts = np.diff(offs)
        nonempty = np.flatnonzero(counts > 0)
        acc = np.zeros((n, 64), np.int64)
        if len(nonempty):
            acc[nonempty] = np.add.reduceat(signed, offs[nonempty], axis=0)
        bits = (acc > 0).astype(np.uint64)
        return (bits << self.bitpos[None, :]).sum(axis=1).view(np.int64)

    def simhash(self, text: str) -> int:
        return int(self._sim_batch(pa.array([text or ""], pa.string()))[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = self._sim_batch(batch["text"])
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(vals, pa.int64())})


def simhash_table(docs: rd.Dataset, *, concurrency=2) -> rd.Dataset:
    return docs.map_batches(SimHasher, batch_format="pyarrow", batch_size=1024,
                            concurrency=concurrency)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

@ray.remote
def _prep_chunk(tab: pa.Table, id_col: str, vec_col: str):
    """Arrow block -> (ids, unit-ish matrix parts); returned plasma-to-
    plasma, driver owns only the ref."""
    if tab.num_rows == 0 or id_col not in tab.schema.names:
        return None
    ids = tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v = tab[vec_col].combine_chunks()
    mat = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = mat.reshape(len(ids), -1)
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    return ids, mat, norm


def embedding_near_dups(emb: rd.Dataset, *, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        chunk_rows: int = 4096) -> rd.Dataset:
    """(a_id, b_id, cos_sim) for ALL pairs with cosine > threshold — exact.

    Physical plan (round 2 — the full-matrix broadcast removed): the corpus
    is split into B = ceil(n/chunk_rows) chunks prepared in worker tasks
    (driver holds refs only); a Dataset of the C(B+1, 2) chunk PAIRS fans
    out, each task fetching exactly two chunks and running one float64
    matmul. Work is O(n^2) — that is the exact-answer lower bound — but
    per-task memory is O(chunk_rows * dim) and the quadratic grid
    parallelizes across the cluster. For the sub-quadratic approximate
    path see :func:`embedding_near_dups_lsh`."""
    memb = emb.select_columns([id_col, vec_col]).materialize()
    n = memb.count()
    if n == 0:
        return rd.from_arrow(pa.table({"a_id": pa.array([], pa.int64()),
                                       "b_id": pa.array([], pa.int64()),
                                       "cos_sim": pa.array([], pa.int64())}))
    B = max(1, -(-n // chunk_rows))
    blocks = memb.repartition(B).materialize().to_arrow_refs()
    prep = [_prep_chunk.remote(r, id_col, vec_col) for r in blocks]

    ii, jj = np.triu_indices(len(prep))
    pairs_ds = rd.from_arrow(pa.table({
        "i": pa.array(ii.astype(np.int64)), "j": pa.array(jj.astype(np.int64)),
    })).repartition(min(len(ii), 64))

    def compare(batch: pa.Table) -> pa.Table:
        import ray as _ray

        out_a, out_b, out_s = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ci = _ray.get(prep[i])
            cj = ci if i == j else _ray.get(prep[j])
            if ci is None or cj is None:
                continue
            ids_i, mat_i, norm_i = ci
            ids_j, mat_j, norm_j = cj
            sims = (mat_i @ mat_j.T) / norm_i[:, None] / norm_j[None, :]
            mask = sims > threshold
            if i == j:
                mask &= ids_i[:, None] < ids_j[None, :]
            else:
                mask &= ids_i[:, None] != ids_j[None, :]
            ai, bj = np.nonzero(mask)
            if len(ai) == 0:
                continue
            a = ids_i[ai]
            b = ids_j[bj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(np.floor(sims[ai, bj] * 1_000_000.0 + 0.5).astype(np.int64))
        if not out_a:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.int64())})
        return pa.table({
            "a_id": pa.array(np.concatenate(out_a), pa.int64()),
            "b_id": pa.array(np.concatenate(out_b), pa.int64()),
            "cos_sim": pa.array(np.concatenate(out_s), pa.int64()),
        })

    return pairs_ds.map_batches(compare, batch_format="pyarrow")


def embedding_near_dups_lsh(emb: rd.Dataset, *, threshold: float = 0.95,
                            n_planes: int = 8, n_tables: int = 4,
                            seed: int = 42, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> rd.Dataset:
    """Approximate near-dup pairs: ``n_tables`` independent random-
    hyperplane LSH tables bucket the vectors; exact cosine runs only
    WITHIN buckets; pairs are deduplicated across tables. Sub-quadratic —
    the 100 TB path. Never emits a false positive (every candidate is
    exactly verified); recall rises with n_tables (measured in tests
    against :func:`embedding_near_dups`)."""
    from ray.data.aggregate import Max

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[vec_col].combine_chunks()
        mat = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = mat.reshape(len(ids), -1)
        dim = mat.shape[1]
        tabs = []
        for t in range(n_tables):
            rng = np.random.default_rng(seed + t)  # same planes in every task
            planes = rng.standard_normal((n_planes, dim))
            sig = ((mat @ planes.T) > 0) @ (1 << np.arange(n_planes))
            tabs.append(pa.table({
                "table": pa.array(np.full(len(ids), t), pa.int64()),
                "bucket": pa.array(sig.astype(np.int64), pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                vec_col: batch[vec_col],
            }))
        return pa.concat_tables(tabs)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) < 2:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.int64())})
        v = g[vec_col].combine_chunks()
        mat = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = mat.reshape(len(ids), -1)
        norm = np.linalg.norm(mat, axis=1)
        norm[norm == 0] = 1.0
        sims = (mat @ mat.T) / norm[:, None] / norm[None, :]
        mask = (sims > threshold) & (ids[:, None] < ids[None, :])
        ai, bj = np.nonzero(mask)
        fixed = np.floor(sims[ai, bj] * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({"a_id": pa.array(ids[ai], pa.int64()),
                         "b_id": pa.array(ids[bj], pa.int64()),
                         "cos_sim": pa.array(fixed, pa.int64())})

    cand = (emb.select_columns([id_col, vec_col])
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby(["table", "bucket"])
            .map_groups(bucket_pairs, batch_format="pyarrow"))
    # distinct across tables (cos_sim identical wherever the pair appears)
    return cand.groupby(["a_id", "b_id"]).aggregate(
        Max("cos_sim", alias_name="cos_sim"))


# ---------------------------------------------------------------------------
# chunk-level exact dedup (exact-substring / paragraph dedup analog)
# ---------------------------------------------------------------------------

def _cdd_fp_map(tabs, K: int):
    """Exchange map: partition (f1, f2, id) chunk-fp triples by f1 % K."""
    f1 = np.concatenate([t["f1"].to_numpy(zero_copy_only=False)
                         for t in tabs if t.num_rows]
                        or [np.array([], np.uint64)])
    f2 = np.concatenate([t["f2"].to_numpy(zero_copy_only=False)
                         for t in tabs if t.num_rows]
                        or [np.array([], np.uint64)])
    ids = np.concatenate([t["id"].to_numpy(zero_copy_only=False)
                          for t in tabs if t.num_rows]
                         or [np.array([], np.int64)])
    part = (f1 % np.uint64(K)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    f1, f2, ids, part = f1[order], f2[order], ids[order], part[order]
    bounds = np.searchsorted(part, np.arange(K + 1)).astype(np.int64)
    return [(f1[bounds[k]: bounds[k + 1]], f2[bounds[k]: bounds[k + 1]],
             ids[bounds[k]: bounds[k + 1]]) for k in range(K)]


def _cdd_fp_reduce(k: int, slices):
    """Exchange reduce: corpus-wide dup decision for this fp partition
    (equal fps always co-partition), pre-aggregated PER DOC before the
    second exchange — output rows are (id, n, ndup) partials."""
    f1 = np.concatenate([s[0] for s in slices] or [np.array([], np.uint64)])
    f2 = np.concatenate([s[1] for s in slices] or [np.array([], np.uint64)])
    ids = np.concatenate([s[2] for s in slices] or [np.array([], np.int64)])
    if len(f1):
        order = np.lexsort((f2, f1))
        s1, s2 = f1[order], f2[order]
        new = np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
        gid = np.cumsum(new) - 1
        cnt = np.bincount(gid)
        dup_sorted = cnt[gid] > 1
        dup = np.empty(len(f1), dtype=np.int64)
        dup[order] = dup_sorted.astype(np.int64)
        uid, inv = np.unique(ids, return_inverse=True)
        n = np.bincount(inv)
        ndup = np.bincount(inv, weights=dup).astype(np.int64)
    else:
        uid = np.array([], np.int64)
        n = ndup = np.array([], np.int64)
    return pa.table({"id": pa.array(uid.astype(np.int64), pa.int64()),
                     "n": pa.array(n.astype(np.int64), pa.int64()),
                     "ndup": pa.array(ndup, pa.int64())})


def _cdd_doc_map(tabs, K: int):
    """Second exchange map: partition per-doc partials by id % K."""
    ids = np.concatenate([t["id"].to_numpy(zero_copy_only=False)
                          for t in tabs if t.num_rows]
                         or [np.array([], np.int64)])
    n = np.concatenate([t["n"].to_numpy(zero_copy_only=False)
                        for t in tabs if t.num_rows]
                       or [np.array([], np.int64)])
    nd = np.concatenate([t["ndup"].to_numpy(zero_copy_only=False)
                         for t in tabs if t.num_rows]
                        or [np.array([], np.int64)])
    part = ids % K
    order = np.argsort(part, kind="stable")
    ids, n, nd, part = ids[order], n[order], nd[order], part[order]
    bounds = np.searchsorted(part, np.arange(K + 1)).astype(np.int64)
    return [(ids[bounds[k]: bounds[k + 1]], n[bounds[k]: bounds[k + 1]],
             nd[bounds[k]: bounds[k + 1]]) for k in range(K)]


def _cdd_doc_reduce(k: int, slices, id_col: str):
    """Second exchange reduce: sum each doc's partials."""
    ids = np.concatenate([s[0] for s in slices] or [np.array([], np.int64)])
    n = np.concatenate([s[1] for s in slices] or [np.array([], np.int64)])
    nd = np.concatenate([s[2] for s in slices] or [np.array([], np.int64)])
    uid, inv = np.unique(ids, return_inverse=True)
    return pa.table({
        id_col: pa.array(uid.astype(np.int64), pa.int64()),
        "n_chunks": pa.array(np.bincount(inv, weights=n).astype(np.int64),
                             pa.int64()),
        "n_dup_chunks": pa.array(np.bincount(inv, weights=nd).astype(
            np.int64), pa.int64()),
    })


def chunk_dup_stats(docs: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", *,
                    width: int = 8,
                    stride: int | None = None) -> rd.Dataset:
    """Cross-corpus exact CHUNK dedup stats (the RefinedWeb/CCNet
    paragraph-dedup shape, over ``width``-token chunks since the
    synthetic corpus has no newline paragraphs). ``stride`` defaults to
    ``width`` (non-overlapping); ``stride < width`` gives overlapping
    windows — the exact-substring-dedup shape (stride 1 = every
    ``width``-gram).

    Output per doc: (id, ``n_chunks``, ``n_dup_chunks``,
    ``dup_chunk_ratio``) where a chunk occurrence is duplicated when its
    md5 appears more than once in the whole corpus (same doc included).

    Scale shape: stage 1 shuffles only (16-byte fp, doc_id) triples — the
    text never leaves its read partition; the corpus-wide dup decision
    and the per-doc re-aggregation run as TWO raw-task exchange rounds
    (`exchange.exchange`: fp-keyed partition count K, then doc-keyed with
    per-doc partials pre-aggregated inside the fp reduce — the same
    point-to-point shuffle shape as the graph build; Dataset sort-shuffle
    twin behind ``RAYLINK_CHUNKDD_EXCHANGE=dataset``). Zero-chunk docs
    come from a shuffle-free side pass, so no outer join is needed.
    """

    step = int(stride) if stride is not None else int(width)
    if step < 1:
        raise ValueError("stride must be >= 1")

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[text_col].fillna("")
        toks = txt.str.split()
        n = toks.str.len().fillna(0).astype("int64").to_numpy()
        nch = np.maximum(0, (n - width) // step + 1)
        if not int(nch.sum()):
            return pd.DataFrame({"f1": pd.Series([], dtype="uint64"),
                                 "f2": pd.Series([], dtype="uint64"),
                                 "id": pd.Series([], dtype="int64")})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks.to_numpy()])
        doc_off = np.concatenate([[0], np.cumsum(n)[:-1]])
        chunk_own = np.repeat(np.arange(len(batch), dtype=np.int64), nch)
        # per-chunk index within its doc: global arange minus each doc's
        # first-chunk position
        coff = np.concatenate([[0], np.cumsum(nch)[:-1]])
        cwithin = (np.arange(int(nch.sum()), dtype=np.int64)
                   - np.repeat(coff, nch))
        starts = doc_off[chunk_own] + cwithin * step
        gather = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
        mat = flat[gather]
        ids = batch[id_col].to_numpy()
        # md5 digest as two uint64 halves: the shuffle ships 16 bytes of
        # ints per occurrence, never a hex string
        dig = b"".join(hashlib.md5(" ".join(row).encode()).digest()
                       for row in mat)
        halves = np.frombuffer(dig, dtype=np.uint64).reshape(-1, 2)
        return pd.DataFrame({
            "f1": halves[:, 0],
            "f2": halves[:, 1],
            "id": ids[chunk_own].astype(np.int64),
        })

    pairs = docs.select_columns([id_col, text_col]).map_batches(
        chunks, batch_format="pandas")

    import os

    if os.environ.get("RAYLINK_CHUNKDD_EXCHANGE", "") != "dataset":
        from .exchange import exchange

        refs = pairs.materialize().to_arrow_refs()
        K = min(32, max(1, len(refs)))
        partials = exchange(refs, K, _cdd_fp_map, _cdd_fp_reduce)
        totals = exchange(partials, K, _cdd_doc_map, _cdd_doc_reduce,
                          reduce_args=(id_col,))
        agg = rd.from_arrow_refs(totals)
    else:
        # Dataset twin: one sort shuffle for the corpus-wide dup decision
        # — group by a 64-way fp partition (equal fps always co-bucket),
        # then a vectorized within-bucket count — and one per-doc
        # aggregate. Not groupby(fp).map_groups, which would make one
        # Python call per (near-unique) fingerprint.
        import pyarrow.compute as pc

        def bucket(batch: pa.Table) -> pa.Table:
            b = pc.cast(
                pc.bit_wise_and(batch["f1"], pa.scalar(63, pa.uint64())),
                pa.int64())
            return batch.append_column("__bkt", b)

        def mark_bucket(g: pa.Table) -> pa.Table:
            f1 = g["f1"].to_numpy(zero_copy_only=False)
            f2 = g["f2"].to_numpy(zero_copy_only=False)
            order = np.lexsort((f2, f1))
            s1, s2 = f1[order], f2[order]
            new = np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
            gid = np.cumsum(new) - 1
            cnt = np.bincount(gid)
            dup = np.empty(len(f1), dtype=np.int64)
            dup[order] = (cnt[gid] > 1).astype(np.int64)
            return pa.table({
                id_col: g["id"].cast(pa.int64()),
                "dup": pa.array(dup, pa.int64()),
            })

        occ = (pairs.map_batches(bucket, batch_format="pyarrow")
               .groupby("__bkt").map_groups(mark_bucket,
                                            batch_format="pyarrow"))
        agg = occ.groupby(id_col).aggregate(
            Count(alias_name="n_chunks"),
            Sum("dup", alias_name="n_dup_chunks"))

    def zeros(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[text_col].fillna("")
        n = txt.str.count(r"\S+").astype("int64")
        out = batch.loc[n < width, [id_col]].copy()
        out["n_chunks"] = np.int64(0)
        out["n_dup_chunks"] = np.int64(0)
        return out

    empty = docs.select_columns([id_col, text_col]).map_batches(
        zeros, batch_format="pandas")

    def finish(batch: pa.Table) -> pa.Table:
        nc = batch["n_chunks"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = batch["n_dup_chunks"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        safe = np.where(nc == 0, 1, nc).astype(np.float64)
        ratio = np.floor(np.where(nc == 0, 0.0, nd / safe)
                         * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         "n_chunks": pa.array(nc, pa.int64()),
                         "n_dup_chunks": pa.array(nd, pa.int64()),
                         "dup_chunk_ratio": pa.array(ratio, pa.int64())})

    return agg.union(empty).map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# test-set decontamination (eval n-gram overlap flagging)
# ---------------------------------------------------------------------------

def _gram_stream(h: np.ndarray, offs: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-gram polynomial hashes of a batch in one vectorized pass.
    Returns (grams, owner_doc_index); docs shorter than k emit nothing
    (positional grams, NOT the minhash whole-text fallback)."""
    n = len(h)
    ndocs = len(offs) - 1
    if n < k:
        return np.array([], np.uint64), np.array([], np.int64)
    acc = np.zeros(n - k + 1, np.uint64)
    for j in range(k):
        acc = acc * _SH_A + h[j: n - k + 1 + j]
    own_tok = np.repeat(np.arange(ndocs, dtype=np.int64), np.diff(offs))
    starts = np.arange(n - k + 1, dtype=np.int64)
    owner = own_tok[starts]
    valid = starts + k <= offs[owner + 1]
    return acc[valid], owner[valid]


def decontaminate(train: rd.Dataset, eval_ds: rd.Dataset,
                  id_col: str = "doc_id", text_col: str = "text", *,
                  k: int = 3, broadcast: bool = True) -> rd.Dataset:
    """Test-set decontamination: per train doc, count k-gram occurrences
    that also appear in ANY eval document, and flag overlap.

    Output: (id, ``n_ngrams``, ``n_contaminated``, ``contaminated``).

    Scale shape, ``broadcast=True`` (default — an eval set is small): the
    eval side is reduced to a distinct sorted uint64 gram-hash array and
    broadcast once via ``ray.put``; the train side is a SINGLE shuffle-free
    ``map_batches`` pass (vectorized token hash + searchsorted probe).

    ``broadcast=False`` is the huge-eval-set twin: nothing driver- or
    broadcast-resident — the train gram stream semi-joins the distinct
    eval gram set on the 64-bit hash (Bloom-prefiltered, co-partitioned),
    hits reduce per doc, and the per-doc gram totals come from the same
    shuffle-free base pass. Identical output by construction.

    Equality is on 64-bit polynomial hashes of polars-hashed tokens — a
    hash collision could flag a clean gram; probability ~n_grams^2 / 2^65,
    negligible and accepted (same determinism pin as graph.hash64)."""

    def eval_grams(batch: pa.Table) -> pa.Table:
        h, offs = _token_hashes(batch[text_col])
        g, _ = _gram_stream(h, offs, k)
        return pa.table({"g": pa.array(np.unique(g).view(np.int64),
                                       pa.int64())})

    if not broadcast:
        return _decontaminate_join(train, eval_ds, id_col, text_col, k,
                                   eval_grams)

    rows = eval_ds.select_columns([text_col]).map_batches(
        eval_grams, batch_format="pyarrow").take_all()
    ev = np.unique(np.array([r["g"] for r in rows], dtype=np.int64))
    ev_ref = ray.put(ev)

    def probe(batch: pa.Table) -> pa.Table:
        evs = ray.get(ev_ref)
        h, offs = _token_hashes(batch[text_col])
        g, owner = _gram_stream(h, offs, k)
        ndocs = len(batch)
        n_grams = np.bincount(owner, minlength=ndocs).astype(np.int64)
        gi = g.view(np.int64)
        pos = np.searchsorted(evs, gi)
        hit = (pos < len(evs)) & (evs[np.clip(pos, 0, max(len(evs) - 1, 0))]
                                  == gi) if len(evs) else np.zeros(
            len(gi), dtype=bool)
        n_hit = np.bincount(owner[hit], minlength=ndocs).astype(np.int64)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "n_ngrams": pa.array(n_grams, pa.int64()),
            "n_contaminated": pa.array(n_hit, pa.int64()),
            "contaminated": pa.array((n_hit > 0).astype(np.int64),
                                     pa.int64()),
        })

    return train.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow")


def _decontaminate_join(train: rd.Dataset, eval_ds: rd.Dataset,
                        id_col: str, text_col: str, k: int,
                        eval_grams) -> rd.Dataset:
    """Join-based decontamination twin (see :func:`decontaminate`)."""
    from .ops import semi_join

    ev = eval_ds.select_columns([text_col]).map_batches(
        eval_grams, batch_format="pyarrow")

    def train_grams(batch: pa.Table) -> pa.Table:
        h, offs = _token_hashes(batch[text_col])
        g, owner = _gram_stream(h, offs, k)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"g": pa.array(g.view(np.int64), pa.int64()),
                         id_col: pa.array(ids[owner], pa.int64())})

    tg = train.select_columns([id_col, text_col]).map_batches(
        train_grams, batch_format="pyarrow")
    hits = semi_join(tg, ev, "g", bloom_bits=1 << 20)
    n_hit = hits.groupby(id_col).count()

    def base(batch: pa.Table) -> pa.Table:
        h, offs = _token_hashes(batch[text_col])
        _, owner = _gram_stream(h, offs, k)
        n_grams = np.bincount(owner, minlength=len(batch)).astype(np.int64)
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         "n_ngrams": pa.array(n_grams, pa.int64())})

    totals = train.select_columns([id_col, text_col]).map_batches(
        base, batch_format="pyarrow")
    # n_hit is bounded by the number of CONTAMINATED docs (usually tiny
    # next to the corpus); attach it with the bucketed hash join so the
    # path stays shuffle-bounded even when it is not
    from .ops import hash_join

    def _cnt(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["n_hits" if c == "count()" else c for c in batch.column_names])

    n_hit = n_hit.map_batches(_cnt, batch_format="pyarrow")
    joined = hash_join(totals, n_hit, id_col, how="left")

    def fin(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nh = pc.fill_null(batch["n_hits"].cast(pa.int64()), 0)
        nhv = nh.to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "n_ngrams": batch["n_ngrams"].cast(pa.int64()),
            "n_contaminated": nh,
            "contaminated": pa.array((nhv > 0).astype(np.int64),
                                     pa.int64()),
        })

    return joined.map_batches(fin, batch_format="pyarrow")


def simhash_pairs(sigs: rd.Dataset, *, radius: int = 3,
                  id_col: str = "doc_id",
                  sim_col: str = "simhash") -> rd.Dataset:
    """All (a < b) pairs within SimHash Hamming distance <= ``radius``,
    EXACT via pigeonhole banding: the 64-bit signature splits into
    ``radius + 1`` bands, so any pair within the radius agrees on at
    least one whole band (<= radius bits differ but there are radius+1
    bands). Candidates = per-(band, band-value) buckets — ONE groupby of
    (band, bucket, id, sig) rows, everything else vectorized:

    - per bucket: C(g, 2) pairs with both signatures inline (no second
      lookup join), XOR popcount verify, emit survivors;
    - cross-band duplicates collapse in a final (a, b) keep-first.

    Bucket volume: docs sharing a 16-bit band value; a degenerate corpus
    (all-identical signatures) makes one bucket quadratic — the same
    documented blowup cap situation as LSH (here: exact op, no cap)."""
    nb = int(radius) + 1
    # floor-width bands: any trailing uncovered bits only REMOVE covered
    # differences, so the at-least-one-clean-band guarantee still holds
    width = 64 // nb
    masks = [(b, b * width, (1 << width) - 1) for b in range(nb)]

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = batch[sim_col].to_numpy(zero_copy_only=False).view(np.uint64)
        outs = []
        for b, shift, mask in masks:
            outs.append(pa.table({
                "band": pa.array(np.full(len(ids), b, np.int64)),
                "bucket": pa.array(((sig >> np.uint64(shift))
                                    & np.uint64(mask)).astype(np.int64)),
                id_col: pa.array(ids),
                "sig": pa.array(sig.view(np.int64)),
            }))
        return pa.concat_tables(outs)

    rows = sigs.select_columns([id_col, sim_col]).map_batches(
        to_buckets, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ids = g[id_col].to_numpy(zero_copy_only=False)
        sig = g["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sig = ids[order], sig[order]
        iu, ju = np.triu_indices(len(ids), k=1)
        x = sig[iu] ^ sig[ju]
        ham = np.zeros(len(x), np.int64)
        while True:
            nzm = x != 0
            if not nzm.any():
                break
            ham[nzm] += 1
            x = x & (x - np.uint64(1))
        keep = ham <= radius
        return pa.table({"a": pa.array(ids[iu[keep]], pa.int64()),
                         "b": pa.array(ids[ju[keep]], pa.int64()),
                         "hamming": pa.array(ham[keep], pa.int64())})

    pairs = rows.groupby(["band", "bucket"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    from .ops import keep_first

    return keep_first(pairs, ["a", "b"], ["hamming"])


_CHUNK_IDX_CAP = 1 << 20  # chunks per doc bound for the (doc, idx) code


def remove_dup_chunks(docs: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", *,
                      width: int = 8,
                      num_buckets: int = 64) -> rd.Dataset:
    """Exact-substring dedup REWRITE (Lee et al. '22 shape): drop every
    non-canonical occurrence of a duplicated ``width``-token chunk across
    the whole corpus and reassemble each document from its kept chunks
    (+ the always-kept tail tokens past the last full chunk). The
    canonical occurrence of a chunk fingerprint is the lexicographic min
    (doc_id, chunk_idx) — deterministic and SQL-mirrorable via the code
    ``doc_id * 2^20 + idx``. Output rows: (id, clean_text, n_dropped) for
    EVERY input doc; reassembly is whitespace-normalized (single spaces),
    byte-identical to a ``string_agg(chunk, ' ' ORDER BY idx)`` SQL twin.

    Scale shape: stage 1 shuffles only (16-byte fp, doc, idx) triples
    bucketed by fp prefix (the text never leaves its read partition);
    stage 2 emits ONLY dropped occurrences (volume = duplicate mass);
    stage 3 groups them per doc; stage 4 is one co-partitioned LEFT join
    back to the raw docs + a vectorized rebuild."""

    _ROWS_SCHEMA = pa.schema([
        pa.field("fp", pa.string()), pa.field("__bkt", pa.int64()),
        pa.field(id_col, pa.int64()), pa.field("idx", pa.int64())])

    def chunk_rows(batch: pd.DataFrame) -> pa.Table:
        txt = batch[text_col].fillna("")
        toks = txt.str.split()
        n = toks.str.len().fillna(0).astype("int64").to_numpy()
        nch = np.maximum(0, n // width)
        if not int(nch.sum()):
            return _ROWS_SCHEMA.empty_table()
        if int(nch.max()) >= _CHUNK_IDX_CAP:
            raise ValueError("document exceeds 2^20 chunks; widen the "
                             "(doc, idx) code")
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks.to_numpy()])
        doc_off = np.concatenate([[0], np.cumsum(n)[:-1]])
        chunk_own = np.repeat(np.arange(len(batch), dtype=np.int64), nch)
        coff = np.concatenate([[0], np.cumsum(nch)[:-1]])
        cwithin = (np.arange(int(nch.sum()), dtype=np.int64)
                   - np.repeat(coff, nch))
        starts = doc_off[chunk_own] + cwithin * width
        gather = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
        mat = flat[gather]
        ids = batch[id_col].to_numpy()
        fps = [hashlib.md5(" ".join(row).encode()).hexdigest()
               for row in mat]
        return pa.table({
            "fp": pa.array(fps, pa.string()),
            "__bkt": pa.array([int(f[:8], 16) % num_buckets for f in fps],
                              pa.int64()),
            id_col: pa.array(ids[chunk_own], pa.int64()),
            "idx": pa.array(cwithin, pa.int64()),
        }, schema=_ROWS_SCHEMA)

    occurrences = docs.select_columns([id_col, text_col]).map_batches(
        chunk_rows, batch_format="pandas")

    # every stage emits EXPLICITLY TYPED Arrow tables: a zero-row pandas
    # frame loses its schema in the block layer and the schema-less block
    # nondeterministically poisons the downstream join
    def dropped_of_bucket(g: pa.Table) -> pa.Table:
        code = (g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                * _CHUNK_IDX_CAP
                + g["idx"].to_numpy(zero_copy_only=False).astype(np.int64))
        fp = np.asarray(g["fp"].to_pylist(), dtype=object)
        order = np.lexsort((code, fp))
        fp_s, code_s = fp[order], code[order]
        first = np.r_[True, fp_s[1:] != fp_s[:-1]]
        drop = ~first  # every non-canonical occurrence of its fp
        return pa.table({
            id_col: pa.array(code_s[drop] // _CHUNK_IDX_CAP, pa.int64()),
            "idx": pa.array(code_s[drop] % _CHUNK_IDX_CAP, pa.int64()),
        })

    dropped = occurrences.groupby("__bkt").map_groups(
        dropped_of_bucket, batch_format="pyarrow")

    def pack_doc(g: pa.Table) -> pa.Table:
        idxs = np.sort(g["idx"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        # scalar (string) payload: Acero's hash join doesn't take nested
        # payload columns, and the volume is the duplicate mass only
        return pa.table({
            id_col: pa.array([int(g[id_col][0].as_py())], pa.int64()),
            "drop_idx": pa.array([",".join(map(str, idxs))], pa.string()),
        })

    per_doc = dropped.groupby(id_col).map_groups(pack_doc,
                                                 batch_format="pyarrow")

    from .ops import hash_join

    joined = hash_join(docs.select_columns([id_col, text_col]), per_doc,
                       on=id_col, how="left", num_partitions=num_buckets)

    def rebuild(batch: pa.Table) -> pa.Table:
        txt = batch[text_col].to_pandas().fillna("")
        drop_col = batch["drop_idx"]
        ids = batch[id_col]
        out_txt = []
        out_drop = np.zeros(len(txt), np.int64)
        for i, t in enumerate(txt):
            toks = t.split()
            nch = len(toks) // width
            d = drop_col[i].as_py()
            if not d:
                out_txt.append(" ".join(toks))
                continue
            dset = {int(x) for x in d.split(",")}
            out_drop[i] = len(dset)
            kept: list[str] = []
            for c in range(nch):
                if c not in dset:
                    kept.extend(toks[c * width:(c + 1) * width])
            kept.extend(toks[nch * width:])
            out_txt.append(" ".join(kept))
        return pa.table({
            id_col: ids,
            "clean_text": pa.array(out_txt, pa.string()),
            "n_dropped": pa.array(out_drop, pa.int64()),
        })

    return joined.map_batches(rebuild, batch_format="pyarrow")
