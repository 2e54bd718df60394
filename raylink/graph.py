"""Edge table -> partitioned CSR graph, Ray-Data-first.

Pipeline (SURVEY §7.2 steps 3-4):

    raw edges(src, dst)                       strings or int64 keys
      -> dedup_edges        drop self-loops, distinct (src,dst)   [shuffle]
      -> build_vertices     distinct keys -> (key, vid, part)     [shuffle]
      -> encode_edges       key -> vid lookup (broadcast dict)    [map]
      -> build_blocks       groupby(src_part) -> CSR block rows   [shuffle]

Vertex id scheme (deterministic, needs NO global sort — scales to any
vertex count): ``part = hash64(key) % P`` (seeded vectorized hash); within a
partition keys are ranked by (hash64(key), key) and
``vid = local_rank * P + part``. Hence ``part = vid % P`` and
``local = vid // P`` everywhere, the dictionary build ships only 8-byte
hashes (strings are materialized lazily, only for vid->key output joins),
and the oracle (oracle.py) reproduces the exact same ids from the same
edge list.

Skew note (SURVEY §7.5): the dst side of every kernel superstep is
pre-aggregated *per source partition* inside the scatter (bincount), so a
hub vertex receives at most P partial rows regardless of in-degree — the
"salted partial sum" with salt = src_part is structural, not a special
case. Source-side hub out-adjacency lands in one partition; at cluster
scale the block build splits oversized partitions into chunk sub-blocks
processed by independent scatter tasks (payloads are already stored as a
list of chunks; round-1 scatter walks them within one task).

Reference analogs: exact dedup = overlap-peak reconciliation
(``peak_detect_v4.py:1710-1728``); partitioning = ``segment_ECG`` windowing
(``utils.py:7-50``); per-partition grouped stats (``peak_detect_v4.py:1571``).
"""

from __future__ import annotations

import pickle

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

DEFAULT_P = 32
# target max edges per CSR chunk; oversized partitions split into sub-chunks
CHUNK_EDGES = 4_000_000
# below this edge count (encode="auto") the whole dictionary+encode+build
# runs locally in one pass: 4-5 Dataset-execution launches (~0.3-0.5 s each)
# dwarf the actual work on tiny graphs, same disease the fused kernels cure
import os as _os

SMALL_BUILD_MAX_EDGES = int(_os.environ.get(
    "RAYLINK_SMALL_BUILD_MAX_EDGES", "200000"))


# ---------------------------------------------------------------------------
# partition hashing (pure; replicated in oracle.py)
# ---------------------------------------------------------------------------

_HASH_SEED = 42
_HASH_SEED2 = 777  # independent check hash for collision detection


# Eager, COMPLETE polars init at module-import time: polars finishes its
# lazy attribute wiring (pl.Series via polars._reexport) on first USE, and
# that wiring is not thread-safe — two Ray-worker threads calling hash64
# concurrently in a fresh process raced to "module 'polars._reexport' has
# no attribute 'Series'" (observed flaky across whole processes). Module
# import runs under the interpreter's per-module import lock, so forcing a
# full from_arrow->hash round here makes every later call thread-safe.
import polars as _pl_warm

_pl_warm.from_arrow(pa.array([0], pa.int64())).hash(seed=1)


def hash64(arr: pa.Array | pa.ChunkedArray, *, seed: int = _HASH_SEED) -> np.ndarray:
    """Vectorized seeded 64-bit key hash (deterministic across processes
    for a pinned polars version; the oracle calls through this too)."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(arr).hash(seed=seed).to_numpy().astype(np.uint64)


def part_of_keys(arr: pa.Array | pa.ChunkedArray, P: int) -> np.ndarray:
    """Stable partition id per key."""
    return (hash64(arr) % np.uint64(P)).astype(np.int64)


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def _local_dedup(batch: pa.Table) -> pa.Table:
    """Combiner: batch-local distinct + self-loop drop, before the shuffle."""
    batch = batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))
    return batch.group_by(["src", "dst"]).aggregate([]).rename_columns(["src", "dst"])


DEDUP_BUCKETS = 256


def _dedup_map_task(tabs, K: int):
    """Exchange map for dedup_edges: batch-local distinct + self-loop
    drop (the _local_dedup combiner), then partition by the pair hash
    % K. Returns per-part pa.Tables (None = empty)."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return [None] * K
    tab = pa.concat_tables([_local_dedup(t.select(["src", "dst"]))
                            for t in tabs])
    if tab.num_rows == 0:
        return [None] * K
    from .exchange import scatter_by_part

    b = ((part_of_keys(tab["src"], 1 << 30) * 1_000_003
          + part_of_keys(tab["dst"], 1 << 30)) % K).astype(np.int64)
    return scatter_by_part(tab, b, K)


def _dedup_reduce_task(k: int, slices, key_type):
    """Exchange reduce: global distinct within this pair-hash partition
    (a given (src, dst) always co-partitions)."""
    tabs = [s for s in slices if s is not None and s.num_rows]
    if not tabs:
        return pa.table({"src": pa.array([], key_type),
                         "dst": pa.array([], key_type)})
    return (pa.concat_tables(tabs).group_by(["src", "dst"]).aggregate([])
            .rename_columns(["src", "dst"]))


def dedup_edges(edges: rd.Dataset, *, buckets: int = DEDUP_BUCKETS) -> rd.Dataset:
    """Exact (src,dst) distinct, self-loops dropped.

    Pattern: vectorized batch-local combine (cuts shuffle volume), then an
    explicit partitioned distinct — bucket by a hash of the pair (a single
    int key, far cheaper to shuffle than sorting the string pair globally)
    and dedup within each bucket with an Arrow hash group-by. A given
    (src,dst) always lands in the same bucket, so the result is globally
    distinct.

    Default physical plan (round-5 session 3): ONE `exchange.exchange`
    round — map = local dedup + pair-hash partition (one plasma object
    per (map task, partition)), reduce = per-partition Arrow hash
    distinct; the Dataset sort-shuffle twin stays behind
    ``RAYLINK_EDGEDEDUP_EXCHANGE=dataset``."""
    import os as _os

    if _os.environ.get("RAYLINK_EDGEDEDUP_EXCHANGE", "") != "dataset":
        from .exchange import arrow_col_type, exchange as _exchange

        edges = edges.materialize()
        key_type = arrow_col_type(edges, "src")
        refs = edges.to_arrow_refs()
        K = min(32, max(1, buckets))
        red = _exchange(refs, K, _dedup_map_task, _dedup_reduce_task,
                        reduce_args=(key_type,))
        return rd.from_arrow_refs(red)

    pre = edges.map_batches(_local_dedup, batch_format="pyarrow", zero_copy_batch=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (part_of_keys(batch["src"], 1 << 30) * 1_000_003
             + part_of_keys(batch["dst"], 1 << 30)) % buckets
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    def bucket_distinct(group: pa.Table) -> pa.Table:
        return group.select(["src", "dst"]).group_by(["src", "dst"]).aggregate([])

    return (
        pre.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# vertex dictionary
# ---------------------------------------------------------------------------

def _canonical_order(u: pa.Array, h: np.ndarray) -> np.ndarray:
    """Indices sorting keys by the canonical within-part rank order:
    (hash64(key), key). The key tiebreak only matters on 64-bit hash
    collisions — astronomically rare, but keeps ranks well-defined."""
    by_key = pc.sort_indices(u).to_numpy(zero_copy_only=False)
    return by_key[np.argsort(h[by_key], kind="stable")]


@ray.remote
def _ranks_map_task(P: int, *tabs: pa.Table):
    """Map side of the dictionary exchange: distinct (h1, h2) endpoint
    hash pairs of this slice of edge blocks, partitioned by h1 % P.
    Returns P objects (one per part, ``num_returns=P``) so each reduce
    task fetches ONLY its part's bytes — the real-cluster shuffle shape
    (one object per (map task -> part), never a driver round-trip)."""
    h1s, h2s = [], []
    for tab in tabs:
        if tab.num_rows == 0:
            continue  # empty blocks can be schema-less
        h1s.append(np.concatenate([hash64(tab["src"]), hash64(tab["dst"])]))
        h2s.append(np.concatenate([hash64(tab["src"], seed=_HASH_SEED2),
                                   hash64(tab["dst"], seed=_HASH_SEED2)]))
    h1 = np.concatenate(h1s) if h1s else np.array([], np.uint64)
    h2 = np.concatenate(h2s) if h2s else np.array([], np.uint64)
    if len(h1) == 0:
        empty = (np.array([], np.uint64), np.array([], np.uint64))
        return tuple(empty for _ in range(P)) if P > 1 else empty
    order = np.lexsort((h2, h1))
    h1, h2 = h1[order], h2[order]
    keep = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
    h1, h2 = h1[keep], h2[keep]
    part = (h1 % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")  # keeps (h1,h2) asc in part
    h1, h2, part = h1[order], h2[order], part[order]
    bounds = np.searchsorted(part, np.arange(P + 1)).astype(np.int64)
    out = tuple((h1[bounds[p]: bounds[p + 1]], h2[bounds[p]: bounds[p + 1]])
                for p in range(P))
    return out if P > 1 else out[0]


@ray.remote
def _ranks_reduce_task(part: int, *slices) -> pa.Table:
    """Reduce side: union this part's sorted (h1, h2) slices, distinct
    pairs, collision check (same soundness as the Dataset path: duplicate
    h1 among distinct (h1, h2) pairs == a real 64-bit key collision)."""
    h1 = np.concatenate([s[0] for s in slices]) if slices else np.array(
        [], np.uint64)
    h2 = np.concatenate([s[1] for s in slices]) if slices else np.array(
        [], np.uint64)
    if len(h1):
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        keep = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        u1 = h1s[keep]
        n_coll = int((u1[1:] == u1[:-1]).sum()) if len(u1) else 0
        u = u1 if n_coll == 0 else np.unique(u1)
    else:
        u, n_coll = h1, 0
    return pa.table({
        "part": pa.array([part], pa.int64()),
        "hashes": pa.array([u], pa.list_(pa.uint64())),
        "n": pa.array([len(u)], pa.int64()),
        "collisions": pa.array([n_coll], pa.int64()),
    })


def _ranks_exchange(edges: rd.Dataset, P: int) -> rd.Dataset:
    """Dictionary build as ONE map round + ONE reduce round of raw Ray
    tasks over the materialized edge blocks — replaces the Dataset
    ``groupby("part")`` (a full sort-based shuffle, measured ~4x slower
    and with a large CPU-independent floor) while producing the exact
    same rows. Partitioning assumption: part = h1 % P; every (map, part)
    slice is its own plasma object, so reduces fetch only their bytes
    (multi-node-correct). Falls back to the Dataset path via
    RAYLINK_RANKS_EXCHANGE=dataset (see build_vertex_ranks)."""
    refs = edges.to_arrow_refs()
    # bound the map fan-out: <= ~128 map tasks, each over a ref slice
    chunk = max(1, -(-len(refs) // 128))
    groups = [refs[i: i + chunk] for i in range(0, len(refs), chunk)]
    outs = [_ranks_map_task.options(num_returns=P).remote(P, *g)
            for g in groups]
    if P == 1:
        outs = [[o] for o in outs]
    reduced = [_ranks_reduce_task.remote(p, *[o[p] for o in outs])
               for p in range(P)]
    return rd.from_arrow_refs(reduced)


def build_vertex_ranks(edges: rd.Dataset, P: int,
                       gather_ranks: bool = False,
                       timings: dict | None = None):
    """Distinct endpoint HASHES -> dense ranks, via an INT-ONLY shuffle.

    ``gather_ranks=True`` (broadcast-encode callers ONLY — the gather is
    O(n) driver bytes) also returns the globally h-sorted ``(h, vid)``
    arrays, collected in the SAME driver pass as the O(P) metadata scan so
    the rows Dataset is executed once, not twice. Return shape becomes
    ``(rows, n_per_part, n, n_collisions, (h_sorted, vid_sorted))``.

    The dictionary rank order is (hash64(key), key) within each partition,
    so when the 64-bit hashes are globally collision-free (checked), ranks
    are fully determined by the hashes alone and the shuffle never ships a
    single key string — ~8 bytes/occurrence instead of whole URLs. Returns
    ``(rows, n_per_part, n, n_collisions)`` where ``rows`` is the
    MATERIALIZED per-partition dictionary Dataset (part, hashes asc-sorted,
    n, collisions) living in the object store; only O(P) metadata (counts)
    ever touches the driver.

    Collision detection is SOUND (not per-batch): a second independent
    64-bit hash rides along the shuffle; two distinct keys colliding on h1
    produce two (h1, h2) pairs with equal h1 and (w.p. 1 - 2^-64) distinct
    h2, which the per-partition union detects. Only a simultaneous 128-bit
    collision escapes."""

    def hash_lists(batch: pa.Table) -> pa.Table:
        h1 = np.concatenate([hash64(batch["src"]), hash64(batch["dst"])])
        h2 = np.concatenate([hash64(batch["src"], seed=_HASH_SEED2),
                             hash64(batch["dst"], seed=_HASH_SEED2)])
        if len(h1) == 0:
            return pa.table({
                "part": pa.array([], pa.int64()),
                "hashes": pa.array([], pa.list_(pa.uint64())),
                "hashes2": pa.array([], pa.list_(pa.uint64())),
            })
        # distinct (h1, h2) PAIRS — a within-batch h1 collision keeps both
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        keep = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        h1, h2 = h1[keep], h2[keep]
        part = (h1 % np.uint64(P)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        hs, hs2, ps = h1[order], h2[order], part[order]
        bounds = np.searchsorted(ps, np.arange(P + 1)).astype(np.int64)
        present = np.flatnonzero(np.diff(bounds) > 0)
        offsets = pa.array(np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
                           pa.int32())
        return pa.table({
            "part": pa.array(present.astype(np.int64), pa.int64()),
            "hashes": pa.ListArray.from_arrays(offsets, pa.array(hs, pa.uint64())),
            "hashes2": pa.ListArray.from_arrays(offsets, pa.array(hs2, pa.uint64())),
        })

    packed = edges.map_batches(hash_lists, batch_format="pyarrow",
                               zero_copy_batch=True)

    def assign(group: pa.Table) -> pa.Table:
        h1 = group["hashes"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        h2 = group["hashes2"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        p = int(group["part"][0].as_py())
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        keep = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        u1 = h1s[keep]  # distinct (h1,h2) pairs, sorted by h1
        # duplicate h1 among distinct pairs == two distinct keys colliding
        n_coll = int((u1[1:] == u1[:-1]).sum()) if len(u1) else 0
        u = u1 if n_coll == 0 else np.unique(u1)
        return pa.table({
            "part": pa.array([p], pa.int64()),
            "hashes": pa.array([u], pa.list_(pa.uint64())),
            "n": pa.array([len(u)], pa.int64()),
            "collisions": pa.array([n_coll], pa.int64()),
        })

    import time as _time
    _t0 = _time.perf_counter()
    if _os.environ.get("RAYLINK_RANKS_EXCHANGE", "tasks") == "dataset":
        rows = packed.groupby("part").map_groups(
            assign, batch_format="pyarrow").materialize()
    else:
        rows = _ranks_exchange(edges, P)
    if timings is not None:
        timings["shuffle"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()

    # O(P) metadata only: counts per part + collision flags (plus the
    # O(n) (h, vid) gather when the caller will broadcast anyway — one
    # driver pass instead of metadata-then-_ranks_arrays)
    n_per_part = np.zeros(P, dtype=np.int64)
    n_collisions = 0
    hs_parts: list = []
    vid_parts: list = []
    cols = None if gather_ranks else ["part", "n", "collisions"]
    src = rows if cols is None else rows.select_columns(cols)
    for b in src.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        parts = b["part"].to_numpy(zero_copy_only=False)
        ns = b["n"].to_numpy(zero_copy_only=False)
        n_per_part[parts] = ns
        n_collisions += int(pc.sum(b["collisions"]).as_py() or 0)
        if gather_ranks:
            col = b["hashes"].combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            for i, p in enumerate(parts):
                u = flat[offs[i]: offs[i + 1]]
                hs_parts.append(u)
                vid_parts.append(
                    np.arange(len(u), dtype=np.int64) * P + int(p))
    if timings is not None:
        timings["gather"] = round(_time.perf_counter() - _t0, 3)
    if not gather_ranks:
        return rows, n_per_part, int(n_per_part.sum()), n_collisions
    if hs_parts:
        h_all = np.concatenate(hs_parts)
        vid_all = np.concatenate(vid_parts)
        order = np.argsort(h_all, kind="stable")
        ranks = (h_all[order], vid_all[order])
    else:
        ranks = (np.array([], np.uint64), np.array([], np.int64))
    return rows, n_per_part, int(n_per_part.sum()), n_collisions, ranks


def _ranks_arrays(rows: rd.Dataset, P: int) -> tuple[np.ndarray, np.ndarray]:
    """Broadcast-path driver gather of the dictionary rows: globally
    h-sorted (h, vid) arrays for vectorized searchsorted probes. Used only
    when the dictionary is small enough to broadcast (``prepare_edges``
    auto-threshold); the partitioned join path never calls this."""
    hs_parts, vid_parts = [], []
    for b in rows.select_columns(["part", "hashes"]).iter_batches(
            batch_format="pyarrow"):
        col = b["hashes"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        parts = b["part"].to_numpy(zero_copy_only=False)
        for i, p in enumerate(parts):
            u = flat[offs[i]: offs[i + 1]]
            hs_parts.append(u)
            vid_parts.append(np.arange(len(u), dtype=np.int64) * P + int(p))
    if not hs_parts:
        return np.array([], np.uint64), np.array([], np.int64)
    h_all = np.concatenate(hs_parts)
    vid_all = np.concatenate(vid_parts)
    order = np.argsort(h_all, kind="stable")
    return h_all[order], vid_all[order]


def build_vertices(edges: rd.Dataset, P: int) -> rd.Dataset:
    """Distinct endpoint keys -> (key, vid, part) TABLE. The string-keyed
    sibling of :func:`build_vertex_ranks` (same canonical rank order:
    (hash64(key), key) within partition) — needed only where actual keys
    must be materialized (vid->key output joins, key-initialized labels,
    the collision fallback). One packed-string shuffle."""

    def keys_lists(batch: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array(
            [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
        ).combine_chunks())
        parts = part_of_keys(u, P)
        order = np.argsort(parts, kind="stable")
        sorted_u = u.take(pa.array(order))
        sorted_p = parts[order]
        bounds = np.searchsorted(sorted_p, np.arange(P + 1)).astype(np.int64)
        present = np.flatnonzero(np.diff(bounds) > 0)
        # zero-copy list packing: values stay one Arrow buffer, offsets slice it
        offsets = pa.array(np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
                           pa.int32())
        keys_list = pa.ListArray.from_arrays(offsets, sorted_u)
        return pa.table({
            "part": pa.array(present.astype(np.int64), pa.int64()),
            "keys": keys_list,
        })

    packed = edges.map_batches(keys_lists, batch_format="pyarrow",
                               zero_copy_batch=True)

    def assign(group: pa.Table) -> pa.Table:
        kl = group["keys"].combine_chunks()
        u = pc.unique(kl.flatten())
        order = _canonical_order(u, hash64(u))
        u = u.take(pa.array(order))
        p = int(group["part"][0].as_py())
        vids = np.arange(len(u), dtype=np.int64) * P + p
        return pa.table({
            "key": u, "vid": pa.array(vids),
            "part": pa.array(np.full(len(u), p, dtype=np.int64)),
        })

    return packed.groupby("part").map_groups(assign, batch_format="pyarrow")


@dataclass
class CSRBlock:
    """Out-edge CSR chunk for one source partition.

    Arrays (all edges of this chunk, sorted by (dst_part, dst_local,
    src_local) for deterministic reduction order):
      src_local  int32[m]   edge source, local index within this partition
      dst_local  int32[m]   edge destination, local index within dst partition
      bounds     int64[P+1] edge ranges per destination partition
      deg        int64[n_local]  out-degree of local vertices (whole part,
                                 repeated across chunks of the same part)
      n_local    int        vertex count of this partition
      w          int64[m]|None   per-edge multiplicity weights (weighted
                                 builds only: duplicate (src,dst) pairs
                                 collapse to one edge of weight=count)
      wdeg       int64[n_local]|None  weighted out-degree (sum of w),
                                 whole part, when weighted
    """

    part: int
    src_local: np.ndarray
    dst_local: np.ndarray
    bounds: np.ndarray
    deg: np.ndarray
    n_local: int
    w: np.ndarray | None = None
    wdeg: np.ndarray | None = None

    @property
    def m(self) -> int:
        return len(self.src_local)


@dataclass
class Graph:
    """Handle to a partitioned graph living in the Ray object store."""

    P: int
    n: int
    m: int
    n_per_part: np.ndarray  # int64[P]
    blocks: dict[int, list[Any]]  # part -> [ObjectRef(CSRBlock chunk), ...]
    prep: "PreparedEdges"  # shared dictionary state (lazy vertices table)
    key_type: pa.DataType
    weighted: bool = False  # blocks carry per-edge multiplicity weights

    @property
    def vertices(self) -> rd.Dataset:
        """(key, vid, part) table — built lazily on first use (the kernels
        themselves never need key strings)."""
        return self.prep.vertices

    def parts_with_edges(self) -> list[int]:
        return sorted(self.blocks)


def _build_block_rows(group: pa.Table, P: int, n_per_part: np.ndarray,
                      chunk_edges: int, weighted: bool = False,
                      w_dtype=None) -> pa.Table:
    part = int(group["src_part"][0].as_py())
    direction = int(group["dir"][0].as_py()) if "dir" in group.column_names else 0
    src = group["srcs"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    dst = group["dsts"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    wvals = (group["ws"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False) if "ws" in group.column_names else None)
    return _csr_rows_from_vids(part, direction, src, dst, P, n_per_part,
                               chunk_edges, weighted, wvals, w_dtype)


def _csr_blocks_from_vids(part: int, src: np.ndarray, dst: np.ndarray,
                          P: int, n_per_part: np.ndarray,
                          chunk_edges: int,
                          weighted: bool = False,
                          wvals: np.ndarray | None = None,
                          w_dtype=None) -> list[CSRBlock]:
    # global exact dedup happens HERE, for free: any given (src,dst) pair
    # always lands in this partition, so a local unique is a global one.
    # (Self-loops were dropped before the vertex build.) ``weighted``
    # keeps the multiplicity of each collapsed pair as its edge weight;
    # ``wvals`` (float per raw edge) SUMS duplicate pairs' weights instead
    # — the same shuffle, one extra array either way.
    # pair dedup: when both vids fit in 31 bits the (src, dst) pair packs
    # into ONE int64 code (same trick as the triangle wedge join), and a
    # flat int64 unique is ~5-10x faster than np.unique(axis=0)'s
    # void-dtype row sort; the axis=0 path stays as the huge-vid fallback
    hi_vid = max(int(src.max()), int(dst.max())) if len(src) else 0
    packable = hi_vid < (1 << 31)
    if packable:
        C = np.int64(hi_vid + 1)
        code = src.astype(np.int64) * C + dst.astype(np.int64)
        if wvals is not None:
            # ``w_dtype`` restores the original weight lattice when the
            # raw per-edge values rode a float64 list: multiplicity sums
            # are exact in float64, so the round trip is lossless
            ucode, inv = np.unique(code, return_inverse=True)
            w = np.zeros(len(ucode), dtype=np.float64)
            np.add.at(w, inv, wvals.astype(np.float64))
            if w_dtype is not None:
                w = w.astype(w_dtype)
        elif weighted:
            ucode, w = np.unique(code, return_counts=True)
            w = w.astype(np.int64)
        else:
            ucode = np.unique(code)
            w = None
        src, dst = ucode // C, ucode % C
    else:
        pair = np.stack([src, dst], axis=1)
        if wvals is not None:
            pair, inv = np.unique(pair, axis=0, return_inverse=True)
            w = np.zeros(len(pair), dtype=np.float64)
            np.add.at(w, inv, wvals.astype(np.float64))
            if w_dtype is not None:
                w = w.astype(w_dtype)
        elif weighted:
            pair, w = np.unique(pair, axis=0, return_counts=True)
            w = w.astype(np.int64)
        else:
            pair = np.unique(pair, axis=0)
            w = None
        src, dst = pair[:, 0].astype(np.int64), pair[:, 1].astype(np.int64)
    n_local = int(n_per_part[part])
    src_local = (src // P).astype(np.int32)
    dst_part = (dst % P).astype(np.int64)
    dst_local = (dst // P).astype(np.int32)
    order = np.lexsort((src_local, dst_local, dst_part))
    src_local, dst_local, dst_part = src_local[order], dst_local[order], dst_part[order]
    bounds = np.searchsorted(dst_part, np.arange(P + 1), side="left").astype(np.int64)
    deg = np.bincount(src_local, minlength=n_local).astype(np.int64)
    if w is not None:
        w = w[order]
        wdeg = np.zeros(n_local, dtype=w.dtype)
        np.add.at(wdeg, src_local.astype(np.int64), w)
    else:
        wdeg = None
    m = len(src_local)
    n_chunks = max(1, -(-m // chunk_edges))
    blocks = []
    for c in range(n_chunks):
        lo, hi = c * chunk_edges, min((c + 1) * chunk_edges, m)
        # per-chunk bounds, clipped into [lo, hi) and rebased to 0
        cb = np.clip(bounds, lo, hi) - lo
        blocks.append(CSRBlock(
            part=part,
            src_local=src_local[lo:hi],
            dst_local=dst_local[lo:hi],
            bounds=cb,
            deg=deg,
            n_local=n_local,
            w=None if w is None else w[lo:hi],
            wdeg=wdeg,
        ))
    return blocks


def _csr_rows_from_vids(part: int, direction: int, src: np.ndarray,
                        dst: np.ndarray, P: int, n_per_part: np.ndarray,
                        chunk_edges: int, weighted: bool = False,
                        wvals: np.ndarray | None = None,
                        w_dtype=None) -> pa.Table:
    blocks = _csr_blocks_from_vids(part, src, dst, P, n_per_part, chunk_edges,
                                   weighted, wvals, w_dtype)
    return pa.table(
        {
            "dir": pa.array([direction] * len(blocks), pa.int64()),
            "part": pa.array([b.part for b in blocks], pa.int64()),
            "chunk": pa.array(list(range(len(blocks))), pa.int64()),
            "m": pa.array([b.m for b in blocks], pa.int64()),
            "payload": pa.array([pickle.dumps(b, protocol=5) for b in blocks],
                                pa.binary()),
        }
    )


@dataclass
class PreparedEdges:
    """Encoded edge table + vertex dictionary, shareable by several builds
    (directed + symmetric builds pay the key->vid lookup only once).

    The (key, vid, part) string TABLE is built lazily — the kernels only
    need hashes and ranks; keys are materialized the first time something
    joins vids back to keys (``vertices``)."""

    enc_edges: rd.Dataset | None  # (src_vid, dst_vid), or None when the
    #                               encode is fused into the block build
    #                               ("partitioned-fused" mode). The broadcast
    #                               path keeps this LAZY so the encode map
    #                               fuses into each consumer's first stage
    #                               (one fewer full-table barrier); repeated
    #                               consumption re-runs the cheap vectorized
    #                               searchsorted probe instead of re-reading
    #                               a materialized copy.
    dict_ref: Any  # ObjectRef[(h_sorted, vid_sorted)] | None (partitioned path)
    n: int
    n_per_part: np.ndarray
    P: int
    key_type: pa.DataType
    edges: rd.Dataset | None = None  # raw (self-loop-free) edges, for lazy build
    vertices_cache: rd.Dataset | None = None
    encode_mode: str = "broadcast"  # which key->vid path built enc_edges
    rank_rows: rd.Dataset | None = None  # (part, hashes) dictionary rows
    enc_blocks_hint: int = 0  # input block count of enc_edges (num_blocks()
    #                           raises on a lazy Dataset; map_batches is
    #                           per-block so the encode preserves the count)
    weight_col_raw: str | None = None  # raw edges' weight column (broadcast
    #                                    mode: lets the task-exchange block
    #                                    build re-encode from raw edges)
    weight_col: str | None = None  # float weight column (fused build only:
    #                                broadcast/small paths bake it into
    #                                enc_edges as "w" instead)

    @property
    def vertices(self) -> rd.Dataset:
        if self.vertices_cache is None:
            self.vertices_cache = build_vertices(self.edges, self.P).materialize()
        return self.vertices_cache


_REQ_FIELDS = [
    ("part", pa.int64()), ("kind", pa.int8()), ("bid", pa.int64()),
    ("side", pa.int8()), ("idx", pa.list_(pa.int32())),
    ("hashes", pa.list_(pa.uint64())),
    ("dvids", pa.list_(pa.int64())),  # explicit dictionary vids (merged
    #                                   dictionaries only; empty = rank*P+part)
]
_REQ_SCHEMA = pa.schema([pa.field(n, t) for n, t in _REQ_FIELDS])


def _empty_list_col(k: int, value_type) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(k + 1, np.int32), pa.int32()),
        pa.array([], value_type))


def _encode_partitioned(edges: rd.Dataset, dict_rows: rd.Dataset,
                        P: int) -> rd.Dataset:
    """key -> vid encode as a hash-bucketed dictionary JOIN (the 10^12-vertex
    scale path, ROADMAP 1): NO broadcast dictionary, no driver-resident
    structure proportional to the vertex count. Any single task holds at
    most one dictionary partition (O(n/P) hashes).

    Physical plan (two packed int-only shuffles):
      1. each edge batch emits per-(endpoint-partition) request rows
         ``(part, bid, side, idx list, hashes list)`` (bid = unique batch
         transport key); the per-part dictionary rows ride the same shuffle;
      2. ``groupby(part)``: rank = searchsorted(dict_p, h), vid = rank*P+part;
      3. ``groupby(bid)``: src/dst halves re-align by (side, idx) into
         (src_vid, dst_vid) rows.
    Vid assignment is identical to the broadcast path (same dictionary);
    only edge-row ORDER differs, which every downstream consumer is
    insensitive to (the CSR build sorts + dedups per partition).

    Dictionary rows may carry an explicit ``vids`` list column (merged
    dictionaries, where appended vertices break the rank==sorted-index
    identity); when present and non-empty, vid = vids[searchsorted(u, h)]
    instead of rank*P+part."""

    def to_requests(batch: pa.Table) -> pa.Table:
        import uuid

        if batch.num_rows == 0:
            return _REQ_SCHEMA.empty_table()
        bid = uuid.uuid4().int & ((1 << 62) - 1)  # transport key only
        tabs = []
        for side, col in ((0, "src"), (1, "dst")):
            h = hash64(batch[col])
            part = (h % np.uint64(P)).astype(np.int64)
            order = np.argsort(part, kind="stable")
            hs, ps = h[order], part[order]
            idx = order.astype(np.int32)
            bounds = np.searchsorted(ps, np.arange(P + 1)).astype(np.int64)
            present = np.flatnonzero(np.diff(bounds) > 0)
            offsets = pa.array(
                np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
                pa.int32())
            k = len(present)
            tabs.append(pa.table({
                "part": pa.array(present.astype(np.int64), pa.int64()),
                "kind": pa.array(np.ones(k, np.int8), pa.int8()),
                "bid": pa.array(np.full(k, bid), pa.int64()),
                "side": pa.array(np.full(k, side, np.int8), pa.int8()),
                "idx": pa.ListArray.from_arrays(offsets, pa.array(idx, pa.int32())),
                "hashes": pa.ListArray.from_arrays(offsets, pa.array(hs, pa.uint64())),
                "dvids": _empty_list_col(k, pa.int64()),
            }, schema=_REQ_SCHEMA))
        return pa.concat_tables(tabs)

    def dict_to_rows(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        return pa.table({
            "part": batch["part"],
            "kind": pa.array(np.zeros(k, np.int8), pa.int8()),
            "bid": pa.array(np.full(k, -1), pa.int64()),
            "side": pa.array(np.full(k, -1, np.int8), pa.int8()),
            "idx": _empty_list_col(k, pa.int32()),
            "hashes": batch["hashes"],
            "dvids": (batch["vids"] if "vids" in batch.column_names
                      else _empty_list_col(k, pa.int64())),
        }, schema=_REQ_SCHEMA)

    reqs = edges.map_batches(to_requests, batch_format="pyarrow",
                             zero_copy_batch=True)
    dcols = ["part", "hashes"]
    if "vids" in dict_rows.schema().names:
        dcols.append("vids")
    dicts = dict_rows.select_columns(dcols).map_batches(
        dict_to_rows, batch_format="pyarrow")

    def encode_group(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        di = np.flatnonzero(kinds == 0)
        part = int(g["part"][0].as_py())
        hl = g["hashes"].combine_chunks()
        h_flat = hl.flatten().to_numpy(zero_copy_only=False)
        h_offs = hl.offsets.to_numpy(zero_copy_only=False)
        u = h_flat[h_offs[di[0]]: h_offs[di[0] + 1]]  # asc-sorted dictionary
        dl = g["dvids"].combine_chunks()
        d_flat = dl.flatten().to_numpy(zero_copy_only=False)
        d_offs = dl.offsets.to_numpy(zero_copy_only=False)
        uv = d_flat[d_offs[di[0]]: d_offs[di[0] + 1]]  # explicit vids (merged)
        # one vectorized probe over the whole group's flattened hashes
        # (the dict row's own hashes harmlessly map to themselves)
        ranks = np.searchsorted(u, h_flat).astype(np.int64)
        vids_flat = uv[ranks] if len(uv) else ranks * P + part
        vid_list = pa.ListArray.from_arrays(
            pa.array(h_offs, pa.int32()), pa.array(vids_flat, pa.int64()))
        out = pa.table({
            "bid": g["bid"], "side": g["side"],
            "idx": g["idx"], "vids": vid_list,
        })
        return out.filter(pa.array(kinds == 1))

    halves = reqs.union(dicts).groupby("part").map_groups(
        encode_group, batch_format="pyarrow")

    def reassemble(g: pa.Table) -> pa.Table:
        sides = g["side"].to_numpy(zero_copy_only=False)
        il = g["idx"].combine_chunks()
        i_flat = il.flatten().to_numpy(zero_copy_only=False)
        i_offs = il.offsets.to_numpy(zero_copy_only=False)
        vl = g["vids"].combine_chunks()
        v_flat = vl.flatten().to_numpy(zero_copy_only=False)
        v_offs = vl.offsets.to_numpy(zero_copy_only=False)
        m = int(sum(i_offs[i + 1] - i_offs[i]
                    for i in range(g.num_rows) if sides[i] == 0))
        src = np.empty(m, np.int64)
        dst = np.empty(m, np.int64)
        for i in range(g.num_rows):  # O(2P) rows, vectorized scatter inside
            tgt = src if sides[i] == 0 else dst
            tgt[i_flat[i_offs[i]: i_offs[i + 1]]] = \
                v_flat[v_offs[i]: v_offs[i + 1]]
        return pa.table({"src_vid": pa.array(src, pa.int64()),
                         "dst_vid": pa.array(dst, pa.int64())})

    return halves.groupby("bid").map_groups(reassemble, batch_format="pyarrow")


def prepare_edges(edges: rd.Dataset, *, P: int = DEFAULT_P,
                  already_deduped: bool = False, encode: str = "auto",
                  broadcast_max_vertices: int = 4_000_000,
                  weight_col: str | None = None,
                  timings: dict | None = None) -> PreparedEdges:
    """Self-loop drop + vertex ranks + vid encoding; the shared prefix of
    any build.

    NOTE exact (src,dst) dedup is NOT a separate shuffle: it happens inside
    the partition-grouped CSR block build (a pair always lands in its src
    partition, so local unique == global unique). ``already_deduped`` now
    only skips the self-loop filter.

    The dictionary is built hash-only (:func:`build_vertex_ranks`, int
    shuffle, no strings) and STAYS in the object store. The key->vid encode
    picks between two physical plans (``encode=``):
      - ``"broadcast"``: gather the (h, vid) arrays once, ``ray.put``, probe
        per batch with vectorized searchsorted — fastest while the
        dictionary fits comfortably (16 B/vertex);
      - ``"partitioned"``: hash-bucketed dictionary join
        (:func:`_encode_partitioned`) — no structure proportional to vertex
        count anywhere; the 10^12-vertex path;
      - ``"auto"`` (default): broadcast iff n <= ``broadcast_max_vertices``
        (64 MB dictionary), else partitioned.
    Both produce identical vids.

    ``weight_col``: carry a float edge-weight column through the encode
    (duplicate pairs SUM their weights in the CSR build). Supported on
    the small, broadcast and partitioned-fused (10^12-vertex) paths; the
    explicit "partitioned" materialized encode would need weight
    transport through the request/reassemble rows and raises."""
    import time as _time
    _t = _time.perf_counter
    _t0 = _t()
    key_type = edges.schema().base_schema.field("src").type if hasattr(
        edges.schema(), "base_schema") else edges.schema().field("src").type
    if not already_deduped:
        def drop_self(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))

        edges = edges.map_batches(drop_self, batch_format="pyarrow",
                                  zero_copy_batch=True)
    edges = edges.materialize()
    if timings is not None:
        timings["selfloop_mat"] = round(_t() - _t0, 3)
        _t0 = _t()

    m_directed = None
    if encode == "auto":
        m_directed = edges.count()
        if timings is not None:
            timings["count"] = round(_t() - _t0, 3)
            _t0 = _t()
        if m_directed <= SMALL_BUILD_MAX_EDGES:
            prep = _prepare_small(edges, P, key_type, weight_col)
            if prep is not None:  # None on a (2^-128-rare) hash collision
                return prep

    # when the broadcast decision is already certain (explicit, or the
    # n <= 2m upper bound clears the threshold), collect the (h, vid)
    # arrays inside build_vertex_ranks' metadata pass — one execution of
    # the rank rows instead of metadata-then-_ranks_arrays
    pre_broadcast = (encode == "broadcast"
                     or (encode == "auto"
                         and 2 * m_directed <= broadcast_max_vertices))
    ranks = None
    _rt = None if timings is None else {}
    if pre_broadcast:
        rank_rows, n_per_part, n, n_collisions, ranks = build_vertex_ranks(
            edges, P, gather_ranks=True, timings=_rt)
    else:
        rank_rows, n_per_part, n, n_collisions = build_vertex_ranks(
            edges, P, timings=_rt)
    if timings is not None:
        timings["ranks"] = round(_t() - _t0, 3)
        for k, v in _rt.items():
            timings[f"ranks/{k}"] = v
        _t0 = _t()
    if n_collisions > 0:
        # 64-bit hash collision in the key set: fall back to the string
        # table (same canonical (hash, key) rank order, so ids agree)
        vertices = build_vertices(edges, P).materialize()
        vtab = pa.concat_tables(list(
            vertices.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
        n = vtab.num_rows
        n_per_part = np.zeros(P, dtype=np.int64)
        parts_np, counts_np = np.unique(
            vtab["part"].to_numpy(zero_copy_only=False), return_counts=True)
        n_per_part[parts_np.astype(np.int64)] = counts_np
        keys_arr = vtab["key"].combine_chunks()
        vids_arr = vtab["vid"].combine_chunks()
        keys_ref = ray.put((keys_arr, vids_arr))

        def encode_exact(batch: pa.Table) -> pa.Table:
            keys, vids = ray.get(keys_ref)
            sidx = pc.index_in(batch["src"].combine_chunks(), value_set=keys)
            didx = pc.index_in(batch["dst"].combine_chunks(), value_set=keys)
            out = {"src_vid": vids.take(sidx), "dst_vid": vids.take(didx)}
            if weight_col is not None:
                out["w"] = pc.cast(batch[weight_col], pa.float64())
            return pa.table(out)

        enc = edges.map_batches(encode_exact, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        return PreparedEdges(enc_edges=enc, dict_ref=keys_ref, n=n,
                             n_per_part=n_per_part, P=P, key_type=key_type,
                             edges=edges, vertices_cache=vertices,
                             encode_mode="string-fallback")

    if encode == "broadcast" or (encode == "auto" and n <= broadcast_max_vertices):
        h_sorted, vid_sorted = (ranks if ranks is not None
                                else _ranks_arrays(rank_rows, P))
        dict_ref = ray.put((h_sorted, vid_sorted))

        def encode_fn(batch: pa.Table) -> pa.Table:
            hs, vs = ray.get(dict_ref)
            sv = vs[np.searchsorted(hs, hash64(batch["src"]))]
            dv = vs[np.searchsorted(hs, hash64(batch["dst"]))]
            out = {"src_vid": pa.array(sv, pa.int64()),
                   "dst_vid": pa.array(dv, pa.int64())}
            if weight_col is not None:
                out["w"] = pc.cast(batch[weight_col], pa.float64())
            return pa.table(out)

        # LAZY on purpose: edges is materialized just above, so this one
        # vectorized map fuses into each consumer's first stage (the CSR
        # pack) instead of paying a materialize write+read barrier here
        enc = edges.map_batches(encode_fn, batch_format="pyarrow",
                                zero_copy_batch=True)
        mode = "broadcast"
    elif encode == "partitioned":
        # explicit: materialize the encoded edge table (callers that want
        # the (src_vid, dst_vid) product itself)
        if weight_col is not None:
            raise NotImplementedError(
                "weight_col requires the small or broadcast encode; the "
                "partitioned encode would need a weight list riding the "
                "request rows (ROADMAP)")
        dict_ref = None
        enc = _encode_partitioned(edges, rank_rows, P).materialize()
        mode = "partitioned"
    else:
        # auto above the broadcast threshold (or explicit
        # "partitioned-fused"): defer the encode — it runs fused inside the
        # CSR block build (2 shuffles total instead of 3, no bid transport;
        # a weight column rides the packed rows as a float64 list)
        dict_ref = None
        enc = None
        mode = "partitioned-fused"
    return PreparedEdges(enc_edges=enc, dict_ref=dict_ref, n=n,
                         n_per_part=n_per_part, P=P, key_type=key_type,
                         edges=edges, encode_mode=mode, rank_rows=rank_rows,
                         enc_blocks_hint=(edges.num_blocks()
                                          if mode == "broadcast"
                                          else enc.num_blocks()
                                          if enc is not None else 0),
                         weight_col_raw=(weight_col if mode == "broadcast"
                                         else None),
                         weight_col=weight_col if mode == "partitioned-fused"
                         else None)


def _prepare_small(edges: rd.Dataset, P: int, key_type,
                   weight_col: str | None = None) -> "PreparedEdges | None":
    """Local single-pass prepare for small edge tables (bounded driver
    gather, <= SMALL_BUILD_MAX_EDGES rows): the exact same canonical rank
    order and encode as the distributed broadcast path — per-part asc-sorted
    unique hashes, vid = rank*P + part, searchsorted probe — so vids are
    identical. Returns None on a detected 64-bit hash collision (the
    distributed path's string-fallback handles it)."""
    batches = list(edges.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))
    tab = (pa.concat_tables(batches) if batches
           else pa.table({"src": pa.array([], key_type),
                          "dst": pa.array([], key_type)}))
    h_src = hash64(tab["src"])
    h_dst = hash64(tab["dst"])
    h1 = np.concatenate([h_src, h_dst])
    h2 = np.concatenate([hash64(tab["src"], seed=_HASH_SEED2),
                         hash64(tab["dst"], seed=_HASH_SEED2)])
    if len(h1):
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        keep = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        h1 = h1[keep]
        if np.any(h1[1:] == h1[:-1]):
            return None  # 64-bit collision: distributed string-fallback
    else:
        h1 = h1.astype(np.uint64)
    # h1 is globally ascending; per-part rank = position among that part's
    # hashes in asc order (identical to build_vertex_ranks + _ranks_arrays)
    part = (h1 % np.uint64(P)).astype(np.int64)
    n_per_part = np.bincount(part, minlength=P).astype(np.int64)
    rank_in_part = np.zeros(len(h1), dtype=np.int64)
    for p in range(P):
        sel = part == p
        rank_in_part[sel] = np.arange(int(sel.sum()))
    vids = rank_in_part * P + part
    dict_ref = ray.put((h1, vids))
    sv = vids[np.searchsorted(h1, h_src)]
    dv = vids[np.searchsorted(h1, h_dst)]
    enc_cols = {"src_vid": pa.array(sv, pa.int64()),
                "dst_vid": pa.array(dv, pa.int64())}
    if weight_col is not None:
        enc_cols["w"] = pc.cast(tab[weight_col], pa.float64())
    enc_tab = pa.table(enc_cols)
    return PreparedEdges(
        enc_edges=rd.from_arrow(enc_tab).materialize(), dict_ref=dict_ref,
        n=len(h1), n_per_part=n_per_part, P=P, key_type=key_type,
        edges=edges, encode_mode="broadcast-small")


def _build_blocks_small(prep: PreparedEdges, directions: tuple[int, ...],
                        chunk_edges: int, weighted: bool = False):
    """Local block build for the small path: one bounded gather of the
    already-encoded vid pairs, numpy pack per (direction, part), blocks
    ray.put from the driver (bounded by SMALL_BUILD_MAX_EDGES)."""
    P, n_per_part = prep.P, prep.n_per_part
    batches = list(prep.enc_edges.iter_batches(batch_format="pyarrow",
                                               batch_size=1 << 20))
    w0 = None
    if batches:
        tab = pa.concat_tables(batches)
        sv0 = tab["src_vid"].to_numpy(zero_copy_only=False)
        dv0 = tab["dst_vid"].to_numpy(zero_copy_only=False)
        if "w" in tab.column_names:
            w0 = tab["w"].to_numpy(zero_copy_only=False)
    else:
        sv0 = dv0 = np.array([], np.int64)
    blocks: dict[int, dict[int, list[Any]]] = {}
    m_total: dict[int, int] = {}
    for d in (int(x) for x in directions):
        if d == 1:
            sv = np.concatenate([sv0, dv0])
            dv = np.concatenate([dv0, sv0])
            wv = None if w0 is None else np.concatenate([w0, w0])
        elif d == 2:
            sv, dv, wv = dv0, sv0, w0
        else:
            sv, dv, wv = sv0, dv0, w0
        per: dict[int, list[Any]] = {}
        m_d = 0
        parts = (sv % P).astype(np.int64)
        for p in np.unique(parts):
            sel = parts == p
            blks = _csr_blocks_from_vids(int(p), sv[sel], dv[sel], P,
                                         n_per_part, chunk_edges, weighted,
                                         None if wv is None else wv[sel])
            per[int(p)] = [ray.put(b) for b in blks]
            m_d += sum(b.m for b in blks)
        blocks[d] = per
        m_total[d] = m_d
    return blocks, m_total


_FUSED_A = pa.schema([
    pa.field("part", pa.int64()), pa.field("dir", pa.int64()),
    pa.field("kind", pa.int8()),
    pa.field("hs", pa.list_(pa.uint64())),   # src-role endpoint hashes
    pa.field("hd", pa.list_(pa.uint64())),   # dst-role hashes / dictionary
])
_FUSED_B = pa.schema([
    pa.field("part", pa.int64()), pa.field("dir", pa.int64()),
    pa.field("kind", pa.int8()),
    pa.field("hs", pa.list_(pa.uint64())),   # src hashes / dictionary
    pa.field("dv", pa.list_(pa.int64())),    # dst vids (already encoded)
])
_BLOCK_ROW_SCHEMA = pa.schema([
    pa.field("dir", pa.int64()), pa.field("part", pa.int64()),
    pa.field("chunk", pa.int64()), pa.field("m", pa.int64()),
    pa.field("payload", pa.binary()),
])

# weighted fused-build variants: one extra float64 list rides each packed
# row (unweighted builds keep the lean schemas above — no shuffle overhead)
_WS_FIELD = pa.field("ws", pa.list_(pa.float64()))
_FUSED_A_W = pa.schema(list(_FUSED_A) + [_WS_FIELD])
_FUSED_B_W = pa.schema(list(_FUSED_B) + [_WS_FIELD])


def _pack_by_part(key: np.ndarray, cols: list[tuple[str, np.ndarray, Any]],
                  const: dict, schema: pa.Schema) -> pa.Table:
    """Sort arrays by ``key`` and pack one list row per present key value.
    ``cols``: (name, values, arrow_value_type); ``const``: scalar columns."""
    order = np.argsort(key, kind="stable")
    k2 = key[order]
    bounds = np.flatnonzero(np.r_[True, k2[1:] != k2[:-1], True])
    starts, ends = bounds[:-1], bounds[1:]
    offsets = pa.array(np.concatenate([[0], (ends - starts).cumsum()]),
                       pa.int32())
    n = len(starts)
    out = {"part": pa.array(k2[starts].astype(np.int64), pa.int64())}
    for name, val in const.items():
        typ = schema.field(name).type
        out[name] = pa.array(np.full(n, val), typ)
    for name, values, vt in cols:
        out[name] = pa.ListArray.from_arrays(offsets,
                                             pa.array(values[order], vt))
    return pa.table(out, schema=schema)


def _empty_list(n: int, vt) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, np.int32), pa.int32()), pa.array([], vt))


@ray.remote
def _rank_block_parts(tab: pa.Table) -> list:
    return tab["part"].to_pylist() if tab.num_rows else []


@ray.remote
def _fx_scatter(P: int, dirs: tuple, weight_col, *tabs: pa.Table):
    """Fused-exchange round 1: hash both endpoints, orient per direction
    code, slice by the OWNING part of the oriented edge (hs % P — which
    is also the src dict part, by the vid scheme). ``num_returns=P``;
    each payload carries (dir, hs, hd[, w]) arrays."""
    ds_, hs_, hd_, w_ = [], [], [], []
    for tab in tabs:
        if tab.num_rows == 0:
            continue
        h_src = hash64(tab["src"])
        h_dst = hash64(tab["dst"])
        w0 = (pc.cast(tab[weight_col], pa.float64()).to_numpy(
            zero_copy_only=False) if weight_col is not None else None)
        for code in dirs:
            if code == 1:
                hs = np.concatenate([h_src, h_dst])
                hd = np.concatenate([h_dst, h_src])
                wv = None if w0 is None else np.concatenate([w0, w0])
            elif code == 2:
                hs, hd, wv = h_dst, h_src, w0
            else:
                hs, hd, wv = h_src, h_dst, w0
            ds_.append(np.full(len(hs), code, np.int8))
            hs_.append(hs)
            hd_.append(hd)
            if wv is not None:
                w_.append(wv)
    if not hs_:
        e = (np.array([], np.int8), np.array([], np.uint64),
             np.array([], np.uint64), None)
        return tuple(e for _ in range(P)) if P > 1 else e
    dd = np.concatenate(ds_)
    hs = np.concatenate(hs_)
    hd = np.concatenate(hd_)
    wv = np.concatenate(w_) if w_ else None
    part = (hs % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    dd, hs, hd, part = dd[order], hs[order], hd[order], part[order]
    wv = None if wv is None else wv[order]
    bounds = np.searchsorted(part, np.arange(P + 1)).astype(np.int64)
    out = []
    for p in range(P):
        lo, hi = bounds[p], bounds[p + 1]
        out.append((dd[lo:hi], hs[lo:hi], hd[lo:hi],
                    None if wv is None else wv[lo:hi]))
    return tuple(out) if P > 1 else out[0]


def _part_hashes(dict_tab: pa.Table, row: int) -> np.ndarray:
    col = dict_tab["hashes"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    return flat[offs[row]: offs[row + 1]]


@ray.remote
def _fx_resolve(p: int, P: int, dict_tab: pa.Table, dict_row: int,
                *slices):
    """Fused-exchange round 2 (per src part): resolve src vids against
    this part's dictionary row, emit per-dst-part DISTINCT hash request
    arrays (``num_returns=P+1``: P requests + this part's carried state
    (dir, src_vid, hd[, w]))."""
    dd = np.concatenate([s[0] for s in slices]) if slices else np.array(
        [], np.int8)
    hs = np.concatenate([s[1] for s in slices]) if slices else np.array(
        [], np.uint64)
    hd = np.concatenate([s[2] for s in slices]) if slices else np.array(
        [], np.uint64)
    ws = [s[3] for s in slices if s[3] is not None]
    wv = np.concatenate(ws) if ws else None
    hp = _part_hashes(dict_tab, dict_row) if dict_tab.num_rows else \
        np.array([], np.uint64)
    src_vid = np.searchsorted(hp, hs).astype(np.int64) * P + p
    q = (hd % np.uint64(P)).astype(np.int64)
    reqs = []
    for qq in range(P):
        u = np.unique(hd[q == qq])
        reqs.append(u)
    state = (dd, src_vid, hd, wv)
    return tuple(reqs) + (state,)


@ray.remote
def _fx_respond(q: int, P: int, dict_tab: pa.Table, dict_row: int,
                *reqs):
    """Fused-exchange round 3 (per dst dict part): vids for each
    requesting part's distinct sorted hash array (``num_returns=P``,
    responses aligned with the requests)."""
    hp = _part_hashes(dict_tab, dict_row) if dict_tab.num_rows else \
        np.array([], np.uint64)
    return tuple(np.searchsorted(hp, r).astype(np.int64) * P + q
                 for r in reqs) if P > 1 else \
        np.searchsorted(hp, reqs[0]).astype(np.int64) * P + q


@ray.remote(num_returns="dynamic")
def _fx_build(p: int, P: int, dirs: tuple, n_per_part: np.ndarray,
              chunk_edges: int, weighted: bool, state, *resps):
    """Fused-exchange round 4 (per part): rebuild dst vids from the
    responses (requests are re-derived deterministically), then the
    standard local CSR build per direction. Yields [(dir, [chunk m]),
    ...] meta first, then each CSRBlock in that order."""
    dd, src_vid, hd, wv = state
    q = (hd % np.uint64(P)).astype(np.int64)
    dst_vid = np.empty(len(hd), np.int64)
    for qq in range(P):
        m = q == qq
        if not m.any():
            continue
        u = np.unique(hd[m])
        dst_vid[m] = resps[qq][np.searchsorted(u, hd[m])]
    metas = []
    blocks_all = []
    for code in dirs:
        m = dd == code
        blocks = _csr_blocks_from_vids(
            p, src_vid[m], dst_vid[m], P, n_per_part, chunk_edges,
            weighted, None if wv is None else wv[m],
            None)
        metas.append((int(code), [b.m for b in blocks]))
        blocks_all.append(blocks)
    yield metas
    for blocks in blocks_all:
        for b in blocks:
            yield b


def _build_blocks_fused_exchange(edges: rd.Dataset, rank_rows: rd.Dataset,
                                 P: int, n_per_part: np.ndarray,
                                 directions: tuple[int, ...],
                                 chunk_edges: int, weighted: bool = False,
                                 weight_col: str | None = None):
    """The 10^12-vertex fused encode+build as FOUR point-to-point task
    rounds (scatter -> resolve/request -> respond -> build): no broadcast
    dictionary, no driver-resident vertex-proportional structure, any
    task holds at most one dictionary partition — the same guarantees as
    the Dataset fused path (`_build_blocks_fused`), without its two
    sort-shuffle groupbys (measured 6x faster at a 1.9M-vertex / 11.5M-
    edge build, 32 CPUs). Identical vids by construction (same sorted-
    hash dictionary probes). Fallback: RAYLINK_FUSED_EXCHANGE=dataset."""
    codes = tuple(int(d) for d in directions)
    rr_refs = rank_rows.to_arrow_refs()
    blocks_parts = ray.get([_rank_block_parts.remote(r) for r in rr_refs])
    part_loc: dict[int, tuple] = {}
    for ref, parts in zip(rr_refs, blocks_parts):
        for i, pp in enumerate(parts):
            part_loc[int(pp)] = (ref, i)
    empty_dict = pa.table({
        "part": pa.array([], pa.int64()),
        "hashes": pa.array([], pa.list_(pa.uint64()))})

    refs = edges.to_arrow_refs()
    chunk = max(1, -(-len(refs) // 128))
    groups = [refs[i: i + chunk] for i in range(0, len(refs), chunk)]
    scat = [_fx_scatter.options(num_returns=P).remote(
        P, codes, weight_col, *g) for g in groups]
    if P == 1:
        scat = [[s] for s in scat]

    res = []
    for p in range(P):
        ref, row = part_loc.get(p, (empty_dict, 0))
        res.append(_fx_resolve.options(num_returns=P + 1).remote(
            p, P, ref, row, *[s[p] for s in scat]))
    reqs = [r[:P] for r in res]   # reqs[p][q]
    states = [r[P] for r in res]

    resp = []
    for q in range(P):
        ref, row = part_loc.get(q, (empty_dict, 0))
        resp.append(_fx_respond.options(num_returns=P).remote(
            q, P, ref, row, *[reqs[p][q] for p in range(P)]))
    if P == 1:
        resp = [[r] for r in resp]

    gens = [_fx_build.remote(p, P, codes, n_per_part, chunk_edges,
                             weighted, states[p],
                             *[resp[q][p] for q in range(P)])
            for p in range(P)]
    blocks: dict[int, dict[int, list[Any]]] = {}
    m_total: dict[int, int] = {d: 0 for d in codes}
    for p, gref in enumerate(gens):
        chunk_refs = list(ray.get(gref))
        metas = ray.get(chunk_refs[0])
        i = 1
        for d, ms in metas:
            n_chunks = len(ms)
            if sum(ms) > 0:
                blocks.setdefault(d, {})[p] = chunk_refs[i: i + n_chunks]
            m_total[d] += int(sum(ms))
            i += n_chunks
    return blocks, m_total


def _build_blocks_fused(edges: rd.Dataset, rank_rows: rd.Dataset, P: int,
                        n_per_part: np.ndarray,
                        directions: tuple[int, ...], chunk_edges: int,
                        weighted: bool = False,
                        weight_col: str | None = None):
    """Partitioned-mode encode FUSED into the CSR block build — 2 shuffles
    total after the rank build (vs 3 when the encode is materialized first:
    groupby(part) + groupby(bid) + groupby(dir, src_part)), and no bid/idx
    alignment transport. The 10^12-vertex path (ROADMAP 1): no broadcast
    dictionary, no driver-resident vertex-proportional structure; any task
    holds at most one dictionary partition (O(n/P) hashes).

      stage A (map):   orient each raw edge per direction code, route
                       (hs, hd) packed rows by hd's partition;
      group A (shuffle 1, by part): dst_vid = searchsorted(dict_p, hd);
                       re-route (hs, dst_vid) packed rows by hs's partition;
      group B (shuffle 2, by part): src_vid = probe(dict_p, hs); the group
                       now holds exactly one (dir, src_part) block's edges —
                       build the CSR chunks in place (dedup included).

    Vid assignment is identical to every other encode path (same sorted-hash
    dictionary probes). ``weight_col``: a float64 weight list rides each
    packed row through both shuffles (duplicate pairs SUM in the final
    in-place dedup) — same two exchanges, one extra array."""
    codes = tuple(int(d) for d in directions)
    sch_a = _FUSED_A_W if weight_col is not None else _FUSED_A
    sch_b = _FUSED_B_W if weight_col is not None else _FUSED_B

    def stage_a(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return sch_a.empty_table()
        h_src = hash64(batch["src"])
        h_dst = hash64(batch["dst"])
        w0 = (pc.cast(batch[weight_col], pa.float64()).to_numpy(
            zero_copy_only=False) if weight_col is not None else None)
        tabs = []
        for code in codes:
            if code == 1:
                hs = np.concatenate([h_src, h_dst])
                hd = np.concatenate([h_dst, h_src])
                wv = None if w0 is None else np.concatenate([w0, w0])
            elif code == 2:
                hs, hd, wv = h_dst, h_src, w0
            else:
                hs, hd, wv = h_src, h_dst, w0
            key = (hd % np.uint64(P)).astype(np.int64)
            cols = [("hs", hs, pa.uint64()), ("hd", hd, pa.uint64())]
            if wv is not None:
                cols.append(("ws", wv, pa.float64()))
            tabs.append(_pack_by_part(key, cols, {"dir": code, "kind": 1},
                                      sch_a))
        return pa.concat_tables(tabs)

    def dict_a(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        out = {
            "part": batch["part"],
            "dir": pa.array(np.full(k, -1), pa.int64()),
            "kind": pa.array(np.zeros(k, np.int8), pa.int8()),
            "hs": _empty_list(k, pa.uint64()),
            "hd": batch["hashes"],
        }
        if weight_col is not None:
            out["ws"] = _empty_list(k, pa.float64())
        return pa.table(out, schema=sch_a)

    def group_a(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        di = np.flatnonzero(kinds == 0)
        if len(di) == 0 or (kinds == 1).sum() == 0:
            return sch_b.empty_table()
        part = int(g["part"][0].as_py())
        hd_col = g["hd"].combine_chunks()
        hd_flat = hd_col.flatten().to_numpy(zero_copy_only=False)
        hd_offs = hd_col.offsets.to_numpy(zero_copy_only=False)
        hs_col = g["hs"].combine_chunks()
        hs_flat = hs_col.flatten().to_numpy(zero_copy_only=False)
        hs_offs = hs_col.offsets.to_numpy(zero_copy_only=False)
        if weight_col is not None:
            ws_col = g["ws"].combine_chunks()
            ws_flat = ws_col.flatten().to_numpy(zero_copy_only=False)
            ws_offs = ws_col.offsets.to_numpy(zero_copy_only=False)
        u = hd_flat[hd_offs[di[0]]: hd_offs[di[0] + 1]]  # asc-sorted dict
        dirs = g["dir"].to_numpy(zero_copy_only=False)
        tabs = []
        for code in np.unique(dirs[kinds == 1]):
            rows = np.flatnonzero((kinds == 1) & (dirs == code))
            hs = np.concatenate(
                [hs_flat[hs_offs[i]: hs_offs[i + 1]] for i in rows])
            hd = np.concatenate(
                [hd_flat[hd_offs[i]: hd_offs[i + 1]] for i in rows])
            dv = np.searchsorted(u, hd).astype(np.int64) * P + part
            key = (hs % np.uint64(P)).astype(np.int64)
            cols = [("hs", hs, pa.uint64()), ("dv", dv, pa.int64())]
            if weight_col is not None:
                ws = np.concatenate(
                    [ws_flat[ws_offs[i]: ws_offs[i + 1]] for i in rows])
                cols.append(("ws", ws, pa.float64()))
            tabs.append(_pack_by_part(key, cols,
                                      {"dir": int(code), "kind": 1}, sch_b))
        return pa.concat_tables(tabs) if tabs else sch_b.empty_table()

    def dict_b(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        out = {
            "part": batch["part"],
            "dir": pa.array(np.full(k, -1), pa.int64()),
            "kind": pa.array(np.zeros(k, np.int8), pa.int8()),
            "hs": batch["hashes"],
            "dv": _empty_list(k, pa.int64()),
        }
        if weight_col is not None:
            out["ws"] = _empty_list(k, pa.float64())
        return pa.table(out, schema=sch_b)

    def group_b(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        di = np.flatnonzero(kinds == 0)
        if len(di) == 0 or (kinds == 1).sum() == 0:
            return _BLOCK_ROW_SCHEMA.empty_table()
        part = int(g["part"][0].as_py())
        hs_col = g["hs"].combine_chunks()
        hs_flat = hs_col.flatten().to_numpy(zero_copy_only=False)
        hs_offs = hs_col.offsets.to_numpy(zero_copy_only=False)
        dv_col = g["dv"].combine_chunks()
        dv_flat = dv_col.flatten().to_numpy(zero_copy_only=False)
        dv_offs = dv_col.offsets.to_numpy(zero_copy_only=False)
        if weight_col is not None:
            ws_col = g["ws"].combine_chunks()
            ws_flat = ws_col.flatten().to_numpy(zero_copy_only=False)
            ws_offs = ws_col.offsets.to_numpy(zero_copy_only=False)
        u = hs_flat[hs_offs[di[0]]: hs_offs[di[0] + 1]]
        dirs = g["dir"].to_numpy(zero_copy_only=False)
        tabs = []
        for code in np.unique(dirs[kinds == 1]):
            rows = np.flatnonzero((kinds == 1) & (dirs == code))
            hs = np.concatenate(
                [hs_flat[hs_offs[i]: hs_offs[i + 1]] for i in rows])
            dv = np.concatenate(
                [dv_flat[dv_offs[i]: dv_offs[i + 1]] for i in rows])
            sv = np.searchsorted(u, hs).astype(np.int64) * P + part
            wv = (np.concatenate(
                [ws_flat[ws_offs[i]: ws_offs[i + 1]] for i in rows])
                if weight_col is not None else None)
            tabs.append(_csr_rows_from_vids(part, int(code), sv, dv, P,
                                            n_per_part, chunk_edges,
                                            weighted, wv))
        return pa.concat_tables(tabs) if tabs else _BLOCK_ROW_SCHEMA.empty_table()

    n_blocks = max(64, 8 * P)
    e_in = edges
    if e_in.num_blocks() > n_blocks:
        e_in = e_in.repartition(n_blocks)
    a_edges = e_in.map_batches(stage_a, batch_format="pyarrow",
                               zero_copy_batch=True)
    dict_src = rank_rows.select_columns(["part", "hashes"])
    b_rows = (
        a_edges.union(dict_src.map_batches(dict_a, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(group_a, batch_format="pyarrow")
    )
    block_rows = (
        b_rows.union(dict_src.map_batches(dict_b, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(group_b, batch_format="pyarrow")
        .materialize()
    )
    return _collect_blocks(block_rows)


def _pack_fn(P: int, directions: tuple[int, ...]):
    """Pack encoded edges per (direction, source partition): one
    (dir, src_part, srcs list, dsts list) row per partition per batch, so
    the block shuffle moves ~blocks*P packed rows instead of per-edge rows.
    ``directions`` codes (bools coerce for back-compat): 0/False = directed
    edge set, 1/True = symmetrized, 2 = transpose (reversed edges — in-edge
    CSR for gather-along-in-links kernels like HITS). Any combination rides
    ONE shuffle (grouped by (dir, src_part))."""

    def pack(batch: pa.Table) -> pa.Table:
        sv0 = batch["src_vid"].to_numpy(zero_copy_only=False)
        dv0 = batch["dst_vid"].to_numpy(zero_copy_only=False)
        w0 = (batch["w"].to_numpy(zero_copy_only=False)
              if "w" in batch.column_names else None)
        tabs = []
        for direction in directions:
            symmetric = int(direction)
            if symmetric == 1:
                sv = np.concatenate([sv0, dv0])
                dv = np.concatenate([dv0, sv0])
                wv = None if w0 is None else np.concatenate([w0, w0])
            elif symmetric == 2:
                sv, dv, wv = dv0, sv0, w0
            else:
                sv, dv, wv = sv0, dv0, w0
            part = sv % P
            order = np.argsort(part, kind="stable")
            sv, dv, part = sv[order], dv[order], part[order]
            bounds = np.searchsorted(part, np.arange(P + 1)).astype(np.int64)
            present = np.flatnonzero(np.diff(bounds) > 0)
            offsets = pa.array(
                np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
                pa.int32())
            cols = {
                "dir": pa.array(np.full(len(present), int(symmetric)), pa.int64()),
                "src_part": pa.array(present.astype(np.int64), pa.int64()),
                "srcs": pa.ListArray.from_arrays(offsets, pa.array(sv, pa.int64())),
                "dsts": pa.ListArray.from_arrays(offsets, pa.array(dv, pa.int64())),
            }
            if wv is not None:
                cols["ws"] = pa.ListArray.from_arrays(
                    offsets, pa.array(wv[order], pa.float64()))
            tabs.append(pa.table(cols))
        return pa.concat_tables(tabs)

    return pack


@ray.remote
def _unpack_block(tab: pa.Table, i: int):
    """Worker-side payload -> CSRBlock; the RETURN goes plasma-to-plasma and
    the resulting ObjectRef is owned by the caller (driver) — CSR payloads
    never pass through the driver process."""
    return pickle.loads(tab["payload"][i].as_py())


@ray.remote
def _block_meta(tab: pa.Table):
    if tab.num_rows == 0 or "dir" not in tab.schema.names:
        return ([], [], [], [])  # empty / schema-less blocks occur
    return (tab["dir"].to_pylist(), tab["part"].to_pylist(),
            tab["chunk"].to_pylist(), tab["m"].to_pylist())


def _collect_blocks(block_rows: rd.Dataset) -> dict[int, dict[int, list[Any]]]:
    """block rows -> {dir: {part: [ObjectRef(CSRBlock chunk), ...]}} + edge
    counts. The driver reads only O(#chunks) metadata ints (fetched by
    worker tasks per arrow block, so row<->block alignment is structural);
    each payload is unpacked by a worker task whose plasma-stored return
    value becomes the kernel-visible block (ROADMAP 2: CSR bytes never pass
    through the driver)."""
    arrow_refs = block_rows.to_arrow_refs()
    metas = ray.get([_block_meta.remote(r) for r in arrow_refs])
    entries: list[tuple[int, int, int, Any]] = []
    m_total: dict[int, int] = {}
    for r, (dirs, parts, chunks, ms) in zip(arrow_refs, metas):
        for i in range(len(dirs)):
            d, p, c = int(dirs[i]), int(parts[i]), int(chunks[i])
            m_total[d] = m_total.get(d, 0) + int(ms[i])
            entries.append((d, p, c, _unpack_block.remote(r, i)))
    blocks: dict[int, dict[int, list[Any]]] = {}
    for d, p, c, ref in sorted(entries, key=lambda e: (e[0], e[1], e[2])):
        blocks.setdefault(d, {}).setdefault(p, []).append(ref)
    return blocks, m_total


@ray.remote
def _csr_map_task(P: int, dirs: tuple, dict_wrap, weight_col,
                  *tabs: pa.Table):
    """Map side of the CSR exchange: encode (broadcast dict probe, when
    ``dict_wrap`` is given) then partition each requested direction's
    (src_vid, dst_vid[, w]) by src % P. Returns len(dirs)*P objects
    (``num_returns``), ordered [(dir0, p0..P-1), (dir1, p0..P-1), ...] so
    each reduce task fetches only its (dir, part) slice."""
    svs, dvs, wvs = [], [], []
    for tab in tabs:
        if tab.num_rows == 0:
            continue  # empty blocks can be schema-less (groupby residue)
        if dict_wrap is not None:
            hs, vs = ray.get(dict_wrap[0])
            svs.append(vs[np.searchsorted(hs, hash64(tab["src"]))])
            dvs.append(vs[np.searchsorted(hs, hash64(tab["dst"]))])
            if weight_col is not None:
                wvs.append(pc.cast(tab[weight_col], pa.float64()).to_numpy(
                    zero_copy_only=False))
        else:
            svs.append(tab["src_vid"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
            dvs.append(tab["dst_vid"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
            if "w" in tab.column_names:
                wvs.append(tab["w"].to_numpy(zero_copy_only=False))
    sv0 = np.concatenate(svs) if svs else np.array([], np.int64)
    dv0 = np.concatenate(dvs) if dvs else np.array([], np.int64)
    w0 = np.concatenate(wvs) if wvs else None
    out = []
    for direction in dirs:
        if direction == 1:
            sv = np.concatenate([sv0, dv0])
            dv = np.concatenate([dv0, sv0])
            wv = None if w0 is None else np.concatenate([w0, w0])
        elif direction == 2:
            sv, dv, wv = dv0, sv0, w0
        else:
            sv, dv, wv = sv0, dv0, w0
        part = sv % P
        order = np.argsort(part, kind="stable")
        sv, dv, part = sv[order], dv[order], part[order]
        wv = None if wv is None else wv[order]
        bounds = np.searchsorted(part, np.arange(P + 1)).astype(np.int64)
        for p in range(P):
            lo, hi = bounds[p], bounds[p + 1]
            out.append((sv[lo:hi], dv[lo:hi],
                        None if wv is None else wv[lo:hi]))
    return tuple(out) if len(out) > 1 else out[0]


@ray.remote(num_returns="dynamic")
def _csr_reduce_task(direction: int, part: int, P: int,
                     n_per_part: np.ndarray, chunk_edges: int,
                     weighted: bool, w_dtype, *slices):
    """Reduce side: union this (dir, part)'s slices, then the standard
    local CSR build (global dedup is free here — a pair always lands in
    its src partition). Yields a meta tuple (chunk edge counts) first,
    then each CSRBlock chunk as its own plasma object (owned by the
    caller — CSR bytes never pass through the driver)."""
    src = (np.concatenate([s[0] for s in slices]) if slices
           else np.array([], np.int64))
    dst = (np.concatenate([s[1] for s in slices]) if slices
           else np.array([], np.int64))
    wvals = None
    if slices and slices[0][2] is not None:
        wvals = np.concatenate([s[2] for s in slices])
    blocks = _csr_blocks_from_vids(part, src.astype(np.int64),
                                   dst.astype(np.int64), P, n_per_part,
                                   chunk_edges, weighted, wvals, w_dtype)
    yield [b.m for b in blocks]
    for b in blocks:
        yield b


def _build_blocks_exchange(prep: PreparedEdges, directions: tuple[int, ...],
                           chunk_edges: int, weighted: bool = False,
                           w_dtype=None):
    """CSR block build as one map round (encode + direction fan-out +
    src-part split, ``num_returns`` scatter) + one reduce round (local
    dedup + CSR pack) of raw Ray tasks — same outputs as the Dataset
    ``groupby(["dir", "src_part"])`` path, without the sort-shuffle
    machinery or the payload pickle through block rows. Partitioning
    assumption: owner part = src_vid % P (the vid scheme's invariant).
    Falls back to the Dataset path via RAYLINK_CSR_EXCHANGE=dataset."""
    P, n_per_part = prep.P, prep.n_per_part
    if prep.enc_edges is not None and prep.encode_mode != "broadcast":
        src_ds, dict_wrap, wcol = prep.enc_edges, None, None
    else:
        src_ds = prep.edges
        dict_wrap = [prep.dict_ref]
        wcol = prep.weight_col_raw
    refs = src_ds.to_arrow_refs()
    chunk = max(1, -(-len(refs) // 128))
    groups = [refs[i: i + chunk] for i in range(0, len(refs), chunk)]
    nret = len(directions) * P
    outs = [_csr_map_task.options(num_returns=nret).remote(
        P, tuple(directions), dict_wrap, wcol, *g) for g in groups]
    if nret == 1:
        outs = [[o] for o in outs]
    gen_refs = []
    for di, d in enumerate(directions):
        for p in range(P):
            idx = di * P + p
            gen_refs.append((int(d), p, _csr_reduce_task.remote(
                int(d), p, P, n_per_part, chunk_edges, weighted, w_dtype,
                *[o[idx] for o in outs])))
    blocks: dict[int, dict[int, list[Any]]] = {}
    m_total: dict[int, int] = {}
    for d, p, gref in gen_refs:
        chunk_refs = list(ray.get(gref))
        ms = ray.get(chunk_refs[0])
        m_total[d] = m_total.get(d, 0) + int(sum(ms))
        if sum(ms) == 0:
            continue  # match the Dataset path: no row for an empty part
        blocks.setdefault(d, {})[p] = chunk_refs[1:]
    for d in directions:
        m_total.setdefault(int(d), 0)
    return blocks, m_total


def _build_blocks(prep: PreparedEdges, directions: tuple[bool, ...],
                  chunk_edges: int, weighted: bool = False):
    P, n_per_part = prep.P, prep.n_per_part
    if prep.enc_edges is None:
        # "partitioned-fused": encode + block build share their exchanges
        if _os.environ.get("RAYLINK_FUSED_EXCHANGE", "tasks") != "dataset":
            return _build_blocks_fused_exchange(
                prep.edges, prep.rank_rows, P, n_per_part,
                tuple(int(d) for d in directions), chunk_edges, weighted,
                prep.weight_col)
        return _build_blocks_fused(prep.edges, prep.rank_rows, P, n_per_part,
                                   tuple(int(d) for d in directions),
                                   chunk_edges, weighted, prep.weight_col)
    if prep.encode_mode == "broadcast-small":
        return _build_blocks_small(prep, tuple(int(d) for d in directions),
                                   chunk_edges, weighted)
    if _os.environ.get("RAYLINK_CSR_EXCHANGE", "tasks") != "dataset":
        return _build_blocks_exchange(prep,
                                      tuple(int(d) for d in directions),
                                      chunk_edges, weighted)
    # coalesce the encoded edges into ~8 blocks per partition before packing:
    # the pack stage emits one row per (dir, part) per input block, so block
    # count directly multiplies the shuffle's row count
    n_blocks = max(64, 8 * P)
    enc_in = prep.enc_edges
    # enc_edges may be lazy (broadcast mode): num_blocks() raises there, so
    # the block count travels as a hint set where the input WAS materialized
    in_blocks = prep.enc_blocks_hint
    if in_blocks == 0:
        try:
            in_blocks = enc_in.num_blocks()
        except NotImplementedError:
            in_blocks = n_blocks  # unknown: skip the coalesce
    if in_blocks > n_blocks:
        enc_in = enc_in.repartition(n_blocks)
    enc = enc_in.map_batches(_pack_fn(P, directions),
                             batch_format="pyarrow", zero_copy_batch=True)
    block_rows = (
        enc.groupby(["dir", "src_part"])
        .map_groups(
            lambda g: _build_block_rows(g, P, n_per_part, chunk_edges,
                                        weighted),
            batch_format="pyarrow",
        )
        .materialize()
    )
    return _collect_blocks(block_rows)


def _graph_of(prep: PreparedEdges, blocks: dict[int, list[Any]], m: int,
              weighted: bool = False) -> Graph:
    return Graph(
        P=prep.P, n=prep.n, m=m, n_per_part=prep.n_per_part, blocks=blocks,
        prep=prep, key_type=prep.key_type, weighted=weighted,
    )


def build_graph_from_prepared(prep: PreparedEdges, *, symmetric: bool = False,
                              transpose: bool = False,
                              chunk_edges: int = CHUNK_EDGES,
                              weighted: bool = False) -> Graph:
    """One-direction build from shared prep. ``transpose=True`` builds the
    in-edge CSR (direction code 2; mutually exclusive with symmetric).
    ``weighted=True`` keeps duplicate-(src,dst) multiplicities as edge
    weights (feed a NON-distinct edge stream)."""
    if symmetric and transpose:
        raise ValueError("symmetric and transpose are mutually exclusive")
    d = 2 if transpose else int(symmetric)
    blocks, m = _build_blocks(prep, (d,), chunk_edges, weighted)
    return _graph_of(prep, blocks.get(d, {}), m.get(d, 0), weighted)


def build_graph_pair(prep: PreparedEdges,
                     chunk_edges: int = CHUNK_EDGES) -> tuple[Graph, Graph]:
    """Directed AND symmetric graphs from ONE pack pass + ONE shuffle
    (grouped by (dir, src_part)) — the flagship needs both."""
    blocks, m = _build_blocks(prep, (False, True), chunk_edges)
    return (_graph_of(prep, blocks.get(0, {}), m.get(0, 0)),
            _graph_of(prep, blocks.get(1, {}), m.get(1, 0)))


def build_graph_fwd_rev(prep: PreparedEdges,
                        chunk_edges: int = CHUNK_EDGES) -> tuple[Graph, Graph]:
    """Directed graph AND its transpose (in-edge CSR) from ONE pack pass +
    ONE shuffle — the fwd/rev pair kernels like HITS alternate over. Both
    share the vertex dictionary, so vids agree across the pair."""
    blocks, m = _build_blocks(prep, (0, 2), chunk_edges)
    return (_graph_of(prep, blocks.get(0, {}), m.get(0, 0)),
            _graph_of(prep, blocks.get(2, {}), m.get(2, 0)))


def build_graph(
    edges: rd.Dataset,
    *,
    P: int = DEFAULT_P,
    symmetric: bool = False,
    already_deduped: bool = False,
    chunk_edges: int = CHUNK_EDGES,
    weighted: bool = False,
    weight_col: str | None = None,
) -> Graph:
    """Full build: dedup -> vertices -> encode -> CSR blocks.

    ``symmetric=True`` adds reversed edges before partitioning (undirected
    kernels: connected components, label propagation, triangles).
    ``weighted=True``: duplicate (src,dst) rows collapse to one edge whose
    weight is the multiplicity (pass the non-distinct stream and
    ``already_deduped=True`` so nothing upstream drops the duplicates).
    ``weight_col``: use a float column of ``edges`` as the weight instead
    (duplicates SUM; see prepare_edges for the encode-path restriction)."""
    prep = prepare_edges(edges, P=P, already_deduped=already_deduped,
                         weight_col=weight_col)
    return build_graph_from_prepared(prep, symmetric=symmetric,
                                     chunk_edges=chunk_edges,
                                     weighted=weighted or weight_col is not None)


@ray.remote
def _pad_block(blk: CSRBlock, n_local_new: int) -> CSRBlock:
    """Worker-side deg pad for a partition that gained vertices but no
    edges (the merged state vectors are n_local_new long)."""
    pad = n_local_new - blk.n_local
    return CSRBlock(part=blk.part, src_local=blk.src_local,
                    dst_local=blk.dst_local, bounds=blk.bounds,
                    deg=np.concatenate([blk.deg, np.zeros(pad, np.int64)]),
                    n_local=n_local_new, w=blk.w, wdeg=None if blk.wdeg is
                    None else np.concatenate(
                        [blk.wdeg, np.zeros(pad, blk.wdeg.dtype)]))


@ray.remote
def _block_m(blk: CSRBlock) -> int:
    return blk.m


def rank_rows_from_vertices(vertices: rd.Dataset, P: int) -> rd.Dataset:
    """Reconstruct per-part dictionary rows (part, hashes asc, vids) from a
    (key, vid, part) vertices table — all distributed (per-batch partial
    lists, one grouped merge), no driver gather. Vids ride explicitly, so
    the rows are valid for ANY vid assignment (fresh rank order or merged
    appended ranks). Used by graphstore so loaded graphs keep the
    partitioned-dictionary merge path."""

    def lists(batch: pa.Table) -> pa.Table:
        h = hash64(batch["key"])
        vid = batch["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = batch["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, part))
        hs, vs, ps = h[order], vid[order], part[order]
        bounds = np.searchsorted(ps, np.arange(P + 1)).astype(np.int64)
        present = np.flatnonzero(np.diff(bounds) > 0)
        offsets = pa.array(
            np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
            pa.int32())
        return pa.table({
            "part": pa.array(present.astype(np.int64), pa.int64()),
            "hashes": pa.ListArray.from_arrays(offsets,
                                               pa.array(hs, pa.uint64())),
            "vids": pa.ListArray.from_arrays(offsets,
                                             pa.array(vs, pa.int64())),
        })

    def combine(g: pa.Table) -> pa.Table:
        p = int(g["part"][0].as_py())
        hl = g["hashes"].combine_chunks()
        vl = g["vids"].combine_chunks()
        h = hl.flatten().to_numpy(zero_copy_only=False)
        v = vl.flatten().to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        return pa.table({
            "part": pa.array([p], pa.int64()),
            "hashes": pa.array([h[order]], pa.list_(pa.uint64())),
            "vids": pa.array([v[order]], pa.list_(pa.int64())),
        })

    return vertices.map_batches(lists, batch_format="pyarrow",
                                zero_copy_batch=True).groupby(
        "part").map_groups(combine, batch_format="pyarrow")


def _unknown_keys_partitioned(new_edges: rd.Dataset, rank_rows: rd.Dataset,
                              P: int, key_type) -> rd.Dataset:
    """New-key discovery against a PARTITIONED dictionary: candidate
    (key, h) pairs bucket to part = h % P and anti-join the part's sorted
    hash list in one grouped pass — no broadcast dictionary, no driver
    structure proportional to the accumulated vertex count. Output rows
    (key, h) are already globally distinct (per-part dedup + hash-disjoint
    parts)."""
    cand_schema = pa.schema([
        ("part", pa.int64()), ("kind", pa.int8()),
        ("keys", pa.list_(key_type)), ("hs", pa.list_(pa.uint64()))])

    def cands(batch: pa.Table) -> pa.Table:
        keys = pa.concat_arrays([batch["src"].combine_chunks().cast(key_type),
                                 batch["dst"].combine_chunks().cast(key_type)])
        keys = pc.unique(keys)
        if len(keys) == 0:
            return cand_schema.empty_table()
        h = hash64(keys)
        part = (h % np.uint64(P)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        sk = keys.take(pa.array(order))
        sh, sp = h[order], part[order]
        bounds = np.searchsorted(sp, np.arange(P + 1)).astype(np.int64)
        present = np.flatnonzero(np.diff(bounds) > 0)
        offsets = pa.array(
            np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
            pa.int32())
        k = len(present)
        return pa.table({
            "part": pa.array(present.astype(np.int64), pa.int64()),
            "kind": pa.array(np.ones(k, np.int8), pa.int8()),
            "keys": pa.ListArray.from_arrays(offsets, sk),
            "hs": pa.ListArray.from_arrays(offsets, pa.array(sh, pa.uint64())),
        }, schema=cand_schema)

    def dict_rows(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        return pa.table({
            "part": batch["part"],
            "kind": pa.array(np.zeros(k, np.int8), pa.int8()),
            "keys": _empty_list_col(k, key_type),
            "hs": batch["hashes"],
        }, schema=cand_schema)

    cd = new_edges.map_batches(cands, batch_format="pyarrow",
                               zero_copy_batch=True)
    dr = rank_rows.select_columns(["part", "hashes"]).map_batches(
        dict_rows, batch_format="pyarrow")

    def per_part(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        hl = g["hs"].combine_chunks()
        h_flat = hl.flatten().to_numpy(zero_copy_only=False)
        h_offs = hl.offsets.to_numpy(zero_copy_only=False)
        di = np.flatnonzero(kinds == 0)
        u = (h_flat[h_offs[di[0]]: h_offs[di[0] + 1]]
             if len(di) else np.array([], np.uint64))
        kl = g["keys"].combine_chunks()
        k_offs = kl.offsets.to_numpy(zero_copy_only=False)
        ci = np.flatnonzero(kinds == 1)
        if len(ci) == 0:
            return pa.table({"key": pa.array([], key_type),
                             "h": pa.array([], pa.uint64())})
        ch = np.concatenate([h_flat[h_offs[i]: h_offs[i + 1]] for i in ci])
        ck = pa.concat_arrays([kl.values.slice(
            int(k_offs[i]), int(k_offs[i + 1] - k_offs[i])) for i in ci])
        # per-part global dedup (candidates repeat across batches)
        _, first = np.unique(ch, return_index=True)
        first = np.sort(first)
        ch = ch[first]
        ck = ck.take(pa.array(first.astype(np.int64)))
        if len(u):
            pos = np.searchsorted(u, ch)
            safe = np.minimum(pos, len(u) - 1)
            known = (pos < len(u)) & (u[safe] == ch)
        else:
            known = np.zeros(len(ch), bool)
        return pa.table({"key": ck.filter(pa.array(~known)),
                         "h": pa.array(ch[~known], pa.uint64())})

    return cd.union(dr).groupby("part").map_groups(
        per_part, batch_format="pyarrow")


def _merged_rank_rows(rank_rows: rd.Dataset, P: int, parts_new: np.ndarray,
                      nh: np.ndarray, new_vids: np.ndarray) -> rd.Dataset:
    """Merged per-part dictionary rows (part, hashes asc, vids parallel):
    old entries keep their vids (rank*P+part on first-generation rows,
    the explicit ``vids`` column on already-merged rows), new (hash, vid)
    pairs — a small driver-held set, broadcast once — interleave by hash.
    Appended vids break the rank==sorted-index identity, hence the
    explicit vids column consumed by ``_encode_partitioned``."""
    new_ref = ray.put((parts_new, nh, new_vids))

    def merge_row(batch: pa.Table) -> pa.Table:
        pn, nhs, nvs = ray.get(new_ref)
        hl = batch["hashes"].combine_chunks()
        h_flat = hl.flatten().to_numpy(zero_copy_only=False)
        h_offs = hl.offsets.to_numpy(zero_copy_only=False)
        vl = (batch["vids"].combine_chunks()
              if "vids" in batch.column_names else None)
        if vl is not None:
            v_flat = vl.flatten().to_numpy(zero_copy_only=False)
            v_offs = vl.offsets.to_numpy(zero_copy_only=False)
        parts_col = batch["part"].to_numpy(zero_copy_only=False)
        out_p, out_h, out_v = [], [], []
        for i, p in enumerate(parts_col):
            u = h_flat[h_offs[i]: h_offs[i + 1]]
            uv = (v_flat[v_offs[i]: v_offs[i + 1]] if vl is not None
                  else np.arange(len(u), dtype=np.int64) * P + int(p))
            sel = pn == int(p)
            h_all = np.concatenate([u, nhs[sel]])
            v_all = np.concatenate([uv, nvs[sel]])
            order = np.argsort(h_all, kind="stable")
            out_p.append(int(p))
            out_h.append(h_all[order])
            out_v.append(v_all[order])
        return pa.table({
            "part": pa.array(out_p, pa.int64()),
            "hashes": pa.array(out_h, pa.list_(pa.uint64())),
            "vids": pa.array(out_v, pa.list_(pa.int64())),
        })

    merged = rank_rows.map_batches(merge_row, batch_format="pyarrow")
    # parts that gain their FIRST vertices have no old dictionary row
    present: set[int] = set()
    for b in rank_rows.select_columns(["part"]).iter_batches(
            batch_format="pyarrow"):
        present.update(b["part"].to_numpy(zero_copy_only=False).tolist())
    missing = sorted(set(np.unique(parts_new).tolist()) - present)
    if missing:
        mp, mh, mv = [], [], []
        for p in missing:
            sel = np.flatnonzero(parts_new == p)
            order = sel[np.argsort(nh[sel], kind="stable")]
            mp.append(int(p))
            mh.append(nh[order])
            mv.append(new_vids[order])
        merged = merged.union(rd.from_arrow(pa.table({
            "part": pa.array(mp, pa.int64()),
            "hashes": pa.array(mh, pa.list_(pa.uint64())),
            "vids": pa.array(mv, pa.list_(pa.int64())),
        })))
    return merged.materialize()


def merge_edges(graph: Graph, new_edges: rd.Dataset, *,
                symmetric: bool = True,
                chunk_edges: int = CHUNK_EDGES) -> Graph:
    """Incrementally extend an UNWEIGHTED graph with a batch of new edges
    (the daily-crawl-increment path) WITHOUT re-encoding or re-shuffling
    the existing edge set.

    New vertices get vids appended AFTER the partition's existing ranks
    (vid = (n_old_p + i) * P + p, new hashes ascending), so every
    existing vid — and every untouched CSR block — is reused verbatim.
    Only partitions that receive new edges rebuild their blocks (old
    pairs are reconstructed from the partition's own CSR chunks inside
    the rebuild task and deduped against the new arrivals in the same
    np.unique pass as a fresh build); partitions that merely grew their
    vertex count get a cheap deg-pad patch. Kernel results on the merged
    graph match a fresh build over the unioned edge list exactly (keyed
    by vertex key — vids of NEW vertices differ from a fresh build's).

    ``symmetric`` must match the direction of the original build (a
    Graph handle does not record it). Dictionary regimes:
      - broadcast/small builds (``prep.dict_ref``): new-key discovery and
        re-encode probe the broadcast (h, vid) arrays;
      - partitioned/fused builds (``prep.rank_rows``, no dict_ref): the
        10^12-vertex path — discovery is a hash-bucketed anti-join of
        candidate keys against the per-part dictionary rows, the merged
        dictionary is per-part (hashes, vids) rows (appended vids break
        the rank==sorted-index identity, so vids ride explicitly), and
        the new edges re-encode through the partitioned dictionary JOIN.
        No structure proportional to the accumulated vertex count exists
        anywhere on the driver;
      - loaded (graphstore) graphs reload persisted rank rows and take
        the partitioned path too; only PRE-has_ranks saves fall back to
        a broadcast rebuild from the vertices table (<= 4M vertices,
        else raises).
    In every regime the driver holds only the NEW vertex set (hash, key)
    — increments are assumed vertex-sparse relative to the accumulated
    graph, the usual crawl shape."""
    if graph.weighted:
        raise NotImplementedError("merge_edges supports unweighted graphs")
    prep = graph.prep
    partitioned = prep.dict_ref is None and prep.rank_rows is not None
    if prep.dict_ref is None and not partitioned:
        # loaded (graphstore) graphs carry no dictionary at all; rebuild
        # a broadcast one from the vertices table when the graph is
        # inside the broadcast regime (the load -> merge daily-increment
        # path)
        if graph.n > 4_000_000:
            raise NotImplementedError(
                "merge_edges on a dictionary-less graph above the "
                "broadcast bound: save/load persists no rank rows — "
                "rebuild them or merge before saving")
        hs_l, vid_l = [], []
        for b in graph.vertices.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 20):
            hs_l.append(hash64(b["key"]))
            vid_l.append(b["vid"].to_numpy(zero_copy_only=False))
        h = (np.concatenate(hs_l) if hs_l else np.array([], np.uint64))
        v = (np.concatenate(vid_l) if vid_l else np.array([], np.int64))
        order = np.argsort(h, kind="stable")
        prep.dict_ref = ray.put((h[order], v[order].astype(np.int64)))
    P = graph.P
    n_old = np.asarray(graph.n_per_part, dtype=np.int64)
    key_type = graph.key_type
    old_vertices = graph.vertices.materialize()

    def drop_self(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))

    new_edges = new_edges.map_batches(drop_self, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()

    # 1. discover NEW keys (hash not in the old dictionary), distributed
    # pre-dedup per batch; the driver gathers only the new vertex set
    dict_ref = prep.dict_ref

    def unknown(batch: pa.Table) -> pa.Table:
        hs_old, _ = ray.get(dict_ref)
        keys = pa.concat_arrays([batch["src"].combine_chunks().cast(key_type),
                                 batch["dst"].combine_chunks().cast(key_type)])
        keys = pc.unique(keys)
        h = hash64(keys)
        if len(hs_old):
            pos = np.searchsorted(hs_old, h)
            safe = np.minimum(pos, len(hs_old) - 1)
            known = (pos < len(hs_old)) & (hs_old[safe] == h)
        else:
            known = np.zeros(len(h), bool)
        nk = keys.filter(pa.array(~known))
        return pa.table({"key": nk, "h": pa.array(h[~known], pa.uint64())})

    if partitioned:
        unknown_ds = _unknown_keys_partitioned(
            new_edges, prep.rank_rows, P, key_type)
    else:
        unknown_ds = new_edges.map_batches(unknown, batch_format="pyarrow",
                                           zero_copy_batch=True)
    new_rows = []
    for b in unknown_ds.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20):
        new_rows.append(b)
    if new_rows:
        nt = pa.concat_tables(new_rows)
        nh = nt["h"].to_numpy(zero_copy_only=False)
        _, first = np.unique(nh, return_index=True)
        nt = nt.take(pa.array(np.sort(first), pa.int64()))
        nh = nt["h"].to_numpy(zero_copy_only=False)
        nkeys = nt["key"]
    else:
        nh = np.array([], np.uint64)
        nkeys = pa.array([], key_type)

    # 2. assign appended vids per partition (new hashes ascending)
    n_per_part = n_old.copy()
    parts = (nh % np.uint64(P)).astype(np.int64)
    new_vids = np.empty(len(nh), np.int64)
    for p in np.unique(parts):
        sel = np.flatnonzero(parts == p)
        order = sel[np.argsort(nh[sel], kind="stable")]
        new_vids[order] = (n_old[p] + np.arange(len(sel))) * P + p
        n_per_part[p] += len(sel)
    n_new = int(n_per_part.sum())

    # 3. merged dictionary + 4. re-encode of the new edges only
    new_dict_ref = None
    merged_rank_rows = None
    if partitioned:
        merged_rank_rows = _merged_rank_rows(
            prep.rank_rows, P, parts, nh, new_vids)
        enc = _encode_partitioned(new_edges, merged_rank_rows, P)
    else:
        hs_old, vids_old = ray.get(dict_ref)
        h_all = np.concatenate([hs_old, nh])
        v_all = np.concatenate([vids_old, new_vids])
        order = np.argsort(h_all, kind="stable")
        new_dict_ref = ray.put((h_all[order], v_all[order]))

        def encode_fn(batch: pa.Table) -> pa.Table:
            hs, vs = ray.get(new_dict_ref)
            sv = vs[np.searchsorted(hs, hash64(batch["src"]))]
            dv = vs[np.searchsorted(hs, hash64(batch["dst"]))]
            return pa.table({"src_vid": pa.array(sv, pa.int64()),
                             "dst_vid": pa.array(dv, pa.int64())})

        enc = new_edges.map_batches(encode_fn, batch_format="pyarrow",
                                    zero_copy_batch=True)
    direction = int(symmetric)
    packed = enc.map_batches(_pack_fn(P, (direction,)),
                             batch_format="pyarrow", zero_copy_batch=True)

    # 5. per affected partition: reconstruct old pairs from the existing
    # CSR chunks, concat the new arrivals, rebuild (dedup included)
    old_blocks = graph.blocks
    npp = n_per_part

    def rebuild(group: pa.Table) -> pa.Table:
        import ray as _ray

        part = int(group["src_part"][0].as_py())
        sv_new = group["srcs"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        dv_new = group["dsts"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        svs, dvs = [sv_new], [dv_new]
        for ref in old_blocks.get(part, []):
            blk = _ray.get(ref)
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                svs.append(blk.src_local[lo:hi].astype(np.int64) * P + part)
                dvs.append(blk.dst_local[lo:hi].astype(np.int64) * P + q)
        sv = np.concatenate(svs)
        dv = np.concatenate(dvs)
        return _csr_rows_from_vids(part, direction, sv, dv, P, npp,
                                   chunk_edges)

    block_rows = (packed.groupby(["dir", "src_part"])
                  .map_groups(rebuild, batch_format="pyarrow")
                  .materialize())
    rebuilt, m_by_dir = _collect_blocks(block_rows)
    rebuilt = rebuilt.get(direction, {})

    # 6. untouched partitions: reuse refs; pad deg where the vertex count
    # grew without new edges (possible on DIRECTED merges only). Both the
    # pad and the edge counting run in worker tasks — no CSR payload
    # crosses the driver (only O(#chunks) ints come back).
    blocks: dict[int, list[Any]] = dict(rebuilt)
    m_total = int(m_by_dir.get(direction, 0))
    grown = {p for p in range(P) if n_per_part[p] > n_old[p]}
    m_refs = []
    for p, refs in old_blocks.items():
        if p in blocks:
            continue
        if p in grown:
            blocks[p] = [_pad_block.remote(r, int(n_per_part[p]))
                         for r in refs]
        else:
            blocks[p] = list(refs)
        m_refs.extend(_block_m.remote(r) for r in refs)
    m_total += sum(ray.get(m_refs))

    # 7. merged vertices table (old rows verbatim + appended new rows)
    nv_tab = pa.table({"key": nkeys,
                       "vid": pa.array(new_vids, pa.int64()),
                       "part": pa.array(parts, pa.int64())})
    merged_vertices = old_vertices.union(
        rd.from_arrow(nv_tab)).materialize()

    prep2 = PreparedEdges(
        enc_edges=None, dict_ref=new_dict_ref, n=n_new,
        n_per_part=n_per_part, P=P, key_type=key_type, edges=None,
        vertices_cache=merged_vertices,
        encode_mode="merged-partitioned" if partitioned else "merged",
        rank_rows=merged_rank_rows)
    return Graph(P=P, n=n_new, m=m_total, n_per_part=n_per_part,
                 blocks=blocks, prep=prep2, key_type=key_type)


def edges_table(graph: Graph) -> rd.Dataset:
    """(src_vid, dst_vid[, w]) rows reconstructed from the CSR blocks —
    the inverse of the build. One task per CSR chunk; payloads never
    cross the driver. On a symmetric build every undirected edge appears
    in both directions (exactly as stored)."""
    refs = graph.blocks
    P = graph.P
    weighted = graph.weighted
    items = [{"part": p, "i": i}
             for p, chunk_refs in sorted(graph.blocks.items())
             for i in range(len(chunk_refs))]
    if not items:
        cols = {"src_vid": pa.array([], pa.int64()),
                "dst_vid": pa.array([], pa.int64())}
        if weighted:
            cols["w"] = pa.array([], pa.float64())
        return rd.from_arrow(pa.table(cols))

    def expand(batch: pa.Table) -> pa.Table:
        import ray as _ray

        svs, dvs, ws = [], [], []
        parts = batch["part"].to_numpy(zero_copy_only=False)
        idxs = batch["i"].to_numpy(zero_copy_only=False)
        for part, i in zip(parts, idxs):
            blk = _ray.get(refs[int(part)][int(i)])
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                svs.append(blk.src_local[lo:hi].astype(np.int64) * P
                           + int(part))
                dvs.append(blk.dst_local[lo:hi].astype(np.int64) * P + q)
                if weighted and blk.w is not None:
                    ws.append(blk.w[lo:hi])
        sv = (np.concatenate(svs) if svs else np.array([], np.int64))
        dv = (np.concatenate(dvs) if dvs else np.array([], np.int64))
        cols = {"src_vid": pa.array(sv, pa.int64()),
                "dst_vid": pa.array(dv, pa.int64())}
        if weighted:
            w = (np.concatenate(ws) if ws else np.array([], np.float64))
            cols["w"] = pa.array(w)
        return pa.table(cols)

    return rd.from_items(items).map_batches(
        expand, batch_format="pyarrow", batch_size=1)


def subgraph_same_vids(graph: Graph, edges_vids: rd.Dataset, *,
                       chunk_edges: int = CHUNK_EDGES) -> Graph:
    """SYMMETRIC subgraph over the SAME vid space and partition geometry
    from canonical (src_vid, dst_vid) rows (src < dst, this graph's vids)
    — e.g. the survivors of a peel round or any edge filter.

    ONE pack + groupby shuffle: no dictionary encode, no key remap — the
    vertex dictionary, n, n_per_part and P are reused verbatim (vertices
    that lost all edges keep their vids with degree 0). This is what makes
    iterated edge-peeling (k-truss) affordable: a full ``build_graph``
    re-ranks keys and forces every downstream row back through a vid
    join, this rebuild leaves ids stable.

    Weighted graphs carry their ``w`` column through the pack (the rows
    must include it — :func:`edges_table` emits it); duplicate pairs SUM,
    and the rebuilt blocks keep the original weight lattice (int64
    multiplicities stay int64 — exact through the float64 packed list —
    float weight-col graphs stay float64)."""
    P, npp = graph.P, graph.n_per_part
    weighted = graph.weighted
    cols = ["src_vid", "dst_vid"] + (["w"] if weighted else [])
    sel = edges_vids.select_columns(cols)
    w_dtype = None
    if weighted:
        sch = sel.schema()
        wt = dict(zip(sch.names, sch.types))["w"]
        w_dtype = np.int64 if pa.types.is_integer(wt) else np.float64
    enc = sel.map_batches(
        _pack_fn(P, (1,)), batch_format="pyarrow", zero_copy_batch=True)
    block_rows = (
        enc.groupby(["dir", "src_part"])
        .map_groups(lambda g: _build_block_rows(g, P, npp, chunk_edges,
                                                w_dtype=w_dtype),
                    batch_format="pyarrow")
        .materialize()
    )
    blocks, m = _collect_blocks(block_rows)
    return Graph(P=P, n=graph.n, m=m.get(1, 0), n_per_part=npp,
                 blocks=blocks.get(1, {}), prep=graph.prep,
                 key_type=graph.key_type, weighted=weighted)


def contract_by_label(graph: Graph, labels: rd.Dataset, *,
                      label_col: str = "label",
                      num_partitions: int = 8) -> rd.Dataset:
    """Quotient (community / super-) graph of a labeling: rows
    (src_label, dst_label, n_edges), one per ordered label pair, n_edges =
    stored directed edges between the classes (a symmetric build counts
    each undirected edge in both directions, exactly as stored).

    Composition, all distributed: :func:`edges_table` (CSR payloads never
    touch the driver) -> two co-partitioned hash joins against the
    (vid, label) table -> grouped count with a per-batch partial combine.
    The standard coarsening step between a community detection pass (LP /
    CC) and whole-graph analytics over the contracted graph.

    ``num_partitions`` is PER JOIN and the two joins run back to back:
    each wants its own pool of aggregator actors, so keep the product
    (2 x num_partitions) comfortably under the cluster's CPU count —
    oversubscribed chained joins stall each other (measured: 2 x 32 on a
    32-CPU node crawled; 2 x 8 ran in ~2 s on the same input)."""
    from .ops import hash_join

    lab = labels.select_columns(["vid", label_col])

    def _side(side: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([
                f"{side}_vid" if c == "vid" else f"{side}_label"
                for c in batch.column_names])
        return f

    weighted = graph.weighted
    cols = ["src_vid", "dst_vid"] + (["w"] if weighted else [])
    e = edges_table(graph).select_columns(cols)
    e = hash_join(e, lab.map_batches(_side("src"), batch_format="pyarrow"),
                  "src_vid", num_partitions=num_partitions)
    e = hash_join(e, lab.map_batches(_side("dst"), batch_format="pyarrow"),
                  "dst_vid", num_partitions=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        keep = ["src_label", "dst_label"] + (["w"] if weighted else [])
        aggs = [([], "count_all")] + ([("w", "sum")] if weighted else [])
        return batch.select(keep).group_by(
            ["src_label", "dst_label"]).aggregate(aggs)

    from ray.data.aggregate import Sum

    def finish(batch: pa.Table) -> pa.Table:
        names = {"sum(count_all)": "n_edges", "sum(w_sum)": "sum_w"}
        return batch.rename_columns(
            [names.get(c, c) for c in batch.column_names])

    aggs = [Sum("count_all")] + ([Sum("w_sum")] if weighted else [])
    out = (e.map_batches(partial, batch_format="pyarrow")
           .groupby(["src_label", "dst_label"]).aggregate(*aggs)
           .map_batches(finish, batch_format="pyarrow")).materialize()
    # the joins are INNER: an endpoint missing from the label table would
    # silently drop its edges. Raise instead (same raise-on-partial-coverage
    # discipline as bsp.vertex_table_to_state); the quotient is label^2-
    # sized, so this total is cheap.
    import pyarrow.compute as pc2

    covered = 0
    for b in out.select_columns(["n_edges"]).iter_batches(
            batch_format="pyarrow"):
        covered += int(pc2.sum(b["n_edges"]).as_py() or 0)
    if covered != graph.m:
        raise ValueError(
            f"contract_by_label: labels cover only {covered} of {graph.m} "
            "stored edges — the label table must assign every vertex")
    return out
