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


# ---------------------------------------------------------------------------
# partition hashing (pure; replicated in oracle.py)
# ---------------------------------------------------------------------------

_HASH_SEED = 42


def hash64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized seeded 64-bit key hash (deterministic across processes
    for a pinned polars version; the oracle calls through this too)."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(arr).hash(seed=_HASH_SEED).to_numpy().astype(np.uint64)


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


def dedup_edges(edges: rd.Dataset, *, buckets: int = DEDUP_BUCKETS) -> rd.Dataset:
    """Exact (src,dst) distinct, self-loops dropped.

    Pattern: vectorized batch-local combine (cuts shuffle volume), then an
    explicit partitioned distinct — bucket by a hash of the pair (a single
    int key, far cheaper to shuffle than sorting the string pair globally)
    and dedup within each bucket with an Arrow hash group-by. A given
    (src,dst) always lands in the same bucket, so the result is globally
    distinct."""
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


def build_vertex_ranks(edges: rd.Dataset, P: int):
    """Distinct endpoint HASHES -> dense ranks, via an INT-ONLY shuffle.

    The dictionary rank order is (hash64(key), key) within each partition,
    so when the 64-bit hashes are globally collision-free (checked), ranks
    are fully determined by the hashes alone and the shuffle never ships a
    single key string — ~8 bytes/occurrence instead of whole URLs. Returns
    (h_sorted, vid_sorted, n_per_part, n) with h_sorted globally sorted for
    vectorized probes, or None when a collision is detected (caller falls
    back to the string path, same canonical order).
    """

    def hash_lists(batch: pa.Table) -> pa.Table:
        h = np.unique(np.concatenate(
            [hash64(batch["src"]), hash64(batch["dst"])]
        ))
        part = (h % np.uint64(P)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        hs, ps = h[order], part[order]
        bounds = np.searchsorted(ps, np.arange(P + 1)).astype(np.int64)
        present = np.flatnonzero(np.diff(bounds) > 0)
        offsets = pa.array(np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
                           pa.int32())
        return pa.table({
            "part": pa.array(present.astype(np.int64), pa.int64()),
            "hashes": pa.ListArray.from_arrays(offsets, pa.array(hs, pa.uint64())),
        })

    packed = edges.map_batches(hash_lists, batch_format="pyarrow",
                               zero_copy_batch=True)

    def assign(group: pa.Table) -> pa.Table:
        hl = group["hashes"].combine_chunks()
        u = np.unique(hl.flatten().to_numpy(zero_copy_only=False))  # sorted
        p = int(group["part"][0].as_py())
        return pa.table({
            "part": pa.array([p], pa.int64()),
            "hashes": pa.array([u], pa.list_(pa.uint64())),
        })

    rows = packed.groupby("part").map_groups(
        assign, batch_format="pyarrow").materialize()

    n_per_part = np.zeros(P, dtype=np.int64)
    hs_parts, vid_parts = [], []
    for b in rows.iter_batches(batch_format="pyarrow"):
        col = b["hashes"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        parts = b["part"].to_numpy(zero_copy_only=False)
        for i, p in enumerate(parts):
            u = flat[offs[i]: offs[i + 1]]
            n_per_part[p] = len(u)
            hs_parts.append(u)
            vid_parts.append(np.arange(len(u), dtype=np.int64) * P + int(p))
    if not hs_parts:
        return np.array([], np.uint64), np.array([], np.int64), n_per_part, 0
    h_all = np.concatenate(hs_parts)
    vid_all = np.concatenate(vid_parts)
    order = np.argsort(h_all, kind="stable")
    h_sorted, vid_sorted = h_all[order], vid_all[order]
    if len(np.unique(h_sorted)) != len(h_sorted):
        return None  # collision: caller uses the string fallback
    return h_sorted, vid_sorted, n_per_part, int(len(h_sorted))


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
    """

    part: int
    src_local: np.ndarray
    dst_local: np.ndarray
    bounds: np.ndarray
    deg: np.ndarray
    n_local: int

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

    @property
    def vertices(self) -> rd.Dataset:
        """(key, vid, part) table — built lazily on first use (the kernels
        themselves never need key strings)."""
        return self.prep.vertices

    def parts_with_edges(self) -> list[int]:
        return sorted(self.blocks)


def _build_block_rows(group: pa.Table, P: int, n_per_part: np.ndarray,
                      chunk_edges: int) -> pa.Table:
    part = int(group["src_part"][0].as_py())
    direction = int(group["dir"][0].as_py()) if "dir" in group.column_names else 0
    src = group["srcs"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    dst = group["dsts"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    # global exact dedup happens HERE, for free: any given (src,dst) pair
    # always lands in this partition, so a local unique is a global one.
    # (Self-loops were dropped before the vertex build.)
    pair = np.stack([src, dst], axis=1)
    pair = np.unique(pair, axis=0)
    src, dst = pair[:, 0].astype(np.int64), pair[:, 1].astype(np.int64)
    n_local = int(n_per_part[part])
    src_local = (src // P).astype(np.int32)
    dst_part = (dst % P).astype(np.int64)
    dst_local = (dst // P).astype(np.int32)
    order = np.lexsort((src_local, dst_local, dst_part))
    src_local, dst_local, dst_part = src_local[order], dst_local[order], dst_part[order]
    bounds = np.searchsorted(dst_part, np.arange(P + 1), side="left").astype(np.int64)
    deg = np.bincount(src_local, minlength=n_local).astype(np.int64)
    m = len(src_local)
    n_chunks = max(1, -(-m // chunk_edges))
    rows = []
    for c in range(n_chunks):
        lo, hi = c * chunk_edges, min((c + 1) * chunk_edges, m)
        # per-chunk bounds, clipped into [lo, hi) and rebased to 0
        cb = np.clip(bounds, lo, hi) - lo
        blk = CSRBlock(
            part=part,
            src_local=src_local[lo:hi],
            dst_local=dst_local[lo:hi],
            bounds=cb,
            deg=deg,
            n_local=n_local,
        )
        rows.append({"part": part, "chunk": c, "m": hi - lo,
                     "payload": pickle.dumps(blk, protocol=5)})
    return pa.table(
        {
            "dir": pa.array([direction] * len(rows), pa.int64()),
            "part": pa.array([r["part"] for r in rows], pa.int64()),
            "chunk": pa.array([r["chunk"] for r in rows], pa.int64()),
            "m": pa.array([r["m"] for r in rows], pa.int64()),
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        }
    )


@dataclass
class PreparedEdges:
    """Encoded edge table + vertex dictionary, shareable by several builds
    (directed + symmetric builds pay the key->vid lookup only once).

    The (key, vid, part) string TABLE is built lazily — the kernels only
    need hashes and ranks; keys are materialized the first time something
    joins vids back to keys (``vertices``)."""

    enc_edges: rd.Dataset  # (src_vid, dst_vid), self-loop-free, materialized
    dict_ref: Any  # ObjectRef[(h_sorted uint64[], vid_sorted int64[])]
    n: int
    n_per_part: np.ndarray
    P: int
    key_type: pa.DataType
    edges: rd.Dataset | None = None  # raw (self-loop-free) edges, for lazy build
    vertices_cache: rd.Dataset | None = None

    @property
    def vertices(self) -> rd.Dataset:
        if self.vertices_cache is None:
            self.vertices_cache = build_vertices(self.edges, self.P).materialize()
        return self.vertices_cache


def prepare_edges(edges: rd.Dataset, *, P: int = DEFAULT_P,
                  already_deduped: bool = False) -> PreparedEdges:
    """Self-loop drop + vertex ranks + vid encoding; the shared prefix of
    any build.

    NOTE exact (src,dst) dedup is NOT a separate shuffle: it happens inside
    the partition-grouped CSR block build (a pair always lands in its src
    partition, so local unique == global unique). ``already_deduped`` now
    only skips the self-loop filter.

    The dictionary is built hash-only (:func:`build_vertex_ranks`, int
    shuffle, no strings); encode probes a broadcast sorted-hash array with
    vectorized searchsorted. Scale path at 10^12 vertices: partitioned
    hash join bucketing both sides by hash64(key) % B — same vid scheme."""
    key_type = edges.schema().base_schema.field("src").type if hasattr(
        edges.schema(), "base_schema") else edges.schema().field("src").type
    if not already_deduped:
        def drop_self(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))

        edges = edges.map_batches(drop_self, batch_format="pyarrow",
                                  zero_copy_batch=True)
    edges = edges.materialize()

    ranks = build_vertex_ranks(edges, P)
    if ranks is None:
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
            return pa.table({"src_vid": vids.take(sidx),
                             "dst_vid": vids.take(didx)})

        enc = edges.map_batches(encode_exact, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        return PreparedEdges(enc_edges=enc, dict_ref=keys_ref, n=n,
                             n_per_part=n_per_part, P=P, key_type=key_type,
                             edges=edges, vertices_cache=vertices)

    h_sorted, vid_sorted, n_per_part, n = ranks
    dict_ref = ray.put((h_sorted, vid_sorted))

    def encode(batch: pa.Table) -> pa.Table:
        hs, vs = ray.get(dict_ref)
        sv = vs[np.searchsorted(hs, hash64(batch["src"]))]
        dv = vs[np.searchsorted(hs, hash64(batch["dst"]))]
        return pa.table({"src_vid": pa.array(sv, pa.int64()),
                         "dst_vid": pa.array(dv, pa.int64())})

    enc = edges.map_batches(encode, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    return PreparedEdges(enc_edges=enc, dict_ref=dict_ref, n=n,
                         n_per_part=n_per_part, P=P, key_type=key_type,
                         edges=edges)


def _pack_fn(P: int, directions: tuple[bool, ...]):
    """Pack encoded edges per (direction, source partition): one
    (dir, src_part, srcs list, dsts list) row per partition per batch, so
    the block shuffle moves ~blocks*P packed rows instead of per-edge rows.
    ``directions``: False = directed edge set, True = symmetrized — both can
    ride the same shuffle (grouped by (dir, src_part))."""

    def pack(batch: pa.Table) -> pa.Table:
        sv0 = batch["src_vid"].to_numpy(zero_copy_only=False)
        dv0 = batch["dst_vid"].to_numpy(zero_copy_only=False)
        tabs = []
        for symmetric in directions:
            if symmetric:
                sv = np.concatenate([sv0, dv0])
                dv = np.concatenate([dv0, sv0])
            else:
                sv, dv = sv0, dv0
            part = sv % P
            order = np.argsort(part, kind="stable")
            sv, dv, part = sv[order], dv[order], part[order]
            bounds = np.searchsorted(part, np.arange(P + 1)).astype(np.int64)
            present = np.flatnonzero(np.diff(bounds) > 0)
            offsets = pa.array(
                np.concatenate([[0], np.diff(bounds)[present].cumsum()]),
                pa.int32())
            tabs.append(pa.table({
                "dir": pa.array(np.full(len(present), int(symmetric)), pa.int64()),
                "src_part": pa.array(present.astype(np.int64), pa.int64()),
                "srcs": pa.ListArray.from_arrays(offsets, pa.array(sv, pa.int64())),
                "dsts": pa.ListArray.from_arrays(offsets, pa.array(dv, pa.int64())),
            }))
        return pa.concat_tables(tabs)

    return pack


def _collect_blocks(block_rows: rd.Dataset) -> dict[int, dict[int, list[Any]]]:
    """block rows -> {dir: {part: [ObjectRef(CSRBlock), ...]}} + edge counts."""
    blocks: dict[int, dict[int, list[Any]]] = {}
    m_total: dict[int, int] = {}
    for b in block_rows.iter_batches(batch_format="pyarrow", batch_size=4):
        for i in range(b.num_rows):
            d = int(b["dir"][i].as_py())
            p = int(b["part"][i].as_py())
            m_total[d] = m_total.get(d, 0) + int(b["m"][i].as_py())
            blk = pickle.loads(b["payload"][i].as_py())
            blocks.setdefault(d, {}).setdefault(p, []).append(ray.put(blk))
    return blocks, m_total


def _build_blocks(prep: PreparedEdges, directions: tuple[bool, ...],
                  chunk_edges: int):
    P, n_per_part = prep.P, prep.n_per_part
    # coalesce the encoded edges into ~8 blocks per partition before packing:
    # the pack stage emits one row per (dir, part) per input block, so block
    # count directly multiplies the shuffle's row count
    n_blocks = max(64, 8 * P)
    enc_in = prep.enc_edges
    if enc_in.num_blocks() > n_blocks:
        enc_in = enc_in.repartition(n_blocks)
    enc = enc_in.map_batches(_pack_fn(P, directions),
                             batch_format="pyarrow", zero_copy_batch=True)
    block_rows = (
        enc.groupby(["dir", "src_part"])
        .map_groups(
            lambda g: _build_block_rows(g, P, n_per_part, chunk_edges),
            batch_format="pyarrow",
        )
        .materialize()
    )
    return _collect_blocks(block_rows)


def _graph_of(prep: PreparedEdges, blocks: dict[int, list[Any]], m: int) -> Graph:
    return Graph(
        P=prep.P, n=prep.n, m=m, n_per_part=prep.n_per_part, blocks=blocks,
        prep=prep, key_type=prep.key_type,
    )


def build_graph_from_prepared(prep: PreparedEdges, *, symmetric: bool = False,
                              chunk_edges: int = CHUNK_EDGES) -> Graph:
    blocks, m = _build_blocks(prep, (symmetric,), chunk_edges)
    d = int(symmetric)
    return _graph_of(prep, blocks.get(d, {}), m.get(d, 0))


def build_graph_pair(prep: PreparedEdges,
                     chunk_edges: int = CHUNK_EDGES) -> tuple[Graph, Graph]:
    """Directed AND symmetric graphs from ONE pack pass + ONE shuffle
    (grouped by (dir, src_part)) — the flagship needs both."""
    blocks, m = _build_blocks(prep, (False, True), chunk_edges)
    return (_graph_of(prep, blocks.get(0, {}), m.get(0, 0)),
            _graph_of(prep, blocks.get(1, {}), m.get(1, 0)))


def build_graph(
    edges: rd.Dataset,
    *,
    P: int = DEFAULT_P,
    symmetric: bool = False,
    already_deduped: bool = False,
    chunk_edges: int = CHUNK_EDGES,
) -> Graph:
    """Full build: dedup -> vertices -> encode -> CSR blocks.

    ``symmetric=True`` adds reversed edges before partitioning (undirected
    kernels: connected components, label propagation, triangles).
    """
    prep = prepare_edges(edges, P=P, already_deduped=already_deduped)
    return build_graph_from_prepared(prep, symmetric=symmetric,
                                     chunk_edges=chunk_edges)
