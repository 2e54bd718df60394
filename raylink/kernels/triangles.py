"""Triangle counting: degree-oriented sorted-adjacency intersection.

Algorithm (the standard orientation trick; exact):
  1. take the undirected simple graph (a *symmetric* ``build_graph``);
  2. orient every undirected edge {u,v} from the lower- to the
     higher-(degree, vid) endpoint — the oriented out-degree is bounded by
     O(sqrt(m)) on any graph, which is what tames power-law hubs here;
  3. every triangle is counted exactly once as |N+(u) ∩ N+(v)| summed over
     oriented edges (u,v), with N+ sorted.

Round-1 physical plan: the oriented CSR is broadcast once via ``ray.put``
(size O(m)); counting is a ``map_batches`` over the oriented edge table with
per-batch partial sums -> ``ds.sum``. At 10^12-edge scale the broadcast
becomes a partitioned join (ship N+(v) lists bucketed by hash(v)); the
counting stage is unchanged. Partitioning assumption documented per
SURVEY §2 "custom operators" rule.

Reference parity: global top-k/sort analytics over the whole series
(stumpy_discord.py:462-468) — a whole-graph exact aggregate with the same
sort-within-partition + global-reduce shape (SURVEY §2.9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph


def _gather_sym_edges(graph: Graph) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(u, v) global-vid arrays of the symmetric graph + degree-by-vid."""
    P = graph.P
    max_vid = int((graph.n_per_part.max()) * P + P)
    deg_by_vid = np.zeros(max_vid, dtype=np.int64)
    us, vs = [], []
    for p, refs in sorted(graph.blocks.items()):
        for ref in refs:
            blk = ray.get(ref)
            u = blk.src_local.astype(np.int64) * P + p
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                us.append(u[lo:hi])
                vs.append(blk.dst_local[lo:hi].astype(np.int64) * P + q)
        blk0 = ray.get(refs[0])
        vids = np.arange(blk0.n_local, dtype=np.int64) * P + p
        deg_by_vid[vids] = blk0.deg
    if not us:
        return np.array([], np.int64), np.array([], np.int64), deg_by_vid
    return np.concatenate(us), np.concatenate(vs), deg_by_vid


def triangle_count(graph: Graph, *, batch_size: int = 65536) -> int:
    """Exact global triangle count. ``graph`` must be a symmetric build."""
    u, v, deg = _gather_sym_edges(graph)
    if len(u) == 0:
        return 0
    # orient: keep (u,v) with rank(u) < rank(v), rank = (deg, vid)
    keep = (deg[u] < deg[v]) | ((deg[u] == deg[v]) & (u < v))
    ou, ov = u[keep], v[keep]
    # oriented CSR over vid space, neighbors sorted; plus the sorted
    # edge-code array for O(log m) membership probes
    order = np.lexsort((ov, ou))
    ou, ov = ou[order], ov[order]
    indptr = np.searchsorted(ou, np.arange(len(deg) + 1)).astype(np.int64)
    M = np.int64(len(deg) + 1)
    codes = ou * M + ov  # sorted because (ou, ov) is lexsorted
    csr_ref = ray.put((indptr, ov.copy(), codes))

    edges_tab = pa.table({"u": pa.array(ou), "v": pa.array(ov)})
    edges_ds = rd.from_arrow(edges_tab)

    def count(batch: pa.Table) -> pa.Table:
        """Vectorized wedge counting: for every oriented edge (u, v) in the
        batch, enumerate wedges (v, w) for w in N+(u) beyond v's position
        ... equivalently count pairs (w in N+(u)) with (v, w) present.
        Implementation: expand each edge into its candidate wedge targets
        via np.repeat on CSR slices, then one vectorized sorted-array
        membership probe on the edge codes. No per-edge Python loop."""
        iptr, nbrs, codes_ = ray.get(csr_ref)
        bu = batch["u"].to_numpy(zero_copy_only=False)
        bv = batch["v"].to_numpy(zero_copy_only=False)
        starts, ends = iptr[bu], iptr[bu + 1]
        counts = ends - starts
        if counts.sum() == 0:
            return pa.table({"tri": pa.array([0], pa.int64())})
        # gather w = N+(u) for each edge (u,v): flat index construction
        offs = np.concatenate([[0], np.cumsum(counts)])
        flat_idx = np.repeat(starts - offs[:-1], counts) + np.arange(int(counts.sum()))
        w = nbrs[flat_idx]
        vv = np.repeat(bv, counts)
        probe = vv * M + w
        pos = np.searchsorted(codes_, probe)
        hit = (pos < len(codes_)) & (codes_[np.minimum(pos, len(codes_) - 1)] == probe)
        return pa.table({"tri": pa.array([int(hit.sum())], pa.int64())})

    out = edges_ds.map_batches(count, batch_format="pyarrow",
                               batch_size=batch_size, zero_copy_batch=True)
    return int(out.sum("tri") or 0)
