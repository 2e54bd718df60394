"""k-truss decomposition by iterative support peeling.

The k-truss is the maximal subgraph where every edge sits in >= k-2
triangles — the standard "cohesive web community" refinement of k-core.
Reference parity: the iterated keep-if-supported gate mirrors the
reference's repeated threshold-and-reextract passes
(peak_detect_v4.py:1733-1746) made order-independent.

Round shape (all Dataset-level, no driver edge state): compute per-edge
support with the bucketed center-carrying wedge join
(:func:`..kernels.edge_support`), filter ``support >= k-2``, and — if any
edge dropped — rebuild via :func:`..graph.subgraph_same_vids` for the
next round: the survivors keep their vids and partition geometry, so the
rebuild is ONE pack+groupby shuffle with no dictionary encode and no
remap join-back (round 2 of this repo cut the per-round cost from
2-shuffle build + 2 key joins down to 1 shuffle + the wedge join's 2
bucketed exchanges). The driver carries only the per-round edge count.

``max_rounds`` bounds rounds for fixed-unroll SQL-oracle parity: running
exactly R rounds and stopping early at the fixpoint produce identical
output, because a converged round's filter is a no-op and support values
over identical edge sets are identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..graph import Graph
from .triangles import edge_support

_TRUSS_SCHEMA = pa.schema([
    pa.field("src_vid", pa.int64()),
    pa.field("dst_vid", pa.int64()),
    pa.field("support", pa.int64()),
])


def k_truss(graph: Graph, k: int, *, max_rounds: int = 30,
            metrics_out: list | None = None) -> rd.Dataset:
    """Edges of the k-truss of a SYMMETRIC build: rows (src_vid, dst_vid,
    support), canonical src_vid < dst_vid in the ORIGINAL graph's vid
    space, ``support`` = the edge's triangle support in the last computed
    peel round (equals its support within the truss at the fixpoint).
    ``k >= 3``; peeling drops edges with support < k-2 each round."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3 (k=2 is every edge)")
    from ..graph import subgraph_same_vids

    thr = k - 2
    g = graph
    out = rd.from_arrow(_TRUSS_SCHEMA.empty_table())
    n_edges = graph.m // 2
    for rnd in range(max_rounds):
        if n_edges == 0:
            return rd.from_arrow(_TRUSS_SCHEMA.empty_table())
        sup = edge_support(g)  # vids are stable across rebuilds

        def keep(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(b["support"], pa.scalar(thr)))

        out = sup.map_batches(keep, batch_format="pyarrow").materialize()
        survived = out.count()
        if metrics_out is not None:
            metrics_out.append({"round": rnd, "edges_in": n_edges,
                                "edges_out": survived})
        if survived == n_edges or survived == 0:
            break
        n_edges = survived
        g = subgraph_same_vids(graph, out)
    return out
