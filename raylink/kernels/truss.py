"""k-truss decomposition by iterative support peeling.

The k-truss is the maximal subgraph where every edge sits in >= k-2
triangles — the standard "cohesive web community" refinement of k-core.
Reference parity: the iterated keep-if-supported gate mirrors the
reference's repeated threshold-and-reextract passes
(peak_detect_v4.py:1733-1746) made order-independent.

Round shape (all Dataset-level, no driver edge state): compute per-edge
support with the bucketed center-carrying wedge join
(:func:`..kernels.edge_support`), filter ``support >= k-2``, and — if any
edge dropped — REBUILD the graph from the surviving canonical edge list
(original-vid pairs fed back through ``build_graph`` with int vids as
keys) for the next round. The driver carries only the per-round edge
count. Per-round cost = one graph build (2 shuffles) + one wedge join
(2 bucketed exchanges) + the vid join-back; a long-lived production
variant would maintain a mutable adjacency index actor instead of
rebuilding, but peeling converges in few rounds on web-shaped graphs and
each round streams.

``max_rounds`` bounds rounds for fixed-unroll SQL-oracle parity: running
exactly R rounds and stopping early at the fixpoint produce identical
output, because a converged round's filter is a no-op and support values
over identical edge sets are identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..graph import Graph, build_graph
from .triangles import edge_support

_TRUSS_SCHEMA = pa.schema([
    pa.field("src_vid", pa.int64()),
    pa.field("dst_vid", pa.int64()),
    pa.field("support", pa.int64()),
])


def _support_in_original_vids(g: Graph, remap: bool) -> rd.Dataset:
    """edge_support rows mapped back to ORIGINAL vid space. ``remap`` is
    False for the round-0 graph (vids already original); True for rebuilt
    graphs, whose vertex KEYS are the original vids."""
    from ..pipelines.flagship import join_keys

    sup = edge_support(g)
    if not remap:
        return sup
    a = join_keys(sup.map_batches(
        lambda b: b.rename_columns(["vid", "dst_vid", "support"]),
        batch_format="pyarrow"), g, ["dst_vid", "support"])
    ab = join_keys(a.map_batches(
        lambda b: b.select(["dst_vid", "key", "support"]).rename_columns(
            ["vid", "key_a", "support"]),
        batch_format="pyarrow"), g, ["key_a", "support"])

    def canon(b: pa.Table) -> pa.Table:
        ka = pc.cast(b["key_a"], pa.int64())
        kb = pc.cast(b["key"], pa.int64())
        return pa.table({
            "src_vid": pc.min_element_wise(ka, kb),
            "dst_vid": pc.max_element_wise(ka, kb),
            "support": b["support"],
        }, schema=_TRUSS_SCHEMA)

    return ab.map_batches(canon, batch_format="pyarrow")


def k_truss(graph: Graph, k: int, *, max_rounds: int = 30,
            metrics_out: list | None = None) -> rd.Dataset:
    """Edges of the k-truss of a SYMMETRIC build: rows (src_vid, dst_vid,
    support), canonical src_vid < dst_vid in the ORIGINAL graph's vid
    space, ``support`` = the edge's triangle support in the last computed
    peel round (equals its support within the truss at the fixpoint).
    ``k >= 3``; peeling drops edges with support < k-2 each round."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3 (k=2 is every edge)")
    thr = k - 2
    g = graph
    remap = False
    out = rd.from_arrow(_TRUSS_SCHEMA.empty_table())
    n_edges = graph.m // 2
    for rnd in range(max_rounds):
        if n_edges == 0:
            return rd.from_arrow(_TRUSS_SCHEMA.empty_table())
        sup = _support_in_original_vids(g, remap)

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
        g = build_graph(
            out.map_batches(
                lambda b: b.select(["src_vid", "dst_vid"]).rename_columns(
                    ["src", "dst"]),
                batch_format="pyarrow"),
            P=graph.P, symmetric=True, already_deduped=True)
        remap = True
    return out
