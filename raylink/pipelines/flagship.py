"""The flagship end-to-end pipeline (SURVEY §7.1 + §7.2):

    pages parquet
      -> ExtractorPool (actor pool, html -> text+links, html dropped early)
      -> explode to edges(src, dst)
      -> dedup + vertex dictionary + partitioned CSR blocks
      -> PageRank to convergence, connected components, label propagation,
         triangle count
      -> per-vertex results joined back to urls

Every stage streams; only P-row state tables and scalars ever sit on the
driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

import ray
import ray.data as rd

from ..extract import docs_to_edges, pages_to_docs
from ..graph import Graph, build_graph_pair, prepare_edges
from ..kernels import connected_components, label_propagation, pagerank, triangle_count


@dataclass
class FlagshipResult:
    docs: rd.Dataset
    graph: Graph
    sym_graph: Graph
    ranks: rd.Dataset  # (vid, score)
    comps: rd.Dataset  # (vid, comp)
    labels: rd.Dataset  # (vid, label)
    triangles: int
    metrics: dict = field(default_factory=dict)

    def ranks_by_url(self) -> rd.Dataset:
        """(key, score): ranks joined back to the vertex dictionary via the
        broadcast dict (vid -> key is a dense local lookup, no shuffle)."""
        return join_keys(self.ranks, self.graph, "score")


def join_keys(vertex_table: rd.Dataset, graph: Graph, value_col, *,
              broadcast_max_vertices: int = 4_000_000) -> rd.Dataset:
    """(vid, value...) -> (key, value...). ``value_col``: one column name or
    a list of them (e.g. HITS' hub+auth). Below ``broadcast_max_vertices``
    the vertex dictionary is broadcast once (sorted-vid array + vectorized
    searchsorted); above it the join runs CO-PARTITIONED by
    ``part = vid % P`` (one shuffle, no vertex-proportional broadcast —
    the same auto-threshold policy as the encode side)."""
    import numpy as np

    cols = [value_col] if isinstance(value_col, str) else list(value_col)

    if graph.n <= broadcast_max_vertices:
        vert = pa.concat_tables(
            list(graph.vertices.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 20))
        )
        vids_np = vert["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vids_np, kind="stable")
        keys_sorted = vert["key"].combine_chunks().take(pa.array(order))
        ref = ray.put((vids_np[order], keys_sorted))

        def lookup(batch: pa.Table) -> pa.Table:
            vids, keys = ray.get(ref)
            bv = batch["vid"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(vids, bv)
            out = {"key": keys.take(pa.array(pos))}
            out.update({c: batch[c] for c in cols})
            return pa.table(out)

        return vertex_table.map_batches(lookup, batch_format="pyarrow")

    P = graph.P
    val_type = {}
    for f in vertex_table.schema().base_schema:
        if f.name in cols:
            val_type[f.name] = f.type

    def dict_rows(batch: pa.Table) -> pa.Table:
        # (key, vid, part) -> join rows; vids carried, values null
        out = {
            "part": batch["part"], "kind": pa.array(
                np.zeros(batch.num_rows, np.int8), pa.int8()),
            "vid": batch["vid"], "key": batch["key"],
        }
        out.update({c: pa.nulls(batch.num_rows, val_type[c]) for c in cols})
        return pa.table(out)

    def value_rows(batch: pa.Table) -> pa.Table:
        vids = batch["vid"].to_numpy(zero_copy_only=False)
        out = {
            "part": pa.array(vids % P, pa.int64()),
            "kind": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            "vid": batch["vid"],
            "key": pa.nulls(batch.num_rows, graph.key_type),
        }
        out.update({c: batch[c] for c in cols})
        return pa.table(out)

    def join_group(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        di = np.flatnonzero(kinds == 0)
        vi = np.flatnonzero(kinds == 1)
        if len(vi) == 0 or len(di) == 0:
            out = {"key": pa.array([], graph.key_type)}
            out.update({c: pa.array([], val_type[c]) for c in cols})
            return pa.table(out)
        keys = g["key"].combine_chunks().take(pa.array(di))
        dvids = g["vid"].to_numpy(zero_copy_only=False)[di]
        order = np.argsort(dvids, kind="stable")
        keys = keys.take(pa.array(order))
        dvids = dvids[order]
        vvids = g["vid"].to_numpy(zero_copy_only=False)[vi]
        pos = np.searchsorted(dvids, vvids)
        out = {"key": keys.take(pa.array(pos))}
        out.update({c: g[c].combine_chunks().take(pa.array(vi)) for c in cols})
        return pa.table(out)

    d = graph.vertices.map_batches(dict_rows, batch_format="pyarrow")
    v = vertex_table.map_batches(value_rows, batch_format="pyarrow")
    return d.union(v).groupby("part").map_groups(join_group,
                                                batch_format="pyarrow")


def flagship(
    pages: rd.Dataset,
    *,
    P: int = 32,
    damping: float = 0.85,
    tol: float = 1e-6,
    checkpoint_dir: str | None = None,
    extract_concurrency=(2, 8),
    run_lp: bool = True,
    run_triangles: bool = True,
) -> FlagshipResult:
    docs = pages_to_docs(pages, concurrency=extract_concurrency).materialize()
    edges = docs_to_edges(docs)
    prep = prepare_edges(edges, P=P)
    graph, sym = build_graph_pair(prep)  # one shuffle builds both

    pr_metrics: list = []
    ranks = pagerank(graph, damping=damping, tol=tol,
                     checkpoint_dir=checkpoint_dir, metrics_out=pr_metrics)
    cc_metrics: list = []
    comps = connected_components(sym, checkpoint_dir=checkpoint_dir,
                                 metrics_out=cc_metrics)
    labels = label_propagation(sym, checkpoint_dir=checkpoint_dir) if run_lp else None
    tri = triangle_count(sym) if run_triangles else -1

    return FlagshipResult(
        docs=docs, graph=graph, sym_graph=sym, ranks=ranks, comps=comps,
        labels=labels, triangles=tri,
        metrics={
            "n_vertices": graph.n,
            "n_edges": graph.m,
            "pagerank_iters": pr_metrics[-1]["iter"] if pr_metrics else 0,
            "pagerank": pr_metrics,
            "cc": cc_metrics,
        },
    )
