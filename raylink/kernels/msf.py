"""Minimum spanning forest via distributed Boruvka rounds.

Each round, every current component picks its minimum outgoing edge
under the GLOBAL total order (w, min_vid, max_vid) — a total order means
tied weights cannot form pick cycles, so the union of picks is acyclic
and Boruvka's cut-property invariant holds exactly. Components merge by
running the verified CC kernel over the picked component-label edges
(the merge graph is component-sized and at least halves per round:
<= log2(n) rounds).

Physical shape per round over the live edge table (a_vid, b_vid, w, ca,
cb): filter ca != cb -> per-batch lexicographic min combiner (<= one row
per component per batch) -> one groupby(comp) -> distinct picks -> CC
over the pick label edges -> two co-partitioned label joins refresh
ca/cb. No driver-resident structure beyond O(1) scalars; picked edges
accumulate as a Dataset union.

The MSF WEIGHT MULTISET is unique even under ties (matroid exchange),
so the summary (n_edges, total weight, n_components) is well-defined
whichever valid MSF the tie-break selects; the pytest oracle is
sequential Kruskal.

Reference parity: iterative global reduction with carried state and a
shrinking active set (staleness-gated revalidation loop,
peak_detect_v4.py:1733-1746) redesigned order-independent per SURVEY
§2.10/§7.0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..graph import Graph, build_graph, edges_table


def _min_pick_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: each edge is a candidate for BOTH endpoint
    components; keep the lexicographic (w, lo, hi) min per component."""
    a = batch["a_vid"].to_numpy(zero_copy_only=False)
    b = batch["b_vid"].to_numpy(zero_copy_only=False)
    w = batch["w"].to_numpy(zero_copy_only=False)
    ca = batch["ca"].to_numpy(zero_copy_only=False)
    cb = batch["cb"].to_numpy(zero_copy_only=False)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    comp = np.concatenate([ca, cb])
    ww = np.concatenate([w, w])
    lo2 = np.concatenate([lo, lo])
    hi2 = np.concatenate([hi, hi])
    cca = np.concatenate([ca, ca])
    ccb = np.concatenate([cb, cb])
    order = np.lexsort((hi2, lo2, ww, comp))
    comp_s = comp[order]
    first = np.r_[True, comp_s[1:] != comp_s[:-1]]
    sel = order[first]
    return pa.table({
        "comp": pa.array(comp[sel], pa.int64()),
        "w": pa.array(ww[sel], pa.int64()),
        "lo": pa.array(lo2[sel], pa.int64()),
        "hi": pa.array(hi2[sel], pa.int64()),
        "ca": pa.array(cca[sel], pa.int64()),
        "cb": pa.array(ccb[sel], pa.int64()),
    })


def _min_pick_final(g: pd.DataFrame) -> pd.DataFrame:
    i = np.lexsort((g["hi"].to_numpy(), g["lo"].to_numpy(),
                    g["w"].to_numpy()))[0]
    return g.iloc[[i]]


def minimum_spanning_forest(graph: Graph, *, max_rounds: int = 64,
                            metrics_out: list | None = None,
                            P_merge: int = 8,
                            broadcast_max_map: int = 4_000_000):
    """(summary_table, msf_edges) over a SYMMETRIC (optionally weighted
    with INTEGER weights) build: summary is one row (n_msf_edges,
    total_weight, n_components); ``msf_edges`` is a Dataset of
    (lo, hi, w) rows of one valid MSF (deterministic tie-break)."""
    from raylink.ops import hash_join, keep_first
    from raylink.pipelines.flagship import join_keys

    from .cc import connected_components

    def init_cols(batch: pa.Table) -> pa.Table:
        a = batch["src_vid"].to_numpy(zero_copy_only=False)
        b = batch["dst_vid"].to_numpy(zero_copy_only=False)
        keep = a < b  # symmetric build: each undirected edge once
        a, b = a[keep], b[keep]
        if "w" in batch.column_names:
            wf = batch["w"].to_numpy(zero_copy_only=False)[keep]
            if not np.all(wf == np.floor(wf)):
                raise TypeError("minimum_spanning_forest needs integer "
                                "edge weights (same lattice rule as sssp)")
            w = wf.astype(np.int64)
        else:
            w = np.ones(len(a), np.int64)
        return pa.table({
            "a_vid": pa.array(a, pa.int64()),
            "b_vid": pa.array(b, pa.int64()),
            "w": pa.array(w, pa.int64()),
            "ca": pa.array(a, pa.int64()),
            "cb": pa.array(b, pa.int64()),
        })

    edges = edges_table(graph).map_batches(
        init_cols, batch_format="pyarrow").materialize()
    msf_parts: list[rd.Dataset] = []
    n_msf = 0
    total_w = 0

    for r in range(max_rounds):
        live = edges.map_batches(
            lambda t: t.filter(pc.not_equal(t["ca"], t["cb"])),
            batch_format="pyarrow").materialize()
        if live.count() == 0:
            break
        picks = (live.map_batches(_min_pick_partial, batch_format="pyarrow")
                 .groupby("comp")
                 .map_groups(_min_pick_final, batch_format="pandas"))
        sel = keep_first(picks, ["lo", "hi"], ["w"]).materialize()
        sel_edges = sel.select_columns(["lo", "hi", "w"]).materialize()
        n_sel = sel_edges.count()
        w_sel = int(sel_edges.sum("w") or 0)
        n_msf += n_sel
        total_w += w_sel
        msf_parts.append(sel_edges)
        if metrics_out is not None:
            metrics_out.append({"round": r, "picked": n_sel,
                                "weight": w_sel})
        # contract: CC over the picked component-label edges
        merge_edges = sel.map_batches(
            lambda t: pa.table({"src": t["ca"], "dst": t["cb"]}),
            batch_format="pyarrow")
        msg = build_graph(merge_edges, P=P_merge, symmetric=True)
        cmap = join_keys(
            connected_components(msg, init="key"), msg, "comp").materialize()

        # label refresh: the merge map has at most one row per merging
        # component and at least halves each round — broadcast it (sorted
        # arrays + searchsorted, the join_keys auto-threshold policy) when
        # it fits, co-partitioned join only above the threshold
        if cmap.count() <= broadcast_max_map:
            import ray as _ray

            mt = pa.concat_tables(list(cmap.iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)))
            mk = mt["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            mv = mt["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(mk, kind="stable")
            map_ref = _ray.put((mk[o], mv[o]))

            def remap(t: pa.Table) -> pa.Table:
                keys, vals = _ray.get(map_ref)
                for col in ("ca", "cb"):
                    cur = t[col].to_numpy(zero_copy_only=False)
                    pos = np.searchsorted(keys, cur)
                    safe = np.minimum(pos, max(len(keys) - 1, 0))
                    hit = (pos < len(keys)) & (keys[safe] == cur) \
                        if len(keys) else np.zeros(len(cur), bool)
                    new = np.where(hit, vals[safe], cur)
                    t = t.set_column(t.column_names.index(col), col,
                                     pa.array(new, pa.int64()))
                return t

            edges = edges.map_batches(remap, batch_format="pyarrow",
                                      zero_copy_batch=True)
        else:
            def attach(col: str):
                nonlocal edges
                joined = hash_join(edges, cmap, on=col, right_on="key",
                                   how="left", num_partitions=P_merge)

                def fold(t: pa.Table, col=col) -> pa.Table:
                    new = pc.coalesce(t["comp"], t[col])
                    t = t.drop_columns([c for c in ("key", "comp")
                                        if c in t.column_names])
                    return t.set_column(
                        t.column_names.index(col), col, new)

                edges = joined.map_batches(fold, batch_format="pyarrow")

            attach("ca")
            attach("cb")
        edges = edges.materialize()

    summary = pa.table({
        "n_msf_edges": pa.array([n_msf], pa.int64()),
        "total_weight": pa.array([total_w], pa.int64()),
        "n_components": pa.array([graph.n - n_msf], pa.int64()),
    })
    if msf_parts:
        out = msf_parts[0]
        for p in msf_parts[1:]:
            out = out.union(p)
    else:
        out = rd.from_arrow(pa.table({"lo": pa.array([], pa.int64()),
                                      "hi": pa.array([], pa.int64()),
                                      "w": pa.array([], pa.int64())}))
    return summary, out
