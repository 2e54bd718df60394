"""HITS (hubs & authorities) as alternating BSP superstep rounds.

Per iteration (Kleinberg's power iteration, L1-normalized variant — the
normalizer choice rescales every vector identically per step, so hub/auth
*rankings* match the classic L2 formulation while keeping the arithmetic
exactly expressible in the SQL oracle without sqrt):

  1. auth half-step: scatter hub scores (pre-scaled by 1/prev hub sum)
     along OUT-edges of the forward CSR; combine sums per destination in
     deterministic (kind, src_part, sub) order — auth_raw plus a per-part
     partial sum (``s1``) for the next normalizer.
  2. hub half-step: the same scatter/combine over the TRANSPOSE CSR
     (in-edge gather), scaled by 1/auth sum.

Each half-step is ONE Dataset execution with the superstep's single
``groupby(dst_part)`` shuffle (pre-aggregated bincount partials bound any
hub's fan-in to P rows, same skew handling as PageRank). Small graphs run
all iterations fused in one task via the shared bsp machinery.

Runs on a :func:`raylink.graph.build_graph_fwd_rev` pair (both builds share
one vertex dictionary and one pack shuffle).

Reference parity: alternating refit loops with carried state
(porcine/pig_extract.py model refit passes), redesigned order-independent
per SURVEY §2.10/§7.6.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph
from .bsp import (
    actor_engine_enabled as _actor_route,
    init_state,
    iter_chunk_rows,
    maybe_expand_chunks,
    partial_row,
    partials_table,
    sum_columns,
)


def _make_sum_scatter(view, scale: float):
    """Scatter score*scale along the CSR out-edges (bincount partials per
    (src_part -> dst_part) segment; carrier row per part)."""
    refs = view.blocks
    P = view.P
    s = float(scale)

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, sub, scores in iter_chunk_rows(batch):
            if sub < 0:
                rows.append(partial_row(part, -1, -1, 1, vec=scores))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue
            blk = _ray.get(chunks[sub])
            vals = (scores * s)[blk.src_local]
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg_dst = blk.dst_local[lo:hi]
                acc = np.bincount(seg_dst, weights=vals[lo:hi])
                nz = np.flatnonzero(acc)
                rows.append(partial_row(q, part, sub, 0,
                                        idx=nz.astype(np.int32), vec=acc[nz]))
        return partials_table(rows)

    return scatter


def _make_sum_combine(view):
    """Sum partials per destination partition (deterministic order) ->
    (part, vec=raw sums, s1=partial L1 normalizer)."""
    n_per_part = view.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group.select(["kind", "src_part", "sub"]),
            sort_keys=[("kind", "ascending"), ("src_part", "ascending"),
                       ("sub", "ascending")],
        )
        g = group.take(order)
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(g["dst_part"][prev_i].as_py())
        n_q = int(n_per_part[part])
        idx_col = g["idx"].combine_chunks()
        vec_col = g["vec"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        vec_flat = vec_col.flatten().to_numpy(zero_copy_only=False)
        vec_offs = vec_col.offsets.to_numpy(zero_copy_only=False)
        acc = np.zeros(n_q, dtype=np.float64)
        for i in range(g.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            val = vec_flat[vec_offs[i]: vec_offs[i + 1]]
            np.add.at(acc, idx, val)
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([acc], pa.list_(pa.float64())),
            "s1": pa.array([float(acc.sum())], pa.float64()),
        })

    return combine


def _half_step(state: rd.Dataset, graph: Graph, scale: float) -> tuple[rd.Dataset, float]:
    new_state = (
        maybe_expand_chunks(state, graph)
        .map_batches(_make_sum_scatter(graph, scale), batch_format="pyarrow",
                     batch_size=1, zero_copy_batch=True)
        .groupby("dst_part")
        .map_groups(_make_sum_combine(graph), batch_format="pyarrow")
        .materialize()
    )
    return new_state, float(sum_columns(new_state, ["s1"])["s1"])


def _zip_states(hub_state: rd.Dataset, auth_state: rd.Dataset, graph: Graph,
                hub_scale: float, auth_scale: float) -> rd.Dataset:
    """Merge the two P-row (part, vec) states into per-vertex rows
    (vid, hub, auth) without gathering vertex data anywhere: a P-row join
    on ``part`` (each row carries its partition's vector), then one
    vectorized expansion."""
    P = graph.P
    hs, as_ = float(hub_scale), float(auth_scale)

    def tag(which: int):
        def f(batch: pa.Table) -> pa.Table:
            b = batch.select(["part", "vec"])
            return b.append_column(
                "which", pa.array(np.full(b.num_rows, which, np.int64)))
        return f

    both = hub_state.map_batches(tag(0), batch_format="pyarrow").union(
        auth_state.map_batches(tag(1), batch_format="pyarrow"))

    def merge(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        which = group["which"].to_numpy(zero_copy_only=False)
        vec = group["vec"].combine_chunks()
        flat = vec.flatten().to_numpy(zero_copy_only=False)
        offs = vec.offsets.to_numpy(zero_copy_only=False)
        hi = int(np.flatnonzero(which == 0)[0])
        ai = int(np.flatnonzero(which == 1)[0])
        h = flat[offs[hi]: offs[hi + 1]]
        a = flat[offs[ai]: offs[ai + 1]]
        vids = np.arange(len(h), dtype=np.int64) * P + part
        return pa.table({"vid": pa.array(vids),
                         "hub": pa.array(h * hs),
                         "auth": pa.array(a * as_)})

    return both.groupby("part").map_groups(merge, batch_format="pyarrow")


@ray.remote
def _fused_hits(fwd_view, rev_view, hub_tab: pa.Table, max_iter: int):
    """All HITS iterations in one task — same closures, in-memory groups."""
    from .bsp import fused_superstep, table_scalar_sums

    combine_fwd = _make_sum_combine(fwd_view)
    combine_rev = _make_sum_combine(rev_view)
    hub_norm = 1.0
    auth_tab, auth_norm = None, 1.0
    metrics = []
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        auth_tab = fused_superstep(
            hub_tab, _make_sum_scatter(fwd_view, 1.0 / hub_norm), combine_fwd)
        auth_norm = float(table_scalar_sums(auth_tab, ["s1"])["s1"]) or 1.0
        hub_tab = fused_superstep(
            auth_tab, _make_sum_scatter(rev_view, 1.0 / auth_norm), combine_rev)
        hub_norm = float(table_scalar_sums(hub_tab, ["s1"])["s1"]) or 1.0
        metrics.append({"iter": it, "hub_norm": hub_norm,
                        "auth_norm": auth_norm, "fused": True,
                        "sec": time.perf_counter() - t0})
    return (hub_tab.select(["part", "vec"]), hub_norm,
            auth_tab.select(["part", "vec"]), auth_norm, metrics)


def _actor_hits(gf: Graph, gr: Graph, hub0, max_iter: int,
                metrics_out: list | None):
    """Alternating half-steps on the persistent multi-view actor pool
    (round 4): the SAME scatter/combine closures, view 'f' for the auth
    half-step and view 'r' for the hub half-step — no Dataset launch
    floor per half-step. Normalizer sums reduce part-ascending (the
    Dataset path's group order), so scores match to float addition
    order (1e-12 parity test)."""
    from .bsp import ActorEngine

    eng = ActorEngine({"f": gf, "r": gr})
    eng.load("hub", hub0, "float64")
    hub_norm, auth_norm = 1.0, 1.0
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        s1 = eng.superstep(
            lambda v, s=1.0 / hub_norm: _make_sum_scatter(v, s),
            _make_sum_combine, view="f", read={"vec": "hub"},
            write={"vec": "auth"}, scalar_cols=("s1",), expand=True)[0]
        auth_norm = s1 or 1.0
        s1 = eng.superstep(
            lambda v, s=1.0 / auth_norm: _make_sum_scatter(v, s),
            _make_sum_combine, view="r", read={"vec": "auth"},
            write={"vec": "hub"}, scalar_cols=("s1",), expand=True)[0]
        hub_norm = s1 or 1.0
        if metrics_out is not None:
            metrics_out.append({"iter": it, "hub_norm": hub_norm,
                                "auth_norm": auth_norm, "engine": "actors",
                                "sec": time.perf_counter() - t0})
    return eng.dataset("hub"), hub_norm, eng.dataset("auth"), auth_norm


def hits(graph_fwd: Graph, graph_rev: Graph, *, max_iter: int = 20,
         metrics_out: list | None = None,
         fused: bool | None = None) -> rd.Dataset:
    """Per-vertex Dataset (vid, hub, auth) after ``max_iter`` alternating
    L1-normalized power iterations. ``graph_fwd``/``graph_rev`` come from
    :func:`raylink.graph.build_graph_fwd_rev` (shared dictionary)."""
    if graph_fwd.n != graph_rev.n or graph_fwd.P != graph_rev.P:
        raise ValueError("fwd/rev graphs must share the vertex dictionary")
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    if graph_fwd.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"hub": pa.float64(),
                                    "auth": pa.float64()})
    g = graph_fwd
    hub = init_state(g, lambda p: np.full(int(g.n_per_part[p]), 1.0 / g.n))

    from .bsp import fused_eligible, graph_view, state_table

    if fused_eligible(graph_fwd, fused) and fused_eligible(graph_rev,
                                                           fused):
        hub_tab, hub_norm, auth_tab, auth_norm, metrics = ray.get(
            _fused_hits.remote(graph_view(graph_fwd), graph_view(graph_rev),
                               state_table(hub), max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        hub_state = rd.from_arrow(hub_tab)
        auth_state = rd.from_arrow(auth_tab)
    elif _actor_route(graph_fwd):
        hub_state, hub_norm, auth_state, auth_norm = _actor_hits(
            graph_fwd, graph_rev, hub, max_iter, metrics_out)
    else:
        hub_norm = 1.0
        auth_state, auth_norm = None, 1.0
        hub_state = hub
        for it in range(1, max_iter + 1):
            t0 = time.perf_counter()
            auth_state, auth_norm = _half_step(hub_state, graph_fwd,
                                               1.0 / hub_norm)
            auth_norm = auth_norm or 1.0
            hub_state, hub_norm = _half_step(auth_state, graph_rev,
                                             1.0 / auth_norm)
            hub_norm = hub_norm or 1.0
            if metrics_out is not None:
                metrics_out.append({"iter": it, "hub_norm": hub_norm,
                                    "auth_norm": auth_norm,
                                    "sec": time.perf_counter() - t0})

    return _zip_states(hub_state, auth_state, g,
                       1.0 / hub_norm, 1.0 / auth_norm)
