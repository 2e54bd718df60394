"""SALSA (Stochastic Approach for Link-Structure Analysis): the
degree-normalized HITS variant — hubs and authorities as the stationary
distributions of the alternating random walk

    a_k(j) = sum_{i -> j} h_{k-1}(i) / outdeg(i)
    h_k(i) = sum_{i -> j} a_k(j)   / indeg(j)

Runs on a :func:`raylink.graph.build_graph_fwd_rev` pair, reusing the
PageRank scatter (score/degree mass split, pre-aggregated bincount
partials per (src_part -> dst_part) segment) verbatim on the forward CSR
for the authority half-step and on the transpose CSR for the hub
half-step (the transpose's out-degree IS the original in-degree). Fixed
iteration count shared with the unrolled SQL oracle; no normalizer is
needed — each half-step is mass-conserving except for mass entering
degree-0 endpoints, which drops (the classic SALSA restriction to the
link-connected part, mirrored by the oracle's inner joins).

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
from .bsp import init_state, maybe_expand_chunks
from .hits import _make_sum_combine, _zip_states
from .pagerank import _make_scatter


@ray.remote
def _fused_salsa(fwd_view, rev_view, h_tab: pa.Table, max_iter: int):
    from .bsp import fused_superstep

    sc_f, sc_r = _make_scatter(fwd_view), _make_scatter(rev_view)
    cb_f, cb_r = _make_sum_combine(fwd_view), _make_sum_combine(rev_view)
    a_tab = None
    metrics = []
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        a_tab = fused_superstep(h_tab.select(["part", "vec"]), sc_f, cb_f)
        h_tab = fused_superstep(a_tab.select(["part", "vec"]), sc_r, cb_r)
        metrics.append({"iter": it, "fused": True,
                        "sec": time.perf_counter() - t0})
    return (h_tab.select(["part", "vec"]), a_tab.select(["part", "vec"]),
            metrics)


def salsa(gf: Graph, gr: Graph, *, max_iter: int = 5,
          fused: bool | None = None,
          metrics_out: list | None = None) -> rd.Dataset:
    """Per-vertex Dataset (vid, hub, auth) after exactly ``max_iter``
    alternating half-step pairs, h_0 = 1/n."""
    from .bsp import (empty_vertex_result, fused_eligible, graph_view,
                      state_table)

    if gf.P != gr.P or gf.n != gr.n:
        raise ValueError("gf/gr must share the fwd_rev vertex dictionary")
    if max_iter < 1:
        # same contract as hits(): zero iterations has no defined 'auth'
        # state (ADVICE r4 — the actor route would KeyError on it)
        raise ValueError("max_iter must be >= 1")
    if gf.n == 0:
        return empty_vertex_result({"hub": pa.float64(),
                                    "auth": pa.float64()})
    h = init_state(gf, lambda p: np.full(int(gf.n_per_part[p]),
                                         1.0 / gf.n))
    if fused_eligible(gf, fused) and fused_eligible(gr, fused):
        h_tab, a_tab, metrics = ray.get(_fused_salsa.remote(
            graph_view(gf), graph_view(gr), state_table(h), max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        return _zip_states(rd.from_arrow(h_tab), rd.from_arrow(a_tab),
                           gf, 1.0, 1.0)

    from .bsp import ActorEngine, actor_engine_enabled

    if actor_engine_enabled(gf):
        # Alternating degree-normalized half-steps on the persistent
        # multi-view actor pool (round 4) — same closures, views 'f'/'r'.
        eng = ActorEngine({"f": gf, "r": gr})
        eng.load("h", h, "float64")
        for it in range(1, max_iter + 1):
            t0 = time.perf_counter()
            eng.superstep(_make_scatter, _make_sum_combine, view="f",
                          read={"vec": "h"}, write={"vec": "a"},
                          expand=True)
            eng.superstep(_make_scatter, _make_sum_combine, view="r",
                          read={"vec": "a"}, write={"vec": "h"},
                          expand=True)
            if metrics_out is not None:
                metrics_out.append({"iter": it, "engine": "actors",
                                    "sec": time.perf_counter() - t0})
        return _zip_states(eng.dataset("h"), eng.dataset("a"), gf, 1.0, 1.0)

    sc_f, sc_r = _make_scatter(gf), _make_scatter(gr)
    cb_f, cb_r = _make_sum_combine(gf), _make_sum_combine(gr)

    def half(state, graph, scatter, combine):
        return (maybe_expand_chunks(state.select_columns(["part", "vec"]),
                                    graph)
                .map_batches(scatter, batch_format="pyarrow", batch_size=1,
                             zero_copy_batch=True)
                .groupby("dst_part")
                .map_groups(combine, batch_format="pyarrow")
                .materialize())

    a = None
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        a = half(h, gf, sc_f, cb_f)
        h = half(a, gr, sc_r, cb_r)
        if metrics_out is not None:
            metrics_out.append({"iter": it, "fused": False,
                                "sec": time.perf_counter() - t0})
    return _zip_states(h, a, gf, 1.0, 1.0)
