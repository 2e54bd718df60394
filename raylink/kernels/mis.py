"""Maximal independent set — Luby-style BSP with deterministic priorities.

Each vertex gets a fixed priority derived arithmetically from its integer
KEY (not its vid), so an unrolled SQL oracle can compute the identical
sequence: pi(v) = (key*48271 + 12345) mod 2147483647, totally ordered as
combined(v) = (pi+1)*2^31 + key (injective for keys < 2^31).

One min-scatter per round (the BFS/SSSP physical shape — per-(src_part ->
dst_part) min pre-aggregation bounds any hub's fan-in to P rows):

- an IN vertex scatters sentinel 0,
- an undecided vertex scatters combined(v),
- an OUT vertex scatters nothing (encoded INF, dropped by the min filter).

An undecided vertex v with min incoming m then decides:
  m == 0             -> OUT  (an IN neighbor claimed it)
  no incoming, or
  combined(v) < m    -> IN   (local priority minimum among live neighbors)
  otherwise          -> stays undecided.

No two adjacent vertices can both be IN (the smaller combined blocks the
larger; an existing IN neighbor scatters 0 which blocks everything), and
every vertex is eventually decided, so the fixpoint is a maximal
independent set. Deterministic arithmetic priorities converge in O(log n)
rounds on typical graphs but O(chain length) worst-case (an adversarially
ordered path) — ``max_iter`` caps rounds for fixed-unroll SQL-oracle
parity (extra rounds past the fixpoint are no-ops).

Reference parity: iterative gated refinement with carried integer state
(peak_detect_v4.py:987-1167) redesigned order-independent per SURVEY
§2.10/§7.0; greedy conflict-free selection mirrors the reference's
"keep-best non-overlapping detection" gates (peak_detect_v4.py:235-368).

State encoding (one int64 per vertex): 0 = IN, INF = OUT, otherwise the
vertex is undecided and the value IS its combined priority.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph
from .bsp import (
    maybe_expand_chunks,
    state_to_vertex_table,
    sum_columns,
    vertex_table_to_state,
)
from .traversal import _min_scatter

_INF = np.int64(1 << 62)
_P_MOD = np.int64(2147483647)
_KEY_CAP = np.int64(1) << 31


def _combined(keys: np.ndarray) -> np.ndarray:
    keys = keys.astype(np.int64, copy=False)
    if len(keys) and (keys.min() < 0 or keys.max() >= _KEY_CAP):
        raise ValueError(
            "MIS priorities require integer keys in [0, 2^31) so the "
            "combined (priority, key) order fits one int64 on both the "
            "engine and the SQL-oracle side")
    pi = (keys * np.int64(48271) + np.int64(12345)) % _P_MOD
    return (pi + 1) * (np.int64(1) << 31) + keys


def _mis_combine(graph: Graph):
    n_per_part = graph.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        idx_col = group["idx"].combine_chunks()
        lab_col = group["lab"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        lab_flat = lab_col.flatten().to_numpy(zero_copy_only=False)
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        prev = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        inc = np.full(len(prev), _INF, dtype=np.int64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            np.minimum.at(inc, idx, lab)
        und = (prev != 0) & (prev < _INF)
        new = prev.copy()
        out_m = und & (inc == 0)
        in_m = und & ~out_m & (prev < inc)
        new[out_m] = _INF
        new[in_m] = 0
        changed = int(out_m.sum() + in_m.sum())
        assert len(prev) == int(n_per_part[part])
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return combine


@ray.remote
def _fused_mis_loop(view, state_tab: pa.Table, max_iter: int):
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _min_scatter(view, plus_one=False)
    combine = _mis_combine(view)
    metrics = []
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        state_tab = fused_superstep(state_tab, scatter, combine)
        changed = int(table_scalar_sums(state_tab, ["changed"])["changed"])
        metrics.append({"iter": it, "changed": changed, "fused": True,
                        "sec": time.perf_counter() - t0})
        if changed == 0:
            break
    return state_tab.select(["part", "vec"]), metrics


def maximal_independent_set(graph: Graph, *, max_iter: int = 64,
                            metrics_out: list | None = None,
                            fused: bool | None = None,
                            checkpoint_dir: str | None = None
                            ) -> rd.Dataset:
    """(vid, in_mis) over a SYMMETRIC build: in_mis = 1 iff the vertex is
    in the deterministic maximal independent set after ``max_iter`` rounds
    (earlier if the fixpoint hits; vertices still undecided at the cap —
    possible only when the cap cuts convergence short — report 0, exactly
    like the fixed-unroll SQL oracle). ``checkpoint_dir``: durable rounds
    + resume via the shared actor_int_loop store hook."""
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"in_mis": pa.int64()})
    if not pa.types.is_integer(graph.key_type):
        raise TypeError("maximal_independent_set requires integer vertex "
                        "keys (priorities are arithmetic in the key)")

    def enc_f(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vid": batch["vid"],
            "enc": pa.array(_combined(keys), pa.int64()),
        })

    vt = graph.vertices.map_batches(enc_f, batch_format="pyarrow")
    state = vertex_table_to_state(vt, graph, "enc", pa.int64()).materialize()
    store = None
    start_iter = 0
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        store = CheckpointStore(checkpoint_dir, "mis",
                                graph_fingerprint(graph), {})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('mis', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    from .bsp import actor_engine_enabled, actor_int_loop

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_mis_loop.remote(
            graph_view(graph), state_table(state), max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        state = rd.from_arrow(final_tab)
    elif actor_engine_enabled(graph):
        tab, _ = actor_int_loop(
            graph, state, lambda v: _min_scatter(v, plus_one=False),
            _mis_combine, max_iter=max_iter, metrics_out=metrics_out,
            store=store, start_iter=start_iter)
        state = rd.from_arrow(tab)
    else:
        scatter = _min_scatter(graph, plus_one=False)
        combine = _mis_combine(graph)
        for it in range(start_iter + 1, max_iter + 1):
            t0 = time.perf_counter()
            state = (
                maybe_expand_chunks(state, graph)
                .map_batches(scatter, batch_format="pyarrow", batch_size=1,
                             zero_copy_batch=True)
                .groupby("dst_part")
                .map_groups(combine, batch_format="pyarrow")
                .materialize()
            )
            changed = int(sum_columns(state, ["changed"])["changed"])
            metrics = {"iter": it, "changed": changed,
                       "sec": time.perf_counter() - t0}
            if metrics_out is not None:
                metrics_out.append(metrics)
            if store is not None:
                store.save(it, state.select_columns(["part", "vec"]),
                           metrics)
            if changed == 0:
                break
        state = state.select_columns(["part", "vec"])

    out = state_to_vertex_table(state, graph, "vec", "enc")

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "vid": batch["vid"],
            "in_mis": pc.cast(pc.equal(batch["enc"], 0), pa.int64()),
        })

    return out.map_batches(flag, batch_format="pyarrow")
