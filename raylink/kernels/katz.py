"""Katz centrality: damped path counting as BSP supersteps, on the exact
INTEGER lattice.

For alpha = 1/A (A integer) and beta = 1, the iterate
x_k(v) = 1 + (1/A) * sum_{u -> v} x_{k-1}(u) scaled by A^k is integral:

    y_k(v) = A^k + sum_{u -> v} y_{k-1}(u),     y_0 = 1,
    x_k(v) = y_k(v) / A^k.

Integer sums are order-free, so the kernel is bit-reproducible and the SQL
oracle (unrolled CTE over the same integer recurrence) matches exactly —
the float formulation drifted 1 ULP at 1e9 fixed point from summation
order, the same reason PageRank's cents trick exists (SURVEY §7.6).

Scatter ships per-(src_part -> dst_part) int64 bincount partials (<= P
rows per hub, same skew bound as PageRank); fixed iteration count shared
with the oracle; int64 overflow is checked per combine and raises (pick a
larger A or fewer iterations — Katz requires alpha < 1/lambda_max anyway).

Reference parity: damped iterative refit with carried state (SURVEY
§2.10/§7.6 gated loops), redesigned order-independent.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph
from .bsp import (
    init_state,
    iter_state_rows,
    partial_row,
    partials_table,
    state_to_vertex_table,
)

_I64_GUARD = np.int64(1) << 62


def _check_wrap(acc: np.ndarray, idx: np.ndarray, valsf: np.ndarray,
                base: float = 0.0) -> None:
    """Detect silent int64 wraparound in an integer accumulation via a
    float64 shadow sum: a wrap shifts the result by ~2^64, while legit
    float rounding error is <= fanin * 2^-52 relative — orders of
    magnitude inside the 1e-6 tolerance. Catches accumulations (and the
    y*w products feeding them) that wrap past 2^63 and land back UNDER
    the post-hoc 2^62 guard (advisor r2, katz.py)."""
    accf = np.full(len(acc), base, np.float64)
    np.add.at(accf, idx, valsf)
    if np.any(np.abs(acc - accf) > 1e-6 * np.abs(accf) + 4.0):
        raise OverflowError(
            "Katz integer lattice overflow (int64 wraparound detected): "
            "raise alpha_inv or lower max_iter")


def _int_sum_scatter(view):
    refs = view.blocks
    P = view.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, y in iter_state_rows(batch, "vec"):
            y = y.astype(np.int64, copy=False)
            rows.append(partial_row(part, -1, -1, 1, lab=y))
            for sub, ref in enumerate(refs.get(part, [])):
                blk = _ray.get(ref)
                if blk.w is not None:
                    # multiplicity weights stay on the integer lattice;
                    # float weight_col builds would break exactness
                    if not np.issubdtype(blk.w.dtype, np.integer):
                        raise TypeError(
                            "katz requires integer edge weights "
                            "(multiplicity builds); float weight_col "
                            "graphs are not supported")
                    vals = y[blk.src_local] * blk.w
                    valsf = y[blk.src_local].astype(np.float64) * blk.w
                else:
                    vals = y[blk.src_local]
                    valsf = vals.astype(np.float64)
                for q in range(P):
                    lo, hi = blk.bounds[q], blk.bounds[q + 1]
                    if hi <= lo:
                        continue
                    seg_dst = blk.dst_local[lo:hi]
                    acc = np.zeros(int(seg_dst.max()) + 1, np.int64)
                    np.add.at(acc, seg_dst, vals[lo:hi])
                    _check_wrap(acc, seg_dst, valsf[lo:hi])
                    nz = np.flatnonzero(acc)
                    if len(nz):
                        rows.append(partial_row(q, part, sub, 0,
                                                idx=nz.astype(np.int32),
                                                lab=acc[nz]))
        return partials_table(rows)

    return scatter


def _int_sum_combine(beta_k: int):
    bk = np.int64(beta_k)

    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        lab_col = group["lab"].combine_chunks()
        lab_flat = lab_col.flatten().to_numpy(zero_copy_only=False)
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        idx_col = group["idx"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        n_q = int(lab_offs[prev_i + 1] - lab_offs[prev_i])
        acc = np.full(n_q, bk, np.int64)
        accf = np.full(n_q, float(bk), np.float64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            acc[idx] += lab
            accf[idx] += lab.astype(np.float64)
        if n_q and np.any(np.abs(acc - accf) > 1e-6 * np.abs(accf) + 4.0):
            raise OverflowError(
                "Katz integer lattice overflow (int64 wraparound detected): "
                "raise alpha_inv or lower max_iter")
        if len(acc) and int(acc.max()) > int(_I64_GUARD):
            raise OverflowError(
                "Katz integer lattice overflow: raise alpha_inv or lower "
                "max_iter (alpha must stay below 1/lambda_max)")
        return pa.table({"part": pa.array([part], pa.int64()),
                         "vec": pa.array([acc], pa.list_(pa.int64()))})

    return combine


@ray.remote
def _fused_katz(view, state_tab: pa.Table, alpha_inv: int, max_iter: int):
    from .bsp import fused_superstep

    scatter = _int_sum_scatter(view)
    metrics = []
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        state_tab = fused_superstep(state_tab, scatter,
                                    _int_sum_combine(alpha_inv ** it))
        metrics.append({"iter": it, "fused": True,
                        "sec": time.perf_counter() - t0})
    return state_tab.select(["part", "vec"]), metrics


def katz(graph: Graph, *, alpha_inv: int = 100, max_iter: int = 5,
         fused: bool | None = None, checkpoint_dir: str | None = None,
         metrics_out: list | None = None) -> rd.Dataset:
    """Per-vertex Dataset (vid, katz float64 = y_K / alpha_inv**K) after
    exactly ``max_iter`` supersteps with alpha = 1/alpha_inv, beta = 1.
    The division is the ONLY float op, applied once per vertex at the end
    — every upstream sum is exact int64.

    ``checkpoint_dir``: durable runs — per-partition int64 y state saved
    through CheckpointStore (actors write their own files on the actor
    engine, same as pagerank/cc/labelprop); resume replays from the
    latest committed superstep. The y recurrence multiplies by absolute
    ``alpha_inv ** it``, so a resumed iterate is bit-equal to a fresh
    one."""
    from .bsp import (empty_vertex_result, fused_eligible, graph_view,
                      state_table)

    if graph.n == 0:
        return empty_vertex_result({"katz": pa.float64()})
    state = init_state(graph, lambda p: np.ones(int(graph.n_per_part[p]),
                                                np.int64),
                       dtype=pa.int64())
    store = None
    start_iter = 0
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        # max_iter deliberately NOT in the params: a truncated run
        # resumes into a longer one (same recurrence, absolute iters)
        store = CheckpointStore(checkpoint_dir, "katz",
                                graph_fingerprint(graph),
                                {"alpha_inv": alpha_inv})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound("katz", start_iter, max_iter)
            if start_iter == max_iter:
                # y_max_iter is already on the requested horizon
                final = state
                yvt = state_to_vertex_table(final, graph, "vec", "y")
                return _katz_finish(yvt, alpha_inv, max_iter)
    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_katz.remote(
            graph_view(graph), state_table(state), alpha_inv, max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        final = rd.from_arrow(final_tab)
    else:
        import os as _os

        from .bsp import actor_eligible

        if (actor_eligible(graph) and _os.environ.get(
                "RAYLINK_BSP_ENGINE", "actors") == "actors"):
            # actor-BSP engine (round 3): same closures, exact integers
            # -> bit-equal; plain state rows (this scatter walks CSR
            # chunks internally), no convergence scalars (fixed K)
            from .bsp import (actor_checkpoint, actor_state_table,
                              actor_superstep, checkpoint_interval,
                              start_bsp_actors)

            actors, parts_of = start_bsp_actors(
                graph, state, _int_sum_scatter, None, dtype="int64",
                scalar_cols=(), plain_state=True)
            every = checkpoint_interval()
            for it in range(start_iter + 1, max_iter + 1):
                t0 = time.perf_counter()
                actor_superstep(
                    actors, parts_of,
                    lambda view, _k=alpha_inv ** it: _int_sum_combine(_k),
                    scalar_cols=())
                metrics = {"iter": it, "engine": "actors",
                           "sec": time.perf_counter() - t0}
                if metrics_out is not None:
                    metrics_out.append(metrics)
                if store is not None and (it == max_iter
                                          or it % every == 0):
                    actor_checkpoint(actors, store, it, metrics)
            final = rd.from_arrow(actor_state_table(actors))
        else:
            scatter = _int_sum_scatter(graph)
            for it in range(start_iter + 1, max_iter + 1):
                t0 = time.perf_counter()
                state = (state.map_batches(scatter, batch_format="pyarrow",
                                           batch_size=1,
                                           zero_copy_batch=True)
                         .groupby("dst_part")
                         .map_groups(_int_sum_combine(alpha_inv ** it),
                                     batch_format="pyarrow")
                         .materialize())
                metrics = {"iter": it, "fused": False,
                           "sec": time.perf_counter() - t0}
                if metrics_out is not None:
                    metrics_out.append(metrics)
                if store is not None:
                    store.save(it, state.select_columns(["part", "vec"]),
                               metrics)
            final = state
    yvt = state_to_vertex_table(final, graph, "vec", "y")
    return _katz_finish(yvt, alpha_inv, max_iter)


def _katz_finish(yvt: rd.Dataset, alpha_inv: int,
                 max_iter: int) -> rd.Dataset:
    p = float(alpha_inv ** max_iter)

    def to_float(batch: pa.Table) -> pa.Table:
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"vid": batch["vid"],
                         "katz": pa.array(y / p, pa.float64())})

    return yvt.map_batches(to_float, batch_format="pyarrow")
