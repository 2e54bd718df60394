"""Synchronous label propagation as Ray-Data superstep rounds.

Vote rule (shared verbatim with the oracle, SURVEY §7.6 risk 7): each vertex
tallies the labels of its undirected (deduped) neighbors plus ONE vote for
its own current label; the new label is the most frequent, ties broken by
the smallest label value. Deterministic; capped at ``max_iter`` because
synchronous LP can oscillate on bipartite structures.

Scatter pre-aggregates votes per (src_part -> dst_part) into
(dst_local, label, count) triples (the grouped-count -> argmax pattern of
SURVEY §2.8 "mode"), so label traffic is bounded by distinct
(vertex, label) pairs per partition pair, not raw edges.

Reference parity: grouped mode / most_common aggregation
(porcine/pig_extract.py:1007) lifted to an iterative neighborhood vote.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..checkpoint import CheckpointStore, graph_fingerprint
from ..graph import Graph
from .bsp import init_state, iter_state_rows, partial_row, partials_table, state_to_vertex_table


def _make_scatter(graph: Graph, use_weights: bool = False):
    """``use_weights=True`` (weighted build): each neighbor's vote counts
    its edge weight instead of 1 — vote partials stay pre-aggregated
    (dst_local, label, weight-sum) triples, exact int64."""
    refs = graph.blocks
    P = graph.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        from .bsp import iter_chunk_rows

        rows = []
        for part, sub, labels in iter_chunk_rows(batch, "vec"):
            labels = labels.astype(np.int64, copy=False)
            if sub < 0:
                rows.append(partial_row(part, -1, -1, 1, lab=labels))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue  # plain-row shape on a blockless partition
            blk = _ray.get(chunks[sub])
            vals = labels[blk.src_local]
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                pairs = np.stack([blk.dst_local[lo:hi].astype(np.int64),
                                  vals[lo:hi]], axis=1)
                if use_weights and blk.w is not None:
                    if not np.issubdtype(blk.w.dtype, np.integer):
                        raise TypeError(
                            "weighted LP requires integer edge weights "
                            "(exact int64 vote tallies)")
                    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
                    cnt = np.zeros(len(uniq), dtype=np.int64)
                    np.add.at(cnt, inv, blk.w[lo:hi])
                else:
                    uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
                rows.append(
                    partial_row(q, part, sub, 0,
                                idx=uniq[:, 0].astype(np.int32),
                                lab=uniq[:, 1],
                                cnt=cnt.astype(np.int64))
                )
        return partials_table(rows)

    return scatter


def _list_np(col: pa.ChunkedArray):
    arr = col.combine_chunks()
    return (arr.flatten().to_numpy(zero_copy_only=False),
            arr.offsets.to_numpy(zero_copy_only=False))


def _make_combine(graph: Graph, active_parity: int | None = None):
    """``active_parity``: only partitions with part % 2 == parity update
    this half-step (red/black Gauss-Seidel sweep); inactive partitions
    carry their labels through unchanged (changed = 0). None = all."""
    n_per_part = graph.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        n_q = int(n_per_part[part])
        idx_flat, idx_offs = _list_np(group["idx"])
        lab_flat, lab_offs = _list_np(group["lab"])
        cnt_flat, cnt_offs = _list_np(group["cnt"])
        prev = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        if active_parity is not None and part % 2 != active_parity:
            return pa.table({
                "part": pa.array([part], pa.int64()),
                "vec": pa.array([prev], pa.list_(pa.int64())),
                "changed": pa.array([0], pa.int64()),
            })
        Is, Ls, Cs = [np.arange(n_q, dtype=np.int64)], [prev], [np.ones(n_q, np.int64)]
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            Is.append(idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64))
            Ls.append(lab_flat[lab_offs[i]: lab_offs[i + 1]].astype(np.int64))
            Cs.append(cnt_flat[cnt_offs[i]: cnt_offs[i + 1]].astype(np.int64))
        I = np.concatenate(Is)
        L = np.concatenate(Ls)
        C = np.concatenate(Cs)
        # sum counts per (vertex, label)
        order = np.lexsort((L, I))
        I, L, C = I[order], L[order], C[order]
        boundary = np.r_[True, (I[1:] != I[:-1]) | (L[1:] != L[:-1])]
        starts = np.flatnonzero(boundary)
        Cs2 = np.add.reduceat(C, starts)
        I2, L2 = I[starts], L[starts]
        # per vertex: max count, tiebreak min label
        order2 = np.lexsort((L2, -Cs2, I2))
        I2, L2 = I2[order2], L2[order2]
        firsts = np.flatnonzero(np.r_[True, I2[1:] != I2[:-1]])
        new = prev.copy()
        new[I2[firsts]] = L2[firsts]
        changed = int((new != prev).sum())
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "vec": pa.array([new], pa.list_(pa.int64())),
                "changed": pa.array([changed], pa.int64()),
            }
        )

    return combine


@ray.remote
def _fused_lp(view, state_tab: pa.Table, max_iter: int, start_iter: int,
              method: str, use_weights: bool = False):
    """All LP supersteps in ONE task — same closures, bit-equal output."""
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _make_scatter(view, use_weights)
    if method == "redblack":
        combines = [_make_combine(view, 0), _make_combine(view, 1)]
    else:
        combines = [_make_combine(view)]
    metrics = []
    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.perf_counter()
        changed = 0
        for combine in combines:
            state_tab = fused_superstep(state_tab, scatter, combine)
            changed += int(
                table_scalar_sums(state_tab, ["changed"])["changed"])
        metrics.append({"iter": it, "changed": changed, "fused": True,
                        "sec": time.perf_counter() - t0})
        if changed == 0:
            break
    return state_tab.select(["part", "vec"]), metrics


def _actor_lp(graph, state, max_iter, start_iter, method, weighted,
              metrics_out, store=None):
    """Persistent-actor BSP label propagation (round 3 scaling work):
    each sync round is one actor superstep; redblack runs its two parity
    half-steps as two supersteps per round (the parity combine carries
    off-color partitions through unchanged, exactly as the Dataset
    path). Integer vote reductions — output BIT-EQUAL to the Dataset
    path (see bsp._BSPActor). ``store``: durable runs keep this engine —
    actors write their own partition state files per round (round 5)."""
    from .bsp import (actor_checkpoint, actor_state_table, actor_superstep,
                      checkpoint_interval, start_bsp_actors,
                      stop_bsp_actors)

    def mk_scatter(view, _w=weighted):
        return _make_scatter(view, _w)

    if method == "redblack":
        mk_combines = [lambda view: _make_combine(view, 0),
                       lambda view: _make_combine(view, 1)]
    else:
        mk_combines = [lambda view: _make_combine(view)]

    actors, parts_of = start_bsp_actors(
        graph, state, mk_scatter, None, dtype="int64",
        scalar_cols=("changed",))
    every = checkpoint_interval()
    try:
        for it in range(start_iter + 1, max_iter + 1):
            t0 = time.perf_counter()
            changed = 0
            for mk in mk_combines:
                (c,) = actor_superstep(actors, parts_of, mk,
                                       scalar_cols=("changed",))
                changed += int(c)
            dt = time.perf_counter() - t0
            metrics = {
                "iter": it, "changed": changed, "sec": dt,
                "engine": "actors",
                "edges_per_sec": graph.m / dt if dt > 0 else None,
            }
            if metrics_out is not None:
                metrics_out.append(metrics)
            if store is not None and (changed == 0 or it == max_iter
                                      or it % every == 0):
                actor_checkpoint(actors, store, it, metrics)
            if changed == 0:
                break
        final = actor_state_table(actors)
    finally:
        stop_bsp_actors(actors)
    return state_to_vertex_table(rd.from_arrow(final), graph, "vec",
                                 "label")


def label_propagation(
    graph: Graph,
    *,
    max_iter: int = 20,
    init: str = "vid",
    method: str = "sync",
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    metrics_out: list | None = None,
    fused: bool | None = None,
) -> rd.Dataset:
    """Per-vertex Dataset (vid, label). ``graph`` must be a symmetric build.
    ``init="key"`` starts labels from int64 vertex keys (tiebreak then runs
    over user-facing ids, matching the SQL formulation).

    ``method="sync"``: Jacobi — every vertex votes on the previous round's
    labels (can oscillate on bipartite structures; capped by max_iter).
    ``method="redblack"``: Gauss-Seidel sweep by partition parity — even
    partitions update first, odd partitions see the fresh even labels
    (2 half-steps per round, each half fully parallel across its color;
    breaks 2-cycles, deterministic via the fixed color order). Matches
    oracle.label_propagation_redblack exactly.

    ``weighted=True`` (weighted symmetric build): each neighbor's vote
    counts its edge multiplicity; the self-vote stays 1. Integer-exact,
    same tiebreak (max weight, then min label)."""
    if method not in ("sync", "redblack"):
        raise ValueError(f"unknown LP method {method!r}")
    from .bsp import key_init_state

    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"label": pa.int64()})
    store = None
    start_iter = 0
    if init == "key":
        state = key_init_state(graph)
    else:
        state = init_state(
            graph,
            lambda p: np.arange(int(graph.n_per_part[p]), dtype=np.int64) * graph.P + p,
            dtype=pa.int64(),
        )
    if checkpoint_dir:
        store = CheckpointStore(checkpoint_dir, "labelprop",
                                graph_fingerprint(graph),
                                {"max_iter": max_iter, "init": init,
                                 "method": method, "weighted": weighted})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('labelprop', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_lp.remote(
            graph_view(graph), state_table(state), max_iter, start_iter,
            method, weighted))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        return state_to_vertex_table(rd.from_arrow(final_tab), graph,
                                     "vec", "label")

    from .bsp import actor_engine_enabled

    if actor_engine_enabled(graph):
        return _actor_lp(graph, state, max_iter, start_iter, method,
                         weighted, metrics_out, store=store)

    scatter = _make_scatter(graph, weighted)
    if method == "redblack":
        combines = [_make_combine(graph, 0), _make_combine(graph, 1)]
    else:
        combines = [_make_combine(graph)]

    from .bsp import maybe_expand_chunks

    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.perf_counter()
        changed = 0
        for combine in combines:
            state = (
                maybe_expand_chunks(state, graph)
                .map_batches(scatter, batch_format="pyarrow", batch_size=1,
                             zero_copy_batch=True)
                .groupby("dst_part")
                .map_groups(combine, batch_format="pyarrow")
                .materialize()
            )
            from .bsp import sum_columns

            changed += int(sum_columns(state, ["changed"])["changed"])
        dt = time.perf_counter() - t0
        metrics = {"iter": it, "changed": changed, "sec": dt,
                   "edges_per_sec": graph.m / dt if dt > 0 else None}
        if metrics_out is not None:
            metrics_out.append(metrics)
        if store is not None:
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if changed == 0:
            break

    return state_to_vertex_table(state, graph, "vec", "label")
