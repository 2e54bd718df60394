"""Connected components: min-label propagation supersteps, exact fixpoint.

Runs on a *symmetric* graph build (``build_graph(..., symmetric=True)``).
Integer min is order-free, so the kernel is exactly deterministic with no
float caveats; canonical output label = min vid of the component, matching
the oracle bit-for-bit.

Superstep: scatter emits per (src_part -> dst_part) the *elementwise min*
label per destination vertex (pre-aggregation again bounds any hub's fan-in
to P partial rows); combine takes min(prev, partial mins) and counts
changes; driver stops at zero changes (global fixpoint).

Reference parity: 1-D cluster-merge via min-labels (group_numbers,
ml/anomaly/stump_anom.py:9-34) generalized to graphs; convergence-gated
iteration per SURVEY §2.10.
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

_I64MAX = np.iinfo(np.int64).max


def _make_scatter(graph: Graph):
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
                seg_dst = blk.dst_local[lo:hi]
                acc = np.full(int(seg_dst.max()) + 1, _I64MAX, dtype=np.int64)
                np.minimum.at(acc, seg_dst, vals[lo:hi])
                nz = np.flatnonzero(acc != _I64MAX)
                rows.append(
                    partial_row(q, part, sub, 0,
                                idx=nz.astype(np.int32), lab=acc[nz])
                )
        return partials_table(rows)

    return scatter


def _make_combine(graph: Graph):
    n_per_part = graph.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        n_q = int(n_per_part[part])
        idx_col = group["idx"].combine_chunks()
        lab_col = group["lab"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        lab_flat = lab_col.flatten().to_numpy(zero_copy_only=False)
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        prev = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        new = prev.copy()
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            np.minimum.at(new, idx, lab)
        changed = int((new != prev).sum())
        assert len(prev) == n_q
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "vec": pa.array([new], pa.list_(pa.int64())),
                "changed": pa.array([changed], pa.int64()),
            }
        )

    return combine


def _make_jump_fns(graph):
    """The three exchange closures of one pointer-jumping round (shared by
    the Dataset pipeline and the fused in-task executor)."""
    P = graph.P

    def request(batch: pa.Table) -> pa.Table:
        rows = []
        for part, labels in iter_state_rows(batch, "vec"):
            labels = labels.astype(np.int64, copy=False)
            u = np.unique(labels)
            owner = u % P
            for q in range(P):
                sel = u[owner == q]
                if len(sel):
                    rows.append(partial_row(int(q), part, 0, 0, lab=sel))
            rows.append(partial_row(part, -1, -1, 1, lab=labels))
        return partials_table(rows)

    def respond(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        lab_col = group["lab"].combine_chunks()
        lab_flat = lab_col.flatten().to_numpy(zero_copy_only=False)
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        mine = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        srcs = group["src_part"].to_numpy(zero_copy_only=False)
        rows = [partial_row(part, -1, -1, 1, lab=mine)]  # carry state forward
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            req = lab_flat[lab_offs[i]: lab_offs[i + 1]].astype(np.int64)
            ans = mine[req // P]
            rows.append(partial_row(int(srcs[i]), part, 0, 0, lab=req, cnt=ans))
        return partials_table(rows)

    def apply(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        lab_col = group["lab"].combine_chunks()
        cnt_col = group["cnt"].combine_chunks()
        lab_flat = lab_col.flatten().to_numpy(zero_copy_only=False)
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        cnt_flat = cnt_col.flatten().to_numpy(zero_copy_only=False)
        cnt_offs = cnt_col.offsets.to_numpy(zero_copy_only=False)
        prev = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        reqs, anss = [], []
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            reqs.append(lab_flat[lab_offs[i]: lab_offs[i + 1]].astype(np.int64))
            anss.append(cnt_flat[cnt_offs[i]: cnt_offs[i + 1]].astype(np.int64))
        new = prev.copy()
        if reqs:
            R = np.concatenate(reqs)
            A = np.concatenate(anss)
            order = np.argsort(R, kind="stable")
            R, A = R[order], A[order]
            pos = np.searchsorted(R, prev)
            # every label present in prev was requested, so pos is exact
            new = np.minimum(prev, A[pos])
        changed = int((new != prev).sum())
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return request, respond, apply


def _jump_round(state: rd.Dataset, graph: Graph) -> tuple[rd.Dataset, int]:
    """One pointer-jumping round: labels[v] <- min(labels[v],
    labels[labels[v]]). Labels are vids, so the owner partition of a label
    is ``label % P`` — the round is two partition-keyed exchanges:

      1. each partition requests the label-of-label for its *distinct*
         labels from the owner partitions (dedup bounds traffic);
      2. owners answer from their own state; answers are routed back and
         applied with a vectorized sorted lookup.

    Combined with the neighbor-min superstep this compresses label chains
    and converges in strictly fewer rounds than pure neighbor-min on
    long-diameter graphs (SURVEY §7.2 step 6 "pointer-jumping"); the full
    O(log n) Shiloach-Vishkin hook-and-compress variant is ROADMAP work."""
    request, respond, apply = _make_jump_fns(graph)

    responses = (
        state.map_batches(request, batch_format="pyarrow", batch_size=1,
                          zero_copy_batch=True)
        .groupby("dst_part")
        .map_groups(respond, batch_format="pyarrow")
    )
    new_state = (
        responses.groupby("dst_part")
        .map_groups(apply, batch_format="pyarrow")
        .materialize()
    )
    from .bsp import sum_columns

    return new_state, int(sum_columns(new_state, ["changed"])["changed"])


@ray.remote
def _fused_cc(view, state_tab: pa.Table, method: str, max_iter: int,
              start_iter: int):
    """All CC supersteps (and jump exchanges) in ONE task — same closures
    as the Dataset path; integer min reductions, so bit-equal output."""
    from .bsp import fused_superstep, split_by_dst_part, table_scalar_sums

    scatter = _make_scatter(view)
    combine = _make_combine(view)
    request, respond, apply = (_make_jump_fns(view) if method == "jump"
                               else (None, None, None))
    metrics = []
    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.perf_counter()
        state_tab = fused_superstep(state_tab, scatter, combine)
        changed = int(table_scalar_sums(state_tab, ["changed"])["changed"])
        jump_changed = 0
        if method == "jump":
            responses = pa.concat_tables(
                [respond(g) for g in split_by_dst_part(request(state_tab))])
            state_tab = pa.concat_tables(
                [apply(g) for g in split_by_dst_part(responses)])
            jump_changed = int(
                table_scalar_sums(state_tab, ["changed"])["changed"])
        metrics.append({"iter": it, "changed": changed,
                        "jump_changed": jump_changed, "fused": True,
                        "sec": time.perf_counter() - t0})
        if changed == 0 and jump_changed == 0:
            break
    return state_tab.select(["part", "vec"]), metrics


def _actor_cc(graph, state, max_iter, start_iter, metrics_out, store=None):
    """Persistent-actor BSP CC (round 3 scaling work, minlabel method):
    the same scatter/combine closures as the Dataset path inside a
    partition-owning actor pool; integer min reductions, so the output is
    BIT-EQUAL to the Dataset path (see bsp._BSPActor). ``store``: durable
    runs keep this engine — actors write their own partition state files
    every checkpoint_interval() supersteps (round 5)."""
    from .bsp import (actor_checkpoint, actor_state_table, actor_superstep,
                      checkpoint_interval, start_bsp_actors,
                      stop_bsp_actors)

    actors, parts_of = start_bsp_actors(
        graph, state, _make_scatter, None, dtype="int64",
        scalar_cols=("changed",))
    every = checkpoint_interval()
    try:
        for it in range(start_iter + 1, max_iter + 1):
            t0 = time.perf_counter()
            (changed,) = actor_superstep(actors, parts_of, _make_combine,
                                         scalar_cols=("changed",))
            dt = time.perf_counter() - t0
            metrics = {
                "iter": it, "changed": int(changed), "jump_changed": 0,
                "sec": dt, "engine": "actors",
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
                                 "comp")


def connected_components(
    graph: Graph,
    *,
    max_iter: int = 10_000,
    init: str = "vid",
    method: str = "minlabel",
    checkpoint_dir: str | None = None,
    metrics_out: list | None = None,
    fused: bool | None = None,
) -> rd.Dataset:
    """Per-vertex Dataset (vid, comp). ``graph`` must be a symmetric build.

    ``init="vid"``: canonical component label = min vid (oracle-exact).
    ``init="key"``: labels start from int64 vertex keys, so the component
    label is the min *key* — matches relational (SQL) formulations directly.

    ``method="minlabel"``: pure neighbor-min supersteps, O(diameter) rounds.
    ``method="jump"``: each round adds a pointer-jumping exchange
    (labels[v] <- labels[labels[v]]) — O(log n) rounds on long chains.
    Both reach the identical exact fixpoint (min label of the component);
    "jump" requires ``init="vid"`` (labels must be vids for owner routing).
    """
    if method == "jump" and init != "vid":
        raise ValueError("pointer jumping requires vid-labels (init='vid')")
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"comp": pa.int64()})
    from .bsp import key_init_state

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
        store = CheckpointStore(
            checkpoint_dir, "cc", graph_fingerprint(graph),
            {"init": init, "method": method},
        )
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('cc', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_cc.remote(
            graph_view(graph), state_table(state), method, max_iter,
            start_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        return state_to_vertex_table(rd.from_arrow(final_tab), graph,
                                     "vec", "comp")

    from .bsp import actor_engine_enabled

    if method == "minlabel" and actor_engine_enabled(graph):
        return _actor_cc(graph, state, max_iter, start_iter, metrics_out,
                         store=store)

    scatter = _make_scatter(graph)
    combine = _make_combine(graph)

    from .bsp import maybe_expand_chunks

    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.perf_counter()
        new_state = (
            maybe_expand_chunks(state, graph)
            .map_batches(scatter, batch_format="pyarrow", batch_size=1,
                         zero_copy_batch=True)
            .groupby("dst_part")
            .map_groups(combine, batch_format="pyarrow")
            .materialize()
        )
        from .bsp import sum_columns

        changed = int(sum_columns(new_state, ["changed"])["changed"])
        state = new_state
        jump_changed = 0
        if method == "jump":
            state, jump_changed = _jump_round(state, graph)
        dt = time.perf_counter() - t0
        metrics = {"iter": it, "changed": changed, "jump_changed": jump_changed,
                   "sec": dt,
                   "edges_per_sec": graph.m / dt if dt > 0 else None}
        if metrics_out is not None:
            metrics_out.append(metrics)
        if store is not None:
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if changed == 0 and jump_changed == 0:
            break

    return state_to_vertex_table(state, graph, "vec", "comp")
