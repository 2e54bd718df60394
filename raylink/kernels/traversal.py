"""BFS hop distance and k-core decomposition as BSP superstep kernels.

Both reuse the CC kernel's physical shape — scatter emits per
(src_part -> dst_part) pre-aggregated partials (bincount/min, so a hub's
fan-in is bounded by P rows), ``groupby(dst_part)`` is the superstep's one
shuffle, combine is an order-free integer reduction — and the chunk-parallel
expansion (bsp.maybe_expand_chunks) for hub partitions.

- :func:`bfs_hops`: min-plus propagation from one source vertex; exact,
  converges in diameter rounds; unreachable vertices keep INF and are
  dropped from the output.
- :func:`k_core`: iterative peeling — a vertex stays alive while it has
  >= k alive neighbors; run to fixpoint (exact k-core) or a fixed round
  count (matches an unrolled SQL oracle).

Reference parity: gated iterative refinement with carried integer state
(history-fed validity gates, peak_detect_v4.py:987-1167) redesigned
order-independent per SURVEY §2.10/§7.0.
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
    iter_chunk_rows,
    maybe_expand_chunks,
    partial_row,
    partials_table,
    state_to_vertex_table,
    sum_columns,
)

_INF = np.int64(1 << 62)


def _min_scatter(graph: Graph, *, plus_one: bool,
                 use_weights: bool = False,
                 bound: int | None = None,
                 step: int = 1):
    """``use_weights=True`` (weighted build): each slot relaxes by its
    edge weight instead of +1 — min-plus over edge lengths, i.e. the
    Bellman-Ford step. Falls back to +1 on unweighted blocks.

    ``plus_one=True`` expects the FRESH-BIT state encoding (enc =
    dist*2 + fresh, INF literal): only sources whose distance improved
    last round relax their edges — the label-correcting sparsification
    of Bellman-Ford. The emitted partials (and so the superstep's
    SHUFFLE volume) shrink to the improved frontier; all-stale
    partitions skip their CSR scan entirely (the in-task gather for a
    partition with any fresh vertex stays one O(m_p) vectorized pass).
    Per-round distances are provably identical to the dense relaxation
    (a vertex's contribution lands the round after its last improvement,
    exactly when the dense sweep first uses the improved value), so
    fixed-unroll SQL-oracle parity is preserved. ``plus_one=False``
    (the MIS vote channel) keeps plain values.

    ``bound`` (delta-stepping): only fresh vertices with dist < bound
    relax this round — the bucket-synchronous restriction; fresh
    vertices at or past the bound keep waiting (their bit survives via
    the matching ``_min_combine(bound=...)``)."""
    refs = graph.blocks
    P = graph.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, sub, vec in iter_chunk_rows(batch, "vec"):
            vec = vec.astype(np.int64, copy=False)
            if sub < 0:
                rows.append(partial_row(part, -1, -1, 1, lab=vec))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue
            blk = _ray.get(chunks[sub])
            if plus_one:
                fresh = (vec < _INF) & ((vec & 1) == 1)
                if bound is not None:
                    fresh &= (vec >> 1) < bound
                if not fresh.any():
                    continue
                dist = np.where(fresh, vec >> 1, _INF)
                vals = dist[blk.src_local]
                if use_weights and blk.w is not None:
                    if not np.issubdtype(blk.w.dtype, np.integer):
                        raise TypeError(
                            "sssp requires integer edge weights (int64 "
                            "min-plus state); float-weight SSSP would "
                            "need a float distance lattice")
                    stp = blk.w
                else:
                    stp = np.int64(step)
                vals = np.where(vals >= _INF, _INF, vals + stp)
            else:
                vals = vec[blk.src_local]
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg_dst = blk.dst_local[lo:hi]
                acc = np.full(int(seg_dst.max()) + 1, _INF, dtype=np.int64)
                np.minimum.at(acc, seg_dst, vals[lo:hi])
                nz = np.flatnonzero(acc != _INF)
                if len(nz):
                    rows.append(partial_row(q, part, sub, 0,
                                            idx=nz.astype(np.int32),
                                            lab=acc[nz]))
        return partials_table(rows)

    return scatter


def _min_combine(graph: Graph, bound: int | None = None):
    """Fresh-bit-aware min reduction: incoming candidates are PLAIN
    distances; state rows carry enc = dist*2 + fresh (INF literal).
    Improved vertices re-arm their fresh bit, everyone else's clears —
    the next scatter relaxes only the improved frontier.

    ``bound`` (delta-stepping): only vertices that actually scattered
    this round (fresh AND dist < bound) clear their bit; fresh vertices
    waiting past the bound keep it. The output then also carries a
    per-part ``fresh_min`` (min dist over still-fresh vertices, INF if
    none) so the driver can open the next non-empty bucket directly."""
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
        enc = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        prev = np.where(enc < _INF, enc >> 1, _INF)
        inc = np.full(len(prev), _INF, dtype=np.int64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            np.minimum.at(inc, idx, lab)
        improved = inc < prev
        if bound is None:
            new = np.where(improved, inc * 2 + 1,
                           np.where(enc < _INF, (enc >> 1) * 2, enc))
        else:
            scattered = (enc < _INF) & ((enc & 1) == 1) & ((enc >> 1) < bound)
            new = np.where(improved, inc * 2 + 1,
                           np.where(scattered, (enc >> 1) * 2, enc))
        changed = int(improved.sum())
        assert len(prev) == int(n_per_part[part])
        cols = {
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        }
        if bound is not None:
            fr = (new < _INF) & ((new & 1) == 1)
            fm = int((new[fr] >> 1).min()) if fr.any() else int(_INF)
            cols["fresh_min"] = pa.array([fm], pa.int64())
        return pa.table(cols)

    return combine


@ray.remote
def _fused_min_loop(view, state_tab: pa.Table, max_iter: int,
                    use_weights: bool = False, step: int = 1):
    """Fused min-plus propagation (BFS/SSSP) — one task, bit-equal."""
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _min_scatter(view, plus_one=True, use_weights=use_weights,
                           step=step)
    combine = _min_combine(view)
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


def bfs_hops(graph: Graph, source_vid: int, *, max_iter: int = 10_000,
             metrics_out: list | None = None,
             fused: bool | None = None,
             checkpoint_dir: str | None = None) -> rd.Dataset:
    """(vid, hops) for vertices reachable from ``source_vid``. Run on a
    symmetric build for undirected hop distance, directed for reachability
    distance. ``checkpoint_dir``: durable supersteps + resume (actors
    write their own partition state files, same as pagerank)."""
    return _min_plus_single(graph, source_vid, "hops", False, max_iter,
                            metrics_out, fused, checkpoint_dir)


def sssp(graph: Graph, source_vid: int, *, max_iter: int = 10_000,
         metrics_out: list | None = None,
         fused: bool | None = None,
         checkpoint_dir: str | None = None) -> rd.Dataset:
    """Single-source shortest paths over a WEIGHTED build (edge length =
    multiplicity weight): (vid, dist) for reachable vertices. Bellman-Ford
    as min-plus supersteps — same physical shape as BFS, each slot relaxes
    by its weight; converges in <= (longest shortest-path hop count)
    rounds, ``max_iter`` caps rounds for fixed-unroll oracle parity. On an
    unweighted build this degrades to hop distance (weight 1).
    ``checkpoint_dir``: durable supersteps + resume — the relevant case
    at scale is a large-diameter weighted graph whose Bellman-Ford round
    count makes the run multi-hour; integer min reductions make a resumed
    run bit-equal to a fresh one."""
    return _min_plus_single(graph, source_vid, "dist", True, max_iter,
                            metrics_out, fused, checkpoint_dir)


def _min_plus_single(graph: Graph, source_vid: int, out_col: str,
                     use_weights: bool, max_iter: int,
                     metrics_out: list | None,
                     fused: bool | None,
                     checkpoint_dir: str | None = None) -> rd.Dataset:
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({out_col: pa.int64()})
    P = graph.P
    s_part, s_local = int(source_vid) % P, int(source_vid) // P

    def init_of(p: int) -> np.ndarray:
        v = np.full(int(graph.n_per_part[p]), _INF, dtype=np.int64)
        if p == s_part:
            v[s_local] = 1  # enc = dist 0, fresh
        return v

    state = init_state(graph, init_of, dtype=pa.int64())
    store = None
    start_iter = 0
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        store = CheckpointStore(checkpoint_dir, f"minplus_{out_col}",
                                graph_fingerprint(graph),
                                {"source_vid": int(source_vid),
                                 "weighted": bool(use_weights)})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('minplus', start_iter, max_iter)

    def decode_f(batch: pa.Table) -> pa.Table:
        # enc = dist*2 + fresh -> dist; INF rows (unreachable) dropped
        enc = batch[out_col].to_numpy(zero_copy_only=False)
        keep = enc < _INF
        return pa.table({
            "vid": batch["vid"].filter(pa.array(keep)),
            out_col: pa.array(enc[keep] >> 1, pa.int64()),
        })

    from .bsp import (actor_engine_enabled, actor_int_loop, fused_eligible,
                      graph_view, state_table)

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_min_loop.remote(
            graph_view(graph), state_table(state), max_iter, use_weights))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        state = rd.from_arrow(final_tab)
        out = state_to_vertex_table(state, graph, "vec", out_col)
        return out.map_batches(decode_f, batch_format="pyarrow")

    if actor_engine_enabled(graph):
        tab, _ = actor_int_loop(
            graph, state,
            lambda v, uw=use_weights: _min_scatter(v, plus_one=True,
                                                   use_weights=uw),
            _min_combine, max_iter=max_iter, metrics_out=metrics_out,
            store=store, start_iter=start_iter)
        out = state_to_vertex_table(rd.from_arrow(tab), graph, "vec",
                                    out_col)
        return out.map_batches(decode_f, batch_format="pyarrow")

    scatter = _min_scatter(graph, plus_one=True, use_weights=use_weights)
    combine = _min_combine(graph)

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
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if changed == 0:
            break

    out = state_to_vertex_table(state, graph, "vec", out_col)
    return out.map_batches(decode_f, batch_format="pyarrow")


def dag_levels(graph: Graph, *, max_iter: int = 1024,
               metrics_out: list | None = None,
               fused: bool | None = None,
               checkpoint_dir: str | None = None) -> rd.Dataset:
    """(vid, level) longest-path layering of a DAG: level(v) = 0 for
    sources, else 1 + max over in-neighbors — the topological depth used
    to schedule/visualize a condensation DAG.

    Max-plus propagation run as NEGATED min-plus over the existing
    fresh-bit machinery (every vertex starts dist 0 fresh; each directed
    edge relaxes dist - 1; fixpoint dist = -level), so the shuffle shape,
    frontier pruning and fused path are shared with BFS/SSSP verbatim.
    Converges in (longest path length) rounds on a DAG. On a graph with a
    directed CYCLE levels diverge — the loop raises if ``max_iter`` rounds
    pass without a fixpoint rather than return a wrong layering."""
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"level": pa.int64()})

    def init_of(p: int) -> np.ndarray:
        return np.ones(int(graph.n_per_part[p]), dtype=np.int64)

    state = init_state(graph, init_of, dtype=pa.int64())
    store = None
    start_iter = 0
    resumed = None
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        store = CheckpointStore(checkpoint_dir, "dag_levels",
                                graph_fingerprint(graph), {})
        resumed = store.latest()

    def decode_f(batch: pa.Table) -> pa.Table:
        enc = batch["level"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vid": batch["vid"],
            "level": pa.array(-(enc >> 1), pa.int64()),
        })

    if resumed is not None:
        start_iter, state = resumed
        from ..checkpoint import check_resume_bound

        check_resume_bound('dag_levels', start_iter, max_iter)
        last = store.metrics_history().get(start_iter, {})
        if last.get("changed") == 0:
            # already at the fixpoint: don't re-run (and don't mis-raise
            # when start_iter == max_iter)
            out = state_to_vertex_table(
                state.select_columns(["part", "vec"]), graph, "vec",
                "level")
            return out.map_batches(decode_f, batch_format="pyarrow")

    from .bsp import (actor_engine_enabled, actor_int_loop, fused_eligible,
                      graph_view, state_table)

    converged = False
    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_min_loop.remote(
            graph_view(graph), state_table(state), max_iter, False, -1))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        converged = bool(metrics) and metrics[-1]["changed"] == 0
        state = rd.from_arrow(final_tab)
    elif actor_engine_enabled(graph):
        tab, converged = actor_int_loop(
            graph, state,
            lambda v: _min_scatter(v, plus_one=True, step=-1),
            _min_combine, max_iter=max_iter, metrics_out=metrics_out,
            store=store, start_iter=start_iter)
        state = rd.from_arrow(tab)
    else:
        scatter = _min_scatter(graph, plus_one=True, step=-1)
        combine = _min_combine(graph)
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
                converged = True
                break
        state = state.select_columns(["part", "vec"])
    if not converged:
        raise ValueError(
            f"dag_levels did not reach a fixpoint in {max_iter} rounds — "
            "the graph has a directed cycle (levels diverge) or the DAG "
            "is deeper than max_iter")

    out = state_to_vertex_table(state, graph, "vec", "level")
    return out.map_batches(decode_f, batch_format="pyarrow")


@ray.remote
def _fused_delta_loop(view, state_tab: pa.Table, max_iter: int,
                      use_weights: bool, delta: int):
    """Fused delta-stepping loop — one task, same bucket schedule."""
    from .bsp import fused_superstep, table_scalar_sums

    metrics = []
    B = int(delta)
    scatter = _min_scatter(view, plus_one=True, use_weights=use_weights,
                           bound=B)
    combine = _min_combine(view, bound=B)
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        state_tab = fused_superstep(state_tab, scatter, combine)
        changed = int(table_scalar_sums(state_tab, ["changed"])["changed"])
        fm = int(state_tab["fresh_min"].to_numpy(zero_copy_only=False).min())
        metrics.append({"iter": it, "changed": changed, "bound": B,
                        "fused": True, "sec": time.perf_counter() - t0})
        if changed == 0:
            if fm >= _INF:
                break
            B = (fm // delta + 1) * delta
            scatter = _min_scatter(view, plus_one=True,
                                   use_weights=use_weights, bound=B)
            combine = _min_combine(view, bound=B)
    return state_tab.select(["part", "vec"]), metrics


def sssp_delta(graph: Graph, source_vid: int, *, delta: int = 4,
               max_iter: int = 10_000, metrics_out: list | None = None,
               fused: bool | None = None) -> rd.Dataset:
    """Delta-stepping SSSP (Meyer & Sanders): same min-plus supersteps as
    :func:`sssp`, but each round only the fresh frontier BELOW the open
    bucket bound ``B`` relaxes; when a bucket settles (no improvement),
    ``B`` jumps to the edge of the next non-empty bucket (driver reads a
    per-part ``fresh_min`` scalar — O(P) bytes). Far vertices thus wait
    until their distance range opens instead of relaxing speculative
    distances that later improve — on large-diameter weighted graphs this
    trades a few extra (cheap, small-frontier) rounds for strictly less
    re-relaxation work per round; with ``delta`` >= the max path weight it
    degenerates to exactly :func:`sssp`'s schedule. The FIXPOINT is the
    true shortest-path distance either way (bucket order only reorders
    relaxations), verified against a Dijkstra oracle. No light/heavy edge
    split: buckets alone give the work bound here because a superstep's
    cost is dominated by touched-partition scans, not per-edge retries.
    ``delta`` is in weight units (int lattice, same contract as sssp)."""
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"dist": pa.int64()})
    if delta < 1:
        raise ValueError("delta must be >= 1")
    P = graph.P
    s_part, s_local = int(source_vid) % P, int(source_vid) // P

    def init_of(p: int) -> np.ndarray:
        v = np.full(int(graph.n_per_part[p]), _INF, dtype=np.int64)
        if p == s_part:
            v[s_local] = 1  # enc = dist 0, fresh
        return v

    state = init_state(graph, init_of, dtype=pa.int64())

    def decode_f(batch: pa.Table) -> pa.Table:
        enc = batch["dist"].to_numpy(zero_copy_only=False)
        keep = enc < _INF
        return pa.table({
            "vid": batch["vid"].filter(pa.array(keep)),
            "dist": pa.array(enc[keep] >> 1, pa.int64()),
        })

    from .bsp import fused_eligible, graph_view, state_table

    if fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_delta_loop.remote(
            graph_view(graph), state_table(state), max_iter,
            graph.weighted, int(delta)))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        state = rd.from_arrow(final_tab)
        out = state_to_vertex_table(state, graph, "vec", "dist")
        return out.map_batches(decode_f, batch_format="pyarrow")

    from .bsp import ActorEngine, actor_engine_enabled

    if actor_engine_enabled(graph):
        # Same bucket schedule as the Dataset loop below, on the
        # persistent pool; fresh_min min-reduces across parts (the
        # per-part scalar the driver reads to open the next bucket).
        eng = ActorEngine({"g": graph})
        eng.load("s", state, "int64")
        B, uw = int(delta), graph.weighted
        for it in range(1, max_iter + 1):
            t0 = time.perf_counter()
            ch, fm = eng.superstep(
                lambda v, b=B, u=uw: _min_scatter(v, plus_one=True,
                                                  use_weights=u, bound=b),
                lambda v, b=B: _min_combine(v, bound=b),
                view="g", read={"vec": "s"}, write={"vec": "s"},
                scalar_cols=("changed", "fresh_min"),
                reduce=("sum", "min"), expand=True)
            changed, fm = int(ch), int(fm)
            if metrics_out is not None:
                metrics_out.append({"iter": it, "changed": changed,
                                    "bound": B, "engine": "actors",
                                    "sec": time.perf_counter() - t0})
            if changed == 0:
                if fm >= _INF:
                    break
                B = (fm // delta + 1) * delta
        out = state_to_vertex_table(eng.dataset("s"), graph, "vec", "dist")
        return out.map_batches(decode_f, batch_format="pyarrow")

    B = int(delta)
    scatter = _min_scatter(graph, plus_one=True, use_weights=graph.weighted,
                           bound=B)
    combine = _min_combine(graph, bound=B)
    for it in range(1, max_iter + 1):
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
        fm = _INF
        for b in state.select_columns(["fresh_min"]).iter_batches(
                batch_format="pyarrow"):
            if b.num_rows:
                fm = min(fm, int(b["fresh_min"].to_numpy(
                    zero_copy_only=False).min()))
        if metrics_out is not None:
            metrics_out.append({"iter": it, "changed": changed, "bound": B,
                                "sec": time.perf_counter() - t0})
        if changed == 0:
            if fm >= _INF:
                break
            B = (fm // delta + 1) * delta
            scatter = _min_scatter(graph, plus_one=True,
                                   use_weights=graph.weighted, bound=B)
            combine = _min_combine(graph, bound=B)

    out = state_to_vertex_table(state, graph, "vec", "dist")
    return out.map_batches(decode_f, batch_format="pyarrow")


def _make_alive_scatter(graph):
    refs = graph.blocks
    P = graph.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, sub, alive in iter_chunk_rows(batch, "vec"):
            alive = alive.astype(np.int64, copy=False)
            if sub < 0:
                rows.append(partial_row(part, -1, -1, 1, lab=alive))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue
            blk = _ray.get(chunks[sub])
            vals = alive[blk.src_local]
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg_dst = blk.dst_local[lo:hi]
                acc = np.bincount(seg_dst, weights=vals[lo:hi])
                nz = np.flatnonzero(acc)
                if len(nz):
                    rows.append(partial_row(q, part, sub, 0,
                                            idx=nz.astype(np.int32),
                                            cnt=acc[nz].astype(np.int64)))
        return partials_table(rows)

    return scatter


def _make_kcore_combine(graph, k: int):
    n_per_part = graph.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        idx_col = group["idx"].combine_chunks()
        cnt_col = group["cnt"].combine_chunks()
        lab_col = group["lab"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        cnt_flat = cnt_col.flatten().to_numpy(zero_copy_only=False)
        cnt_offs = cnt_col.offsets.to_numpy(zero_copy_only=False)
        lab_flat = lab_col.flatten().to_numpy(zero_copy_only=False)
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        prev = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        deg_alive = np.zeros(int(n_per_part[part]), dtype=np.int64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            cnt = cnt_flat[cnt_offs[i]: cnt_offs[i + 1]]
            np.add.at(deg_alive, idx, cnt)
        new = (prev > 0) & (deg_alive >= k)
        new = new.astype(np.int64)
        changed = int((new != prev).sum())
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return combine


@ray.remote
def _fused_kcore(view, state_tab: pa.Table, k: int, max_iter: int):
    """Fused k-core peeling — one task, bit-equal output."""
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _make_alive_scatter(view)
    combine = _make_kcore_combine(view, k)
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


def k_core(graph: Graph, k: int, *, max_iter: int = 10_000,
           metrics_out: list | None = None,
           fused: bool | None = None,
           checkpoint_dir: str | None = None) -> rd.Dataset:
    """(vid, in_core) 0/1 membership of the k-core (run on a symmetric
    build). Iterative peeling: each round counts ALIVE neighbors (alive
    indicator scattered through the same bincount partials as PageRank
    contributions) and kills vertices below ``k``; fixpoint = exact
    k-core. ``max_iter`` caps rounds for fixed-round oracle parity.
    ``checkpoint_dir``: durable peel rounds + resume (actor_int_loop
    store hook; monotone integer peeling — resumes bit-equal)."""
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"in_core": pa.int64()})
    state = init_state(graph,
                       lambda p: np.ones(int(graph.n_per_part[p]), np.int64),
                       dtype=pa.int64())
    store = None
    start_iter = 0
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        store = CheckpointStore(checkpoint_dir, "kcore",
                                graph_fingerprint(graph), {"k": int(k)})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('kcore', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_kcore.remote(
            graph_view(graph), state_table(state), k, max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        return state_to_vertex_table(rd.from_arrow(final_tab), graph,
                                     "vec", "in_core")

    from .bsp import actor_engine_enabled, actor_int_loop

    if actor_engine_enabled(graph):
        tab, _ = actor_int_loop(
            graph, state, _make_alive_scatter,
            lambda v, kk=k: _make_kcore_combine(v, kk),
            max_iter=max_iter, metrics_out=metrics_out,
            store=store, start_iter=start_iter)
        return state_to_vertex_table(rd.from_arrow(tab), graph, "vec",
                                     "in_core")

    scatter = _make_alive_scatter(graph)
    combine = _make_kcore_combine(graph, k)

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
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if changed == 0:
            break

    return state_to_vertex_table(state, graph, "vec", "in_core")


def _multi_min_scatter(graph, S: int):
    """Min-plus scatter over S sources at once: each partition's state is
    the row-major flattened (n_local x S) distance matrix; one gather +
    one vectorized minimum per (src_part -> dst_part) segment serves all
    S sources (the batch-analytics shape: S landmarks cost one traversal,
    not S)."""
    refs = graph.blocks
    P = graph.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, sub, vec in iter_chunk_rows(batch, "vec"):
            vec = vec.astype(np.int64, copy=False)
            if sub < 0:
                rows.append(partial_row(part, -1, -1, 1, lab=vec))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue
            blk = _ray.get(chunks[sub])
            mat = vec.reshape(-1, S)
            # fresh-bit state (enc = hops*2 + fresh): relax only slots
            # whose hop count improved last round (frontier-proportional
            # work; per-round values identical to the dense sweep)
            fresh = (mat < _INF) & ((mat & 1) == 1)
            if not fresh.any():
                continue
            dist = np.where(fresh, mat >> 1, _INF)
            vals = dist[blk.src_local]                     # (m_seg, S)
            vals = np.where(vals >= _INF, _INF, vals + 1)
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg_dst = blk.dst_local[lo:hi].astype(np.int64)
                width = int(seg_dst.max()) + 1
                acc = np.full(width * S, _INF, dtype=np.int64)
                flat = (seg_dst[:, None] * S
                        + np.arange(S, dtype=np.int64)[None, :]).ravel()
                np.minimum.at(acc, flat, vals[lo:hi].ravel())
                nz = np.flatnonzero(acc != _INF)
                if len(nz):
                    rows.append(partial_row(q, part, sub, 0,
                                            idx=nz.astype(np.int32),
                                            lab=acc[nz]))
        return partials_table(rows)

    return scatter


def _multi_min_combine(graph, S: int):
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
        enc = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        prev = np.where(enc < _INF, enc >> 1, _INF)
        inc = np.full(len(prev), _INF, dtype=np.int64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            np.minimum.at(inc, idx, lab)
        improved = inc < prev
        new = np.where(improved, inc * 2 + 1,
                       np.where(enc < _INF, (enc >> 1) * 2, enc))
        changed = int(improved.sum())
        assert len(prev) == int(n_per_part[part]) * S
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return combine


@ray.remote
def _fused_multi_min(view, state_tab: pa.Table, S: int, max_iter: int):
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _multi_min_scatter(view, S)
    combine = _multi_min_combine(view, S)
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


def bfs_hops_multi(graph: Graph, source_vids, *, max_iter: int = 10_000,
                   metrics_out: list | None = None,
                   fused: bool | None = None,
                   checkpoint_dir: str | None = None) -> rd.Dataset:
    """Hop distances from S sources in ONE propagation: rows
    (vid, source_idx, hops) for reachable pairs, source_idx = position in
    ``source_vids``. State is the flattened (n_local x S) matrix per
    partition, so every superstep serves all sources (landmark-distance /
    closeness-estimation shape). Requires n_local * S < 2^31 per
    partition (int32 sparse indices). ``checkpoint_dir``: durable
    supersteps + resume over the flattened matrix state (same store hook
    as :func:`sssp`)."""
    sources = [int(v) for v in source_vids]
    S = len(sources)
    if S == 0:
        raise ValueError("need at least one source")
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"source_idx": pa.int64(),
                                    "hops": pa.int64()})
    P = graph.P
    if int(graph.n_per_part.max()) * S >= (1 << 31):
        raise ValueError("n_local * S must stay below 2^31")

    def init_of(p: int) -> np.ndarray:
        v = np.full(int(graph.n_per_part[p]) * S, _INF, dtype=np.int64)
        for s_i, sv in enumerate(sources):
            if sv % P == p:
                v[(sv // P) * S + s_i] = 1  # enc = hops 0, fresh
        return v

    state = init_state(graph, init_of, dtype=pa.int64())
    store = None
    start_iter = 0
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        store = CheckpointStore(checkpoint_dir, "bfs_multi",
                                graph_fingerprint(graph),
                                {"sources": sources})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('coreness', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    from .bsp import actor_engine_enabled, actor_int_loop

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_multi_min.remote(
            graph_view(graph), state_table(state), S, max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        state = rd.from_arrow(final_tab)
    elif actor_engine_enabled(graph):
        tab, _ = actor_int_loop(
            graph, state,
            lambda v, s=S: _multi_min_scatter(v, s),
            lambda v, s=S: _multi_min_combine(v, s),
            max_iter=max_iter, metrics_out=metrics_out,
            store=store, start_iter=start_iter)
        state = rd.from_arrow(tab)
    else:
        scatter = _multi_min_scatter(graph, S)
        combine = _multi_min_combine(graph, S)
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

    from .bsp import iter_state_rows

    def expand(batch: pa.Table) -> pa.Table:
        vids, sidx, hops = [], [], []
        for part, vec in iter_state_rows(batch, "vec"):
            mat = np.asarray(vec).reshape(-1, S)
            loc, s_i = np.nonzero(mat < _INF)
            vids.append(loc.astype(np.int64) * P + part)
            sidx.append(s_i.astype(np.int64))
            hops.append(mat[loc, s_i] >> 1)  # decode enc = hops*2 + fresh
        if not vids:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "source_idx": pa.array([], pa.int64()),
                             "hops": pa.array([], pa.int64())})
        return pa.table({"vid": pa.array(np.concatenate(vids)),
                         "source_idx": pa.array(np.concatenate(sidx)),
                         "hops": pa.array(np.concatenate(hops))})

    return state.map_batches(expand, batch_format="pyarrow")


def _coreness_combine(graph: Graph):
    """Per-vertex h-index of neighbor values from pre-aggregated
    (idx, value, count) vote partials: with values sorted desc and
    cumulative counts c_i, h = max_i min(v_i, c_i)."""
    n_per_part = graph.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        idx_col = group["idx"].combine_chunks()
        lab_col = group["lab"].combine_chunks()
        cnt_col = group["cnt"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        lab_flat = lab_col.flatten().to_numpy(zero_copy_only=False)
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        cnt_flat = cnt_col.flatten().to_numpy(zero_copy_only=False)
        cnt_offs = cnt_col.offsets.to_numpy(zero_copy_only=False)
        prev = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        Is, Vs, Cs = [], [], []
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            Is.append(idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64))
            Vs.append(lab_flat[lab_offs[i]: lab_offs[i + 1]].astype(np.int64))
            Cs.append(cnt_flat[cnt_offs[i]: cnt_offs[i + 1]].astype(np.int64))
        new = prev.copy()
        if Is:
            I = np.concatenate(Is)
            V = np.concatenate(Vs)
            C = np.concatenate(Cs)
            # merge duplicate (vertex, value) partials, sort value DESC
            order = np.lexsort((-V, I))
            I, V, C = I[order], V[order], C[order]
            b = np.r_[True, (I[1:] != I[:-1]) | (V[1:] != V[:-1])]
            st = np.flatnonzero(b)
            C2 = np.add.reduceat(C, st)
            I2, V2 = I[st], V[st]
            # per-vertex cumulative counts over desc values
            firsts = np.r_[True, I2[1:] != I2[:-1]]
            cum = C2.cumsum()
            # within-vertex cumulative = global cumsum minus the total
            # BEFORE each vertex's first row
            seg_start = np.flatnonzero(firsts)
            seg_base = np.r_[np.int64(0), cum[:-1]][seg_start]
            base = np.repeat(seg_base, np.diff(np.r_[seg_start, len(I2)]))
            c_within = cum - base
            h_cand = np.minimum(V2, c_within)
            # max per vertex
            hs = np.maximum.reduceat(h_cand, seg_start)
            new[I2[seg_start]] = hs
        changed = int((new != prev).sum())
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return combine


@ray.remote
def _fused_coreness(view, state_tab: pa.Table, max_iter: int):
    from .bsp import fused_superstep, table_scalar_sums

    from .labelprop import _make_scatter as _lp_scatter

    scatter = _lp_scatter(view)
    combine = _coreness_combine(view)
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


def coreness(graph: Graph, *, max_iter: int = 10_000,
             metrics_out: list | None = None,
             fused: bool | None = None,
             checkpoint_dir: str | None = None) -> rd.Dataset:
    """Full core decomposition of a SYMMETRIC build: (vid, core) with
    core = the largest k such that v is in the k-core. Lu et al.'s
    h-index iteration: state starts at degree and each round replaces a
    vertex's value with the h-index of its neighbors' values — provably
    converges to coreness, order-independent, and the neighbor-value
    exchange pre-aggregates into the SAME (idx, value, count) vote
    partials as label propagation (a hub receives at most
    P * distinct-values rows). ``max_iter`` caps rounds for fixed-unroll
    oracle parity (extra rounds past the fixpoint are no-ops)."""
    from .labelprop import _make_scatter as _lp_scatter

    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"core": pa.int64()})

    import ray as _ray

    deg_of_part = {}
    for p in range(graph.P):
        if graph.n_per_part[p] > 0:
            if p in graph.blocks:
                deg_of_part[p] = np.asarray(
                    _ray.get(graph.blocks[p][0]).deg, dtype=np.int64)
            else:
                deg_of_part[p] = np.zeros(int(graph.n_per_part[p]), np.int64)

    state = init_state(graph, lambda p: deg_of_part[p], dtype=pa.int64())
    store = None
    start_iter = 0
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        store = CheckpointStore(checkpoint_dir, "coreness",
                                graph_fingerprint(graph), {})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('bfs_multi', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_coreness.remote(
            graph_view(graph), state_table(state), max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        return state_to_vertex_table(rd.from_arrow(final_tab), graph,
                                     "vec", "core")

    from .bsp import actor_engine_enabled, actor_int_loop

    if actor_engine_enabled(graph):
        tab, _ = actor_int_loop(graph, state, _lp_scatter,
                                _coreness_combine, max_iter=max_iter,
                                metrics_out=metrics_out,
                                store=store, start_iter=start_iter)
        return state_to_vertex_table(rd.from_arrow(tab), graph, "vec",
                                     "core")

    scatter = _lp_scatter(graph)
    combine = _coreness_combine(graph)
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
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if changed == 0:
            break
    return state_to_vertex_table(state, graph, "vec", "core")


# ---------------------------------------------------------------------------
# widest (maximin / bottleneck) path — the max-min semiring twin of sssp
# ---------------------------------------------------------------------------

_W0 = np.int64(1) << 40  # source capacity sentinel (> any multiplicity sum)


def _widest_scatter(graph: Graph):
    """Max-min relaxation step: a fresh vertex offers min(width(u), w(u,v))
    to each out-neighbor. Same fresh-bit frontier sparsification and
    per-(src_part -> dst_part) max pre-aggregation as the min-plus scatter
    (hub fan-in bounded by P partial rows). Unreached sentinel is enc=0, so
    zero-capacity offers never ship."""
    refs = graph.blocks
    P = graph.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, sub, vec in iter_chunk_rows(batch, "vec"):
            vec = vec.astype(np.int64, copy=False)
            if sub < 0:
                rows.append(partial_row(part, -1, -1, 1, lab=vec))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue
            blk = _ray.get(chunks[sub])
            fresh = (vec > 0) & ((vec & 1) == 1)
            if not fresh.any():
                continue
            width = np.where(fresh, vec >> 1, 0)
            vals = width[blk.src_local]
            if blk.w is not None:
                if not np.issubdtype(blk.w.dtype, np.integer):
                    raise TypeError(
                        "widest_path requires integer edge weights (int64 "
                        "max-min state)")
                if len(blk.w) and int(blk.w.max()) >= int(_W0):
                    raise ValueError(
                        "widest_path edge weight >= the source capacity "
                        "sentinel 2^40: first-hop min() would silently "
                        "truncate path capacities (advisor r2); rescale "
                        "weights below 2^40")
                vals = np.minimum(vals, blk.w.astype(np.int64))
            else:
                vals = np.minimum(vals, np.int64(1))
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg_dst = blk.dst_local[lo:hi]
                acc = np.zeros(int(seg_dst.max()) + 1, dtype=np.int64)
                np.maximum.at(acc, seg_dst, vals[lo:hi])
                nz = np.flatnonzero(acc > 0)
                if len(nz):
                    rows.append(partial_row(q, part, sub, 0,
                                            idx=nz.astype(np.int32),
                                            lab=acc[nz]))
        return partials_table(rows)

    return scatter


def _widest_combine(graph: Graph):
    """Fresh-bit-aware MAX reduction (enc = width*2 + fresh, 0 = unreached):
    improved vertices re-arm their fresh bit, everyone else's clears."""
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
        enc = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        prev = np.where(enc > 0, enc >> 1, 0)
        inc = np.zeros(len(prev), dtype=np.int64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            np.maximum.at(inc, idx, lab)
        improved = inc > prev
        new = np.where(improved, inc * 2 + 1,
                       np.where(enc > 0, (enc >> 1) * 2, 0))
        assert len(prev) == int(n_per_part[part])
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([int(improved.sum())], pa.int64()),
        })

    return combine


@ray.remote
def _fused_widest_loop(view, state_tab: pa.Table, max_iter: int):
    """Fused max-min propagation — one task, bit-equal to the distributed
    superstep loop."""
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _widest_scatter(view)
    combine = _widest_combine(view)
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


def widest_path(graph: Graph, source_vid: int, *, max_iter: int = 10_000,
                metrics_out: list | None = None,
                fused: bool | None = None,
                checkpoint_dir: str | None = None) -> rd.Dataset:
    """Bottleneck / maximin path capacity from ``source_vid``: (vid, width)
    where width(v) = max over paths of the minimum edge weight along the
    path — the max-min semiring twin of :func:`sssp` on a WEIGHTED build
    (the network-capacity / strongest-association signal). The source
    itself is excluded from the output (its capacity is unbounded); per-
    round widths are identical to the dense sweep, so a fixed ``max_iter``
    unroll matches the SQL oracle round-for-round. Unweighted builds
    degrade to reachability (width 1). ``checkpoint_dir``: durable
    supersteps + resume, same store hook as :func:`sssp` (integer max
    reductions — resumed runs bit-equal)."""
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"width": pa.int64()})
    P = graph.P
    s_part, s_local = int(source_vid) % P, int(source_vid) // P

    def init_of(p: int) -> np.ndarray:
        v = np.zeros(int(graph.n_per_part[p]), dtype=np.int64)
        if p == s_part:
            v[s_local] = _W0 * 2 + 1  # fresh, capacity sentinel
        return v

    state = init_state(graph, init_of, dtype=pa.int64())
    store = None
    start_iter = 0
    if checkpoint_dir:
        from ..checkpoint import CheckpointStore, graph_fingerprint

        store = CheckpointStore(checkpoint_dir, "widest",
                                graph_fingerprint(graph),
                                {"source_vid": int(source_vid)})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('widest', start_iter, max_iter)

    def decode_f(batch: pa.Table) -> pa.Table:
        enc = batch["width"].to_numpy(zero_copy_only=False)
        vid = batch["vid"].to_numpy(zero_copy_only=False)
        keep = (enc > 0) & (vid != int(source_vid))
        return pa.table({
            "vid": pa.array(vid[keep], pa.int64()),
            "width": pa.array(enc[keep] >> 1, pa.int64()),
        })

    from .bsp import fused_eligible, graph_view, state_table

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_widest_loop.remote(
            graph_view(graph), state_table(state), max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        state = rd.from_arrow(final_tab)
        out = state_to_vertex_table(state, graph, "vec", "width")
        return out.map_batches(decode_f, batch_format="pyarrow")

    from .bsp import actor_engine_enabled, actor_int_loop

    if actor_engine_enabled(graph):
        tab, _ = actor_int_loop(graph, state, _widest_scatter,
                                _widest_combine, max_iter=max_iter,
                                metrics_out=metrics_out,
                                store=store, start_iter=start_iter)
        out = state_to_vertex_table(rd.from_arrow(tab), graph, "vec",
                                    "width")
        return out.map_batches(decode_f, batch_format="pyarrow")

    scatter = _widest_scatter(graph)
    combine = _widest_combine(graph)
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
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if changed == 0:
            break

    out = state_to_vertex_table(state, graph, "vec", "width")
    return out.map_batches(decode_f, batch_format="pyarrow")
