"""Power-iteration PageRank as Ray-Data superstep rounds.

Per superstep (SURVEY §7.2 step 5):

  1. dangling mass: tiny map+sum over the state rows (driver scalar) —
     the reference's "driver-held convergence scalars" pattern.
  2. scatter: ``state.map_batches`` — each partition's CSR chunks are read
     zero-copy from the object store; contributions ``score/out_deg`` are
     pre-aggregated per (src_part -> dst_part) segment with ``np.bincount``
     and emitted *sparse* (idx, val). This is the combiner/salt step: a hub
     destination receives at most P partial rows however large its in-degree
     (SURVEY §7.5 hub splitting with salt = src_part).
  3. the superstep's single shuffle: ``groupby("dst_part")``.
  4. combine: ordered deterministic reduction (rows sorted by
     (kind, src_part, sub); float64 accumulators; ``np.add.at`` sequential)
     -> new scores + per-partition L1 delta.

Determinism (SURVEY §7.6 risk 1): fixed partition count, fixed reduction
order, float64 everywhere => bit-stable across runs and parallelism levels;
matches the sequential oracle within allclose 1e-6 at convergence.

Invariant: scores sum to 1 after every superstep (dangling-mass
redistribution) — checked in tests, mirroring the reference's per-section
invariant columns.

Reference parity: iterative global analytics with carried state and
convergence gates — the FLUSS/matrix-profile global pass
(porcine/stumpy_fluss_phase_angle.py:574-649) and the history-fed staleness
gates (peak_detect_v4.py:1733-1746), redesigned order-independent
(SURVEY §2.10, §7.0).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..checkpoint import CheckpointStore, graph_fingerprint
from ..graph import Graph
from .bsp import (
    get_blocks,
    init_state,
    iter_state_rows,
    partial_row,
    partials_table,
    state_to_vertex_table,
)


def _make_scatter(graph: Graph):
    refs = graph.blocks
    P = graph.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        from .bsp import iter_chunk_rows

        rows = []
        for part, sub, scores in iter_chunk_rows(batch):
            if sub < 0:
                # carrier row: previous state (dangling handled by the
                # pre-pass in pagerank())
                rows.append(partial_row(part, -1, -1, 1, vec=scores))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue  # plain-row shape on a blockless partition
            blk = _ray.get(chunks[sub])
            if blk.w is not None:
                # weighted: score mass splits by edge multiplicity
                # (score/wdeg per unit weight, times w per slot); dangling
                # set is unchanged (deg == 0 iff wdeg == 0)
                wdeg = blk.wdeg
                # safe divide (float weights can have 0 < wdeg < 1)
                w = np.where(wdeg > 0,
                             scores / np.where(wdeg > 0, wdeg, 1.0), 0.0)
                vals = w[blk.src_local] * blk.w
            else:
                deg = blk.deg
                w = np.where(deg > 0, scores / np.maximum(deg, 1), 0.0)
                vals = w[blk.src_local]
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg_dst = blk.dst_local[lo:hi]
                acc = np.bincount(seg_dst, weights=vals[lo:hi])
                nz = np.flatnonzero(acc)
                rows.append(
                    partial_row(q, part, sub, 0,
                                idx=nz.astype(np.int32), vec=acc[nz])
                )
        return partials_table(rows)

    return scatter


def _make_combine(graph: Graph, damping: float, dangling_mass: float,
                  seed: tuple[int, int] | None = None):
    """``seed=None``: uniform teleport (classic PageRank; formula kept
    byte-stable with round 1). ``seed=(part, local)``: personalized
    PageRank — all teleport and dangling mass flows to the seed vertex:
    new_seed = (1-d) + d*(acc_seed + dm), new_other = d*acc_other
    (the exact float sequence the SQL twin mirrors)."""
    n = graph.n
    P = graph.P
    n_per_part = graph.n_per_part
    refs = graph.blocks

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
        prev = np.asarray(
            vec_flat[vec_offs[prev_i]: vec_offs[prev_i + 1]], dtype=np.float64
        )
        acc = np.zeros(n_q, dtype=np.float64)
        for i in range(g.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            val = vec_flat[vec_offs[i]: vec_offs[i + 1]]
            np.add.at(acc, idx, val)
        if seed is None:
            new = (1.0 - damping) / n + damping * (acc + dangling_mass / n)
        elif isinstance(seed, dict):
            # seed SET (TrustRank shape): teleport + dangling mass split
            # over the seeds by weight; float sequence mirrored by the
            # seeded-set SQL oracle (d*contrib + ((1-d) + d*dm)*w)
            new = damping * acc
            if part in seed:
                idxs, ws = seed[part]
                new[idxs] = (damping * acc[idxs]
                             + ((1.0 - damping)
                                + damping * dangling_mass) * ws)
        else:
            new = damping * acc
            if part == seed[0]:
                new[seed[1]] = (1.0 - damping) + damping * (
                    acc[seed[1]] + dangling_mass)
        delta = float(np.abs(new - prev).sum())
        # next superstep's dangling contribution of this partition, computed
        # here so the iteration needs no extra dangling pass (one Dataset
        # execution per superstep)
        import ray as _ray

        if part in refs:
            deg = _ray.get(refs[part][0]).deg
            dm_next = float(new[deg == 0].sum())
        else:
            dm_next = float(new.sum())
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "vec": pa.array([new], pa.list_(pa.float64())),
                "delta": pa.array([delta], pa.float64()),
                "dm": pa.array([dm_next], pa.float64()),
            }
        )

    return combine


def _dangling_pass(graph: Graph) -> "callable":
    refs = graph.blocks

    def dangling_local(batch: pa.Table) -> pa.Table:
        import ray as _ray

        out = []
        for part, scores in iter_state_rows(batch):
            if part in refs:
                deg = _ray.get(refs[part][0]).deg
                out.append(float(scores[deg == 0].sum()))
            else:
                out.append(float(scores.sum()))
        return pa.table({"dm": pa.array(out, pa.float64())})

    return dangling_local


def _actor_pagerank(graph, state, damping, tol, max_iter, seed, start_iter,
                    metrics_out, store=None):
    """Persistent-actor BSP iteration (round 3; VERDICT r2 item #2): the
    same scatter/combine closures as the Dataset path run inside a pool
    of partition-owning actors — state never leaves the pool between
    supersteps and each superstep costs two RPC rounds instead of a
    Dataset execution's fixed ~0.3-0.4 s launch. Per-vertex scores are
    BIT-EQUAL to the Dataset path (identical group rows, identical sorted
    reduction); only the P-element delta/dangling scalar sums may differ
    in float order (same caveat + parity test as the fused path).

    ``store`` (round 5; VERDICT r4 item #1): durable runs keep this
    engine — every ``checkpoint_interval()`` supersteps (and always at
    convergence / max_iter) each actor writes its own partition files
    through the CheckpointStore layout in parallel, then the driver
    commits the manifest. Checkpoint format is identical to the Dataset
    path's, so a run may resume across engines."""
    from .bsp import (actor_checkpoint, actor_dangling_mass,
                      actor_state_table, actor_superstep,
                      checkpoint_interval, start_bsp_actors,
                      stop_bsp_actors)

    actors, parts_of = start_bsp_actors(graph, state, _make_scatter,
                                        _dangling_pass)
    every = checkpoint_interval()
    try:
        dm = actor_dangling_mass(actors)
        for it in range(start_iter + 1, max_iter + 1):
            t0 = time.perf_counter()
            dm_now = dm

            def mk(view, _dm=dm_now):
                return _make_combine(view, damping, _dm, seed=seed)

            delta, dm = actor_superstep(actors, parts_of, mk)
            dt = time.perf_counter() - t0
            metrics = {
                "iter": it, "l1_delta": delta, "dangling_mass": dm,
                "sec": dt, "engine": "actors",
                "edges_per_sec": graph.m / dt if dt > 0 else None,
            }
            if metrics_out is not None:
                metrics_out.append(metrics)
            if store is not None and (delta < tol or it == max_iter
                                      or it % every == 0):
                actor_checkpoint(actors, store, it, metrics)
            if delta < tol:
                break
        final = actor_state_table(actors)
    finally:
        stop_bsp_actors(actors)
    return state_to_vertex_table(rd.from_arrow(final), graph, "vec",
                                 "score")


@ray.remote
def _fused_pagerank(view, state_tab: pa.Table, damping: float, tol: float,
                    max_iter: int, seed, start_iter: int):
    """All supersteps in ONE task (bsp.fused_eligible graphs): same
    scatter/combine closures as the Dataset path, grouped in-memory."""
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _make_scatter(view)
    dangling_local = _dangling_pass(view)
    dm = float(table_scalar_sums(dangling_local(state_tab), ["dm"])["dm"])
    metrics = []
    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.perf_counter()
        combine = _make_combine(view, damping, dm, seed=seed)
        new_state = fused_superstep(state_tab, scatter, combine)
        s = table_scalar_sums(new_state, ["delta", "dm"])
        delta, dm = float(s["delta"]), float(s["dm"])
        state_tab = new_state
        dt = time.perf_counter() - t0
        metrics.append({"iter": it, "l1_delta": delta, "dangling_mass": dm,
                        "sec": dt, "fused": True,
                        "edges_per_sec": view.m / dt if dt > 0 else None})
        if delta < tol:
            break
    return state_tab.select(["part", "vec"]), metrics


def pagerank(
    graph: Graph,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    personalize_vid: int | None = None,
    personalize_vids: "list[int] | None" = None,
    checkpoint_dir: str | None = None,
    metrics_out: list | None = None,
    fused: bool | None = None,
) -> rd.Dataset:
    """Run to convergence; returns per-vertex Dataset (vid, score).

    ``personalize_vid``: personalized PageRank — teleport and dangling
    mass flow to that single vertex (scores = stationary distribution of
    the random walk with restarts at the seed).

    ``personalize_vids``: seed SET with uniform weights (the TrustRank
    shape — restart at a trusted-page set); mutually exclusive with
    ``personalize_vid``.

    With ``checkpoint_dir``, every superstep writes per-partition state +
    manifest; a rerun resumes from the newest complete iteration.
    """
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"score": pa.float64()})
    store = None
    start_iter = 0
    seed = None
    if personalize_vid is not None and personalize_vids is not None:
        raise ValueError("pass personalize_vid OR personalize_vids")
    if personalize_vids is not None:
        vids = sorted(int(v) for v in personalize_vids)
        if not vids:
            raise ValueError("personalize_vids must be non-empty")
        w = 1.0 / len(vids)
        seed = {}
        for v in vids:
            p, loc = v % graph.P, v // graph.P
            seed.setdefault(p, ([], []))
            seed[p][0].append(loc)
            seed[p][1].append(w)
        seed = {p: (np.asarray(i, np.int64), np.asarray(ws, np.float64))
                for p, (i, ws) in seed.items()}

        def init_of(p: int) -> np.ndarray:
            v = np.zeros(int(graph.n_per_part[p]))
            if p in seed:
                v[seed[p][0]] = seed[p][1]
            return v

        state = init_state(graph, init_of)
    elif personalize_vid is not None:
        seed = (int(personalize_vid) % graph.P, int(personalize_vid) // graph.P)

        def init_of(p: int) -> np.ndarray:
            v = np.zeros(int(graph.n_per_part[p]))
            if p == seed[0]:
                v[seed[1]] = 1.0
            return v

        state = init_state(graph, init_of)
    else:
        state = init_state(graph, lambda p: np.full(int(graph.n_per_part[p]), 1.0 / graph.n))
    if checkpoint_dir:
        params = {"damping": damping, "tol": tol}
        if personalize_vid is not None:
            # only stamped when set: classic-PR manifests stay resumable
            params["personalize_vid"] = int(personalize_vid)
        if personalize_vids is not None:
            params["personalize_vids"] = sorted(
                int(v) for v in personalize_vids)
        store = CheckpointStore(
            checkpoint_dir, "pagerank", graph_fingerprint(graph), params,
        )
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('pagerank', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_pagerank.remote(
            graph_view(graph), state_table(state), damping, tol, max_iter,
            seed, start_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        return state_to_vertex_table(rd.from_arrow(final_tab), graph,
                                     "vec", "score")

    from .bsp import actor_engine_enabled

    if actor_engine_enabled(graph):
        return _actor_pagerank(graph, state, damping, tol, max_iter, seed,
                               start_iter, metrics_out, store=store)

    scatter = _make_scatter(graph)
    dangling_local = _dangling_pass(graph)

    # dangling mass of the current state: one explicit pass at start / resume,
    # thereafter carried forward by the combine ("dm" column)
    dm = float(state.map_batches(dangling_local, batch_format="pyarrow").sum("dm"))

    from .bsp import maybe_expand_chunks

    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.perf_counter()
        partials = maybe_expand_chunks(state, graph).map_batches(
            scatter, batch_format="pyarrow", batch_size=1, zero_copy_batch=True
        )
        combine = _make_combine(graph, damping, dm, seed=seed)
        new_state = (
            partials.groupby("dst_part")
            .map_groups(combine, batch_format="pyarrow")
            .materialize()
        )
        scalars = pa.concat_tables(list(
            new_state.select_columns(["delta", "dm"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)
        ))
        delta = float(pa.compute.sum(scalars["delta"]).as_py() or 0.0)
        dm = float(pa.compute.sum(scalars["dm"]).as_py() or 0.0)
        state = new_state
        dt = time.perf_counter() - t0
        metrics = {
            "iter": it,
            "l1_delta": delta,
            "dangling_mass": float(dm),
            "sec": dt,
            "edges_per_sec": graph.m / dt if dt > 0 else None,
        }
        if metrics_out is not None:
            metrics_out.append(metrics)
        if store is not None:
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if delta < tol:
            break

    return state_to_vertex_table(state, graph, "vec", "score")
