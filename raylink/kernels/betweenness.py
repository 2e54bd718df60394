"""Betweenness centrality — Brandes dependency accumulation as BSP rounds.

Landmark-sampled betweenness: for a set of S source vertices, run ONE
forward multi-source BFS that also counts shortest paths (sigma), then a
backward sweep over BFS levels accumulating dependencies

    delta_s(v) = sum_{w : succ of v}  sigma_sv / sigma_sw * (1 + delta_s(w))

and report bc(v) = sum_s delta_s(v) over the sampled sources (equal to
exact Brandes betweenness when the sources are ALL vertices; on
undirected graphs the classic statistic is half this sum — callers
rescale). Paths are counted in float64 (exact up to 2^53 paths).

Physical shape — same as :func:`bfs_hops_multi`: per-partition state is
the row-major flattened (n_local x 3S) matrix [dist | sigma | delta];
every superstep serves all S sources in one traversal, scatter emits
per-(src_part -> dst_part) pre-aggregated SUM partials (a hub's fan-in
stays bounded by P rows), groupby(dst_part) is the superstep's one
shuffle. Forward runs to frontier exhaustion (depth T supersteps);
backward runs exactly T supersteps in descending level order. 2T
supersteps total amortized over S landmarks.

Reference parity: the reference's heaviest global analytic is the
matrix-profile discord scan (porcine/stumpy_discord.py:204-238) — a
global score-accumulation over a sharded structure; betweenness is the
graph-domain analog of that accumulate-then-rank shape (SURVEY §2.5,
§3.3).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..graph import Graph
from .bsp import (
    init_state,
    iter_chunk_rows,
    maybe_expand_chunks,
    partial_row,
    partials_table,
    sum_columns,
)

_INF = np.float64(1e18)


def _layout(vec: np.ndarray, S: int) -> np.ndarray:
    return vec.reshape(-1, 3 * S)


def _scatter(graph: Graph, S: int, forward: bool, t: int):
    """Forward superstep t: slots at dist t-1 scatter their sigma.
    Backward superstep at level t: slots at dist t scatter
    (1 + delta) / sigma. Both SUM per destination slot."""
    refs = graph.blocks
    P = graph.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, sub, vec in iter_chunk_rows(batch, "vec"):
            vec = vec.astype(np.float64, copy=False)
            if sub < 0:
                rows.append(partial_row(part, -1, -1, 1, vec=vec))
                continue
            chunks = refs.get(part, [])
            if sub >= len(chunks):
                continue
            blk = _ray.get(chunks[sub])
            mat = _layout(vec, S)
            dist = mat[:, :S]
            sigma = mat[:, S:2 * S]
            if forward:
                contrib = np.where(dist == t - 1, sigma, 0.0)
            else:
                delta = mat[:, 2 * S:]
                with np.errstate(divide="ignore", invalid="ignore"):
                    g = np.where(dist == t,
                                 (1.0 + delta) / np.where(sigma > 0, sigma,
                                                          1.0), 0.0)
                contrib = g
            vals = contrib[blk.src_local]                  # (m_seg, S)
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg = vals[lo:hi]
                if not seg.any():
                    continue
                seg_dst = blk.dst_local[lo:hi].astype(np.int64)
                width = int(seg_dst.max()) + 1
                acc = np.zeros(width * S, dtype=np.float64)
                flat = (seg_dst[:, None] * S
                        + np.arange(S, dtype=np.int64)[None, :]).ravel()
                np.add.at(acc, flat, seg.ravel())
                nz = np.flatnonzero(acc != 0.0)
                if len(nz):
                    rows.append(partial_row(q, part, sub, 0,
                                            idx=nz.astype(np.int32),
                                            vec=acc[nz]))
        return partials_table(rows)

    return scatter


def _combine(graph: Graph, S: int, forward: bool, t: int):
    n_per_part = graph.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        idx_col = group["idx"].combine_chunks()
        vec_col = group["vec"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        vec_flat = vec_col.flatten().to_numpy(zero_copy_only=False)
        vec_offs = vec_col.offsets.to_numpy(zero_copy_only=False)
        prev = vec_flat[vec_offs[prev_i]: vec_offs[prev_i + 1]].astype(
            np.float64)
        n_slots = int(n_per_part[part]) * S
        acc = np.zeros(n_slots, dtype=np.float64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            val = vec_flat[vec_offs[i]: vec_offs[i + 1]]
            # deterministic ordered reduction: partials arrive in the
            # sort-shuffle's stable (src_part, sub) order
            acc[idx] += val
        mat = _layout(prev.copy(), S)
        dist = mat[:, :S]
        a = acc.reshape(-1, S)
        if forward:
            hit = (dist >= _INF) & (a > 0)
            dist[hit] = np.float64(t)
            mat[:, S:2 * S][hit] = a[hit]
            changed = int(hit.sum())
        else:
            lvl = dist == t - 1
            mat[:, 2 * S:][lvl] += mat[:, S:2 * S][lvl] * a[lvl]
            changed = 0
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([mat.ravel()], pa.list_(pa.float64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return combine


def betweenness(graph: Graph, source_vids, *, max_depth: int = 10_000,
                metrics_out: list | None = None) -> rd.Dataset:
    """(vid, bc) — Brandes dependency sums from the given source set over
    a SYMMETRIC build (use all vertices for exact betweenness; a landmark
    sample for the scalable estimate). bc excludes path endpoints; on an
    undirected graph halve the all-sources sum for the classic value."""
    sources = [int(v) for v in source_vids]
    S = len(sources)
    if S == 0:
        raise ValueError("need at least one source")
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"bc": pa.float64()})
    P = graph.P
    if int(graph.n_per_part.max()) * 3 * S >= (1 << 31):
        raise ValueError("n_local * 3S must stay below 2^31")

    def init_of(p: int) -> np.ndarray:
        m = np.zeros((int(graph.n_per_part[p]), 3 * S), dtype=np.float64)
        m[:, :S] = _INF
        for s_i, sv in enumerate(sources):
            if sv % P == p:
                m[sv // P, s_i] = 0.0          # dist
                m[sv // P, S + s_i] = 1.0      # sigma
        return m.ravel()

    state = init_state(graph, init_of, dtype=pa.float64())

    from .bsp import ActorEngine, actor_engine_enabled

    if actor_engine_enabled(graph):
        # Brandes fwd/bwd sweeps on the persistent pool (round 4): the
        # per-level closures ship per superstep; the combine's ordered
        # reduction keeps dist/sigma/delta bit-equal to the Dataset path
        eng = ActorEngine({"g": graph})
        eng.load("s", state, "float64")
        depth = 0
        for t in range(1, max_depth + 1):
            t0 = time.perf_counter()
            changed = int(eng.superstep(
                lambda v, s=S, t=t: _scatter(v, s, True, t),
                lambda v, s=S, t=t: _combine(v, s, True, t),
                view="g", read={"vec": "s"}, write={"vec": "s"},
                scalar_cols=("changed",), expand=True)[0])
            if metrics_out is not None:
                metrics_out.append({"phase": "fwd", "iter": t,
                                    "changed": changed, "engine": "actors",
                                    "sec": time.perf_counter() - t0})
            if changed == 0:
                break
            depth = t
        for t in range(depth, 0, -1):
            t0 = time.perf_counter()
            eng.superstep(
                lambda v, s=S, t=t: _scatter(v, s, False, t),
                lambda v, s=S, t=t: _combine(v, s, False, t),
                view="g", read={"vec": "s"}, write={"vec": "s"},
                expand=True)
            if metrics_out is not None:
                metrics_out.append({"phase": "bwd", "level": t,
                                    "engine": "actors",
                                    "sec": time.perf_counter() - t0})
        state = eng.dataset("s")
    else:
        def superstep(state, forward, t):
            return (
                maybe_expand_chunks(state, graph)
                .map_batches(_scatter(graph, S, forward, t),
                             batch_format="pyarrow", batch_size=1,
                             zero_copy_batch=True)
                .groupby("dst_part")
                .map_groups(_combine(graph, S, forward, t),
                            batch_format="pyarrow")
                .materialize()
            )

        depth = 0
        for t in range(1, max_depth + 1):
            t0 = time.perf_counter()
            state = superstep(state, True, t)
            changed = int(sum_columns(state, ["changed"])["changed"])
            if metrics_out is not None:
                metrics_out.append({"phase": "fwd", "iter": t,
                                    "changed": changed,
                                    "sec": time.perf_counter() - t0})
            if changed == 0:
                break
            depth = t

        for t in range(depth, 0, -1):
            t0 = time.perf_counter()
            state = superstep(state, False, t)
            if metrics_out is not None:
                metrics_out.append({"phase": "bwd", "level": t,
                                    "sec": time.perf_counter() - t0})

    from .bsp import iter_state_rows

    def expand(batch: pa.Table) -> pa.Table:
        vids, bcs = [], []
        for part, vec in iter_state_rows(batch, "vec"):
            mat = _layout(np.asarray(vec, dtype=np.float64), S)
            dist = mat[:, :S]
            delta = mat[:, 2 * S:]
            # endpoints excluded: a source's own slot (dist 0) contributes
            # nothing; unreachable slots carry delta 0 already
            bc = np.where((dist > 0) & (dist < _INF), delta, 0.0).sum(axis=1)
            vids.append(np.arange(len(bc), dtype=np.int64) * P + part)
            bcs.append(bc)
        if not vids:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "bc": pa.array([], pa.float64())})
        return pa.table({"vid": pa.array(np.concatenate(vids)),
                         "bc": pa.array(np.concatenate(bcs))})

    return state.map_batches(expand, batch_format="pyarrow")
