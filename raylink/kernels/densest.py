"""Densest-subgraph 2-approximation (parallel greedy peeling).

Charikar's greedy (remove the min-degree vertex, track the best density
seen) parallelized MapReduce-style (Bahmani et al., VLDB'12): each round
computes the alive subgraph's average degree and peels EVERY vertex whose
alive-degree is at most the average (keep iff deg * n > 2m — an
integer-exact comparison, the eps=0 instance). Vertices with degree <=
mean always exist, so every round shrinks the alive set; the best
density over rounds is a 2-approximation of the densest subgraph.

Physical shape per round: ONE alive-indicator scatter/combine superstep
(the k-core peeling shuffle, bincount partials — a hub's fan-in is
bounded by P rows) + two driver scalars (2m, n) + a shuffle-free peel
map over the state. Reference parity: global iterative refinement with a
data-driven stopping statistic (adaptive IQR-floor inflation,
peak_detect_v4.py:1064-1081) redesigned order-independent.

Output is the one-row summary (best_round, n_vertices, n_edges,
density_fp); the float division runs on exact integer inputs with the
same expression as the SQL oracle.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..graph import Graph
from .bsp import init_state, iter_chunk_rows, maybe_expand_chunks, sum_columns
from .traversal import _make_alive_scatter


def _deg_combine(graph: Graph):
    """Alive-degree reduction: enc = deg+1 for alive vertices (0 dead),
    plus per-part scalars (sum of alive degrees = local 2m share, alive
    count)."""
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
        alive = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(
            np.int64) > 0
        deg = np.zeros(int(n_per_part[part]), dtype=np.int64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            np.add.at(deg, idx, cnt_flat[cnt_offs[i]: cnt_offs[i + 1]])
        enc = np.where(alive, deg + 1, 0)
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([enc], pa.list_(pa.int64())),
            "s2m": pa.array([int(deg[alive].sum())], pa.int64()),
            "n_alive": pa.array([int(alive.sum())], pa.int64()),
        })

    return combine


def densest_subgraph(graph: Graph, *, rounds: int = 6,
                     metrics_out: list | None = None) -> pa.Table:
    """One-row (best_round, n_vertices, n_edges, density_fp) over a
    SYMMETRIC build: the best average-degree/2 density seen across
    ``rounds`` peels (round 0 = the whole graph; earliest best round on
    float ties — IEEE doubles of identical integers on both sides)."""
    if graph.n == 0:
        return pa.table({"best_round": pa.array([0], pa.int64()),
                         "n_vertices": pa.array([0], pa.int64()),
                         "n_edges": pa.array([0], pa.int64()),
                         "density_fp": pa.array([0], pa.int64())})
    state = init_state(graph,
                       lambda p: np.ones(int(graph.n_per_part[p]), np.int64),
                       dtype=pa.int64())

    from .bsp import ActorEngine, actor_engine_enabled

    hist: list[tuple[int, int, int]] = []  # (round, s=2m, n)
    if actor_engine_enabled(graph):
        # degree superstep + LOCAL threshold peel per round on the
        # persistent pool (round 4) — the peel is a pure per-partition
        # apply, no exchange at all
        eng = ActorEngine({"g": graph})
        eng.load("s", state, "int64")
        for r in range(rounds + 1):
            t0 = time.perf_counter()
            s2m, na = eng.superstep(
                _make_alive_scatter, _deg_combine, view="g",
                read={"vec": "s"}, write={"vec": "s"},
                scalar_cols=("s2m", "n_alive"), expand=True)
            s, n = int(s2m), int(na)
            if metrics_out is not None:
                metrics_out.append({"round": r, "s2m": s, "n_alive": n,
                                    "engine": "actors",
                                    "sec": time.perf_counter() - t0})
            if n == 0:
                break
            hist.append((r, s, n))
            if r == rounds:
                break

            def peel_fn(part, d, s=s, n=n):
                v = d["s"]
                keep = (v > 0) & ((v - 1) * np.int64(n) > np.int64(s))
                return {"s": keep.astype(np.int64), "changed": 0}

            eng.apply(peel_fn, ["s"], ["s"])
    else:
        scatter = _make_alive_scatter(graph)
        combine = _deg_combine(graph)

        for r in range(rounds + 1):
            t0 = time.perf_counter()
            state = (
                maybe_expand_chunks(state, graph)
                .map_batches(scatter, batch_format="pyarrow", batch_size=1,
                             zero_copy_batch=True)
                .groupby("dst_part")
                .map_groups(combine, batch_format="pyarrow")
                .materialize()
            )
            sums = sum_columns(state, ["s2m", "n_alive"])
            s, n = int(sums["s2m"]), int(sums["n_alive"])
            if metrics_out is not None:
                metrics_out.append({"round": r, "s2m": s, "n_alive": n,
                                    "sec": time.perf_counter() - t0})
            if n == 0:
                break
            hist.append((r, s, n))
            if r == rounds:
                break

            def peel(batch: pa.Table, s=s, n=n) -> pa.Table:
                out_cols = {}
                for name in batch.column_names:
                    if name != "vec":
                        out_cols[name] = batch[name]
                col = batch["vec"].combine_chunks()
                flat = col.flatten().to_numpy(zero_copy_only=False)
                offs = col.offsets.to_numpy(zero_copy_only=False)
                keep = (flat > 0) & ((flat - 1) * np.int64(n) > np.int64(s))
                new = keep.astype(np.int64)
                out_cols["vec"] = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(new, pa.int64()))
                return pa.table(out_cols)

            state = (state.map_batches(peel, batch_format="pyarrow")
                     .materialize())

    # earliest best round under IEEE-double density, mirroring the oracle
    best = max(hist, key=lambda t: (np.float64(t[1]) / (2.0 * t[2]), -t[0]))
    density_fp = int(np.floor(np.float64(best[1]) / (2.0 * best[2])
                              * 1e6 + 0.5))
    return pa.table({
        "best_round": pa.array([best[0]], pa.int64()),
        "n_vertices": pa.array([best[2]], pa.int64()),
        "n_edges": pa.array([best[1] // 2], pa.int64()),
        "density_fp": pa.array([density_fp], pa.int64()),
    })
