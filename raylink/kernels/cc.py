"""Connected components: min-label propagation supersteps, exact fixpoint.

Runs on a *symmetric* graph build (``build_graph(..., symmetric=True)``).
Integer min is order-free, so the kernel is exactly deterministic with no
float caveats; canonical output label = min vid of the component, matching
the oracle bit-for-bit.

Superstep: scatter emits per (src_part -> dst_part) the *elementwise min*
label per destination vertex (pre-aggregation again bounds any hub's fan-in
to P partial rows); combine takes min(prev, partial mins) and counts
changes; driver stops at zero changes (global fixpoint).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

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

        rows = []
        for part, labels in iter_state_rows(batch, "vec"):
            labels = labels.astype(np.int64, copy=False)
            for sub, ref in enumerate(refs.get(part, [])):
                blk = _ray.get(ref)
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
            rows.append(partial_row(part, -1, -1, 1, lab=labels))
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


def connected_components(
    graph: Graph,
    *,
    max_iter: int = 10_000,
    init: str = "vid",
    checkpoint_dir: str | None = None,
    metrics_out: list | None = None,
) -> rd.Dataset:
    """Per-vertex Dataset (vid, comp). ``graph`` must be a symmetric build.

    ``init="vid"``: canonical component label = min vid (oracle-exact).
    ``init="key"``: labels start from int64 vertex keys, so the component
    label is the min *key* — matches relational (SQL) formulations directly.
    """
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
            checkpoint_dir, "cc", graph_fingerprint(graph), {"init": init}
        )
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed

    scatter = _make_scatter(graph)
    combine = _make_combine(graph)

    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.perf_counter()
        new_state = (
            state.map_batches(scatter, batch_format="pyarrow", batch_size=1,
                              zero_copy_batch=True)
            .groupby("dst_part")
            .map_groups(combine, batch_format="pyarrow")
            .materialize()
        )
        changed = int(new_state.sum("changed") or 0)
        state = new_state
        dt = time.perf_counter() - t0
        metrics = {"iter": it, "changed": changed, "sec": dt,
                   "edges_per_sec": graph.m / dt if dt > 0 else None}
        if metrics_out is not None:
            metrics_out.append(metrics)
        if store is not None:
            store.save(it, state.select_columns(["part", "vec"]), metrics)
        if changed == 0:
            break

    return state_to_vertex_table(state, graph, "vec", "comp")
