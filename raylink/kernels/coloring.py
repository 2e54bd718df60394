"""Distance-1 graph coloring — Jones-Plassmann BSP with deterministic
priorities.

Priorities are the same arithmetic (priority, key) total order as the MIS
kernel (combined(v) = ((key*48271 + 12345) mod 2147483647 + 1)*2^31 + key,
keys < 2^31), so an unrolled SQL oracle replays the exact rounds. Each
round, an uncolored vertex with NO uncolored higher-priority neighbor
takes the smallest color not used by its (already colored, necessarily
higher-priority) neighbors. A lower-priority neighbor can never color
first — it waits on this vertex — so avoiding colored neighbors equals
avoiding colored higher-priority neighbors, and the result is a proper
distance-1 coloring with at most maxdeg+1 colors.

One scatter per round with TWO pre-aggregated channels per
(src_part -> dst_part) segment:

- lab: MIN of uncolored senders' combined priorities (blocks receivers
  with smaller priority),
- cnt: bit-OR of colored senders' LOW color bits (1 << color, colors
  0..61),
- kind=2 spill rows: distinct (receiver, color) pairs for colors >= 62,
  so the palette is UNBOUNDED — a receiver whose 62 low colors are all
  taken computes an exact mex over its sorted spilled colors. Spill
  volume is bounded by distinct high colors per receiver per source
  partition (web hubs can legitimately force >62 colors; the common case
  still ships one packed word per receiver per segment).

State encoding (one int64 per vertex): values < 2^31 are assigned
colors; values >= 2^31 are combined priorities of still-uncolored
vertices.

Reference parity: conflict-free greedy assignment over a priority order
mirrors the reference's keep-best non-overlapping detection gates
(peak_detect_v4.py:235-368); SURVEY §2.10 order-independent redesign.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph
from .bsp import (
    iter_chunk_rows,
    maybe_expand_chunks,
    partial_row,
    partials_table,
    state_to_vertex_table,
    sum_columns,
    vertex_table_to_state,
)
from .mis import _combined

_INF = np.int64(1 << 62)
_UNDEC_MIN = np.int64(1) << 31
_SPILL_BASE = np.int64(62)           # colors below: bitmask; at/above: spill
_FULL_LOW = np.int64((1 << 62) - 1)  # all low colors taken -> consult spill


def _jp_scatter(graph: Graph):
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
            vals = vec[blk.src_local]
            undec = vals >= _UNDEC_MIN
            minv = np.where(undec, vals, _INF)
            # colors 0..61 travel as bits in the compact cnt channel;
            # colors >= 62 spill to explicit (receiver, color) pairs
            # (kind=2 rows) so the palette is unbounded, not capped at
            # the int64 word (web hubs can legitimately force >62 colors)
            low = (~undec) & (vals < _SPILL_BASE)
            maskv = np.where(low, np.int64(1) << np.where(low, vals, 0),
                             np.int64(0))
            high = (~undec) & (vals >= _SPILL_BASE)
            for q in range(P):
                lo, hi = blk.bounds[q], blk.bounds[q + 1]
                if hi <= lo:
                    continue
                seg_dst = blk.dst_local[lo:hi]
                width = int(seg_dst.max()) + 1
                accm = np.full(width, _INF, dtype=np.int64)
                np.minimum.at(accm, seg_dst, minv[lo:hi])
                acco = np.zeros(width, dtype=np.int64)
                np.bitwise_or.at(acco, seg_dst, maskv[lo:hi])
                nz = np.flatnonzero((accm != _INF) | (acco != 0))
                if len(nz):
                    rows.append(partial_row(q, part, sub, 0,
                                            idx=nz.astype(np.int32),
                                            lab=accm[nz], cnt=acco[nz]))
                hs = np.flatnonzero(high[lo:hi])
                if len(hs):
                    # distinct (dst_local, color) pairs per segment: the
                    # spill volume is bounded by distinct colors seen per
                    # receiver per source partition, never raw edges
                    code = (seg_dst[hs].astype(np.int64) << np.int64(32)
                            ) | vals[lo:hi][hs]
                    code = np.unique(code)
                    rows.append(partial_row(
                        q, part, sub, 2,
                        idx=(code >> np.int64(32)).astype(np.int32),
                        lab=code & np.int64(0xFFFFFFFF)))
        return partials_table(rows)

    return scatter


def _jp_combine(graph: Graph):
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
        accm = np.full(len(prev), _INF, dtype=np.int64)
        acco = np.zeros(len(prev), dtype=np.int64)
        spill_codes = []
        for i in range(group.num_rows):
            if kinds[i] == 2:  # spilled high colors: (receiver << 32) | color
                idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
                spill_codes.append(
                    (idx << np.int64(32))
                    | lab_flat[lab_offs[i]: lab_offs[i + 1]])
                continue
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            np.minimum.at(accm, idx, lab_flat[lab_offs[i]: lab_offs[i + 1]])
            np.bitwise_or.at(acco, idx, cnt_flat[cnt_offs[i]: cnt_offs[i + 1]])
        und = prev >= _UNDEC_MIN
        ready = und & (accm > prev)  # no uncolored higher-priority neighbor
        mask = acco[ready].astype(np.uint64)
        lzb = (~mask) & (mask + np.uint64(1))
        color = np.round(np.log2(lzb.astype(np.float64))).astype(np.int64)
        # vertices whose 62 low colors are all taken: exact mex over the
        # spilled >=62 neighbor colors (unbounded palette, no word cap)
        sat = np.flatnonzero(acco[ready] == _FULL_LOW)
        if len(sat):
            ready_idx = np.flatnonzero(ready)
            codes = (np.unique(np.concatenate(spill_codes))
                     if spill_codes else np.empty(0, np.int64))
            s_idx = codes >> np.int64(32)
            s_col = codes & np.int64(0xFFFFFFFF)
            starts = np.searchsorted(s_idx, ready_idx[sat])
            ends = np.searchsorted(s_idx, ready_idx[sat], side="right")
            for j, (lo2, hi2) in enumerate(zip(starts, ends)):
                cols = s_col[lo2:hi2]  # sorted distinct colors >= 62
                pos = np.flatnonzero(cols != _SPILL_BASE + np.arange(len(cols)))
                color[sat[j]] = (_SPILL_BASE + (pos[0] if len(pos)
                                                else len(cols)))
        new = prev.copy()
        new[ready] = color
        changed = int(ready.sum())
        assert len(prev) == int(n_per_part[part])
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return combine


@ray.remote
def _fused_jp_loop(view, state_tab: pa.Table, max_iter: int):
    from .bsp import fused_superstep, table_scalar_sums

    scatter = _jp_scatter(view)
    combine = _jp_combine(view)
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


def graph_coloring(graph: Graph, *, max_iter: int = 128,
                   metrics_out: list | None = None,
                   fused: bool | None = None,
                   checkpoint_dir: str | None = None) -> rd.Dataset:
    """(vid, color) over a SYMMETRIC build: a proper distance-1 coloring
    (adjacent vertices always differ) using at most maxdeg+1 colors
    (unbounded palette — colors >= 62 ride the spill channel). Vertices
    still uncolored when ``max_iter`` cuts convergence short report
    color -1, exactly like the fixed-unroll SQL oracle.
    ``checkpoint_dir``: durable rounds + resume (the spill channel lives
    inside a superstep's exchange, so the carried (part, vec) state is
    the complete resume point)."""
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"color": pa.int64()})
    if not pa.types.is_integer(graph.key_type):
        raise TypeError("graph_coloring requires integer vertex keys "
                        "(priorities are arithmetic in the key)")

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

        store = CheckpointStore(checkpoint_dir, "coloring",
                                graph_fingerprint(graph), {})
        resumed = store.latest()
        if resumed is not None:
            start_iter, state = resumed
            from ..checkpoint import check_resume_bound

            check_resume_bound('coloring', start_iter, max_iter)

    from .bsp import fused_eligible, graph_view, state_table

    from .bsp import actor_engine_enabled, actor_int_loop

    if store is None and fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_jp_loop.remote(
            graph_view(graph), state_table(state), max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        state = rd.from_arrow(final_tab)
    elif actor_engine_enabled(graph):
        tab, _ = actor_int_loop(graph, state, _jp_scatter, _jp_combine,
                                max_iter=max_iter, metrics_out=metrics_out,
                                store=store, start_iter=start_iter)
        state = rd.from_arrow(tab)
    else:
        scatter = _jp_scatter(graph)
        combine = _jp_combine(graph)
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

    def finish(batch: pa.Table) -> pa.Table:
        enc = batch["enc"].to_numpy(zero_copy_only=False)
        color = np.where(enc < _UNDEC_MIN, enc, np.int64(-1))
        return pa.table({"vid": batch["vid"],
                         "color": pa.array(color, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")
