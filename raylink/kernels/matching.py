"""Maximal matching — deterministic handshake (locally-dominant edges).

Each vertex carries a fixed arithmetic priority derived from its integer
KEY so an unrolled SQL oracle replays the identical rounds:
pi(v) = (key*48271 + 12345) mod p, p = 2147483647. For keys in [0, p)
multiplication by 48271 (coprime to the prime p) is a bijection mod p, so
pi is INJECTIVE and, crucially, INVERTIBLE: key = (pi - 12345) * 48271^-1
mod p — a vertex that learns the min priority among its live neighbors
knows that neighbor's key without any extra lookup.

One round = two min-scatter supersteps over the symmetric build (the
BFS/SSSP physical shape — per-(src_part -> dst_part) min pre-aggregation
bounds any hub's fan-in to P rows):

  A (prefer):   live v scatters pi(v). A live receiver with min incoming
                m points at its min-priority live neighbor; no incoming
                (all neighbors decided) -> UNMATCHED, final.
  B (handshake): live v scatters z(v) = (MASK - m(v)) * 2^31 + pi(v) —
                senders sorted by DESCENDING preference m first. For every
                live neighbor u of v, m(u) <= pi(v) (v is in u's live
                neighborhood), so the min incoming z at v is achieved by a
                "suitor" (m(u) == pi(v)) whenever one exists, and among
                suitors by the one with min pi. v matches iff that decoded
                (m, pi) equals (pi(v), m(v)) — i.e. v's own preferred
                neighbor proposed back. Mutuality is symmetric, so both
                endpoints decide MATCHED in the same superstep and record
                partner = pi^-1(m(v)).

While any live edge remains, the live vertex with globally minimal pi is
preferred by ALL its live neighbors and prefers one of them, so at least
one edge matches per round — termination in <= n/2 + 1 rounds, O(log n)
expected on scrambled priorities. ``max_iter`` caps rounds for
fixed-unroll SQL-oracle parity (extra rounds past the fixpoint are
no-ops; vertices still live at the cap report partner -1, exactly like
the oracle's COALESCE).

Reference parity: greedy conflict-free pairing mirrors the reference's
keep-best non-overlapping detection gates (peak_detect_v4.py:235-368)
redesigned order-independent per SURVEY §2.10/§7.0.

State encoding (one int64 per vertex):
  s <= -2  MATCHED, partner key = -s - 2
  s == -1  UNMATCHED (no live neighbor left), final
  s >= 0   live; phase A holds pi(v), phase B holds pi(v)*2^31 + m(v)
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

_INF = np.int64(1 << 62)
_P_MOD = np.int64(2147483647)
_MASK31 = np.int64((1 << 31) - 1)
_SHIFT = np.int64(31)
# 48271^-1 mod 2147483647 (Fermat) — makes pi invertible on the engine side
_INV_A = np.int64(pow(48271, 2147483647 - 2, 2147483647))


def _pi(keys: np.ndarray) -> np.ndarray:
    keys = keys.astype(np.int64, copy=False)
    if len(keys) and (keys.min() < 0 or keys.max() >= _P_MOD):
        raise ValueError(
            "matching priorities require integer keys in [0, 2147483647) "
            "so pi(key) = (key*48271 + 12345) mod p is a bijection both "
            "engines can invert")
    return (keys * np.int64(48271) + np.int64(12345)) % _P_MOD


def _pi_inv(pis: np.ndarray) -> np.ndarray:
    return ((pis - np.int64(12345)) % _P_MOD) * _INV_A % _P_MOD


def _match_scatter(graph: Graph, phase: str):
    """Phase A scatters pi(v) from live vertices; phase B scatters the
    handshake code z(v) = (MASK - m) << 31 | pi. Decided vertices (s < 0)
    scatter nothing."""
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
            live = vec >= 0
            if not live.any():
                continue
            if phase == "A":
                out = np.where(live, vec, _INF)
            else:
                pi_v = vec >> _SHIFT
                m_v = vec & _MASK31
                out = np.where(live, ((_MASK31 - m_v) << _SHIFT) | pi_v,
                               _INF)
            blk = _ray.get(chunks[sub])
            vals = out[blk.src_local]
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


def _unwrap(group: pa.Table):
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
    return part, prev, inc


def _match_combine(graph: Graph, phase: str):
    n_per_part = graph.n_per_part

    def combine(group: pa.Table) -> pa.Table:
        part, prev, inc = _unwrap(group)
        live = prev >= 0
        new = prev.copy()
        if phase == "A":
            # no live incoming -> no live neighbor -> unmatched, final
            dead = live & (inc == _INF)
            arm = live & ~dead
            new[dead] = -1
            new[arm] = (prev[arm] << _SHIFT) | inc[arm]
            changed = int(dead.sum())
        else:
            pi_v = prev >> _SHIFT
            m_v = prev & _MASK31
            mpart = _MASK31 - (inc >> _SHIFT)
            ppart = inc & _MASK31
            ok = live & (inc != _INF) & (mpart == pi_v) & (ppart == m_v)
            back = live & ~ok
            new[ok] = -(_pi_inv(m_v[ok]) + 2)
            new[back] = pi_v[back]  # revert to phase-A encoding
            changed = int(ok.sum())
        assert len(prev) == int(n_per_part[part])
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "vec": pa.array([new], pa.list_(pa.int64())),
            "changed": pa.array([changed], pa.int64()),
        })

    return combine


@ray.remote
def _fused_matching_loop(view, state_tab: pa.Table, max_iter: int):
    from .bsp import fused_superstep, table_scalar_sums

    sa, ca = _match_scatter(view, "A"), _match_combine(view, "A")
    sb, cb = _match_scatter(view, "B"), _match_combine(view, "B")
    metrics = []
    for it in range(1, max_iter + 1):
        t0 = time.perf_counter()
        state_tab = fused_superstep(state_tab, sa, ca)
        ch_a = int(table_scalar_sums(state_tab, ["changed"])["changed"])
        state_tab = fused_superstep(state_tab, sb, cb)
        ch_b = int(table_scalar_sums(state_tab, ["changed"])["changed"])
        metrics.append({"iter": it, "changed": ch_a + ch_b, "fused": True,
                        "sec": time.perf_counter() - t0})
        if ch_a + ch_b == 0:
            break
    return state_tab.select(["part", "vec"]), metrics


def maximal_matching(graph: Graph, *, max_iter: int = 64,
                     metrics_out: list | None = None,
                     fused: bool | None = None) -> rd.Dataset:
    """(vid, partner) over a SYMMETRIC self-loop-free build: partner is
    the matched neighbor's integer key, or -1 for vertices left unmatched
    by the deterministic handshake matching (including any still live at
    the ``max_iter`` cap, exactly like the fixed-unroll SQL oracle's
    COALESCE(s, -1)). The matching is maximal at the fixpoint: both
    endpoints of every surviving edge are matched (to someone)."""
    if graph.n == 0:
        from .bsp import empty_vertex_result

        return empty_vertex_result({"partner": pa.int64()})
    if not pa.types.is_integer(graph.key_type):
        raise TypeError("maximal_matching requires integer vertex keys "
                        "(priorities are arithmetic in the key)")

    def enc_f(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vid": batch["vid"],
            "enc": pa.array(_pi(keys), pa.int64()),
        })

    vt = graph.vertices.map_batches(enc_f, batch_format="pyarrow")
    state = vertex_table_to_state(vt, graph, "enc", pa.int64()).materialize()

    from .bsp import fused_eligible, graph_view, state_table

    from .bsp import ActorEngine, actor_engine_enabled

    if fused_eligible(graph, fused):
        final_tab, metrics = ray.get(_fused_matching_loop.remote(
            graph_view(graph), state_table(state), max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        state = rd.from_arrow(final_tab)
    elif actor_engine_enabled(graph):
        # A/B half-steps alternate on the persistent pool (round 4)
        eng = ActorEngine({"g": graph})
        eng.load("s", state, "int64")
        for it in range(1, max_iter + 1):
            t0 = time.perf_counter()
            total = 0
            for ph in ("A", "B"):
                total += int(eng.superstep(
                    lambda v, ph=ph: _match_scatter(v, ph),
                    lambda v, ph=ph: _match_combine(v, ph),
                    view="g", read={"vec": "s"}, write={"vec": "s"},
                    scalar_cols=("changed",), expand=True)[0])
            if metrics_out is not None:
                metrics_out.append({"iter": it, "changed": total,
                                    "engine": "actors",
                                    "sec": time.perf_counter() - t0})
            if total == 0:
                break
        state = eng.dataset("s")
    else:
        sa, ca = _match_scatter(graph, "A"), _match_combine(graph, "A")
        sb, cb = _match_scatter(graph, "B"), _match_combine(graph, "B")
        for it in range(1, max_iter + 1):
            t0 = time.perf_counter()
            total = 0
            for sc, cm in ((sa, ca), (sb, cb)):
                state = (
                    maybe_expand_chunks(state, graph)
                    .map_batches(sc, batch_format="pyarrow", batch_size=1,
                                 zero_copy_batch=True)
                    .groupby("dst_part")
                    .map_groups(cm, batch_format="pyarrow")
                    .materialize()
                )
                total += int(sum_columns(state, ["changed"])["changed"])
            if metrics_out is not None:
                metrics_out.append({"iter": it, "changed": total,
                                    "sec": time.perf_counter() - t0})
            if total == 0:
                break
        state = state.select_columns(["part", "vec"])

    out = state_to_vertex_table(state, graph, "vec", "enc")

    def decode(batch: pa.Table) -> pa.Table:
        s = batch["enc"].to_numpy(zero_copy_only=False).astype(np.int64)
        partner = np.where(s <= -2, -s - 2, np.int64(-1))
        return pa.table({
            "vid": batch["vid"],
            "partner": pa.array(partner, pa.int64()),
        })

    return out.map_batches(decode, batch_format="pyarrow")
