"""Strongly connected components (web bow-tie analysis): forward-backward
min-label coloring with trim, as BSP superstep rounds over a fwd/rev CSR
pair (:func:`raylink.graph.build_graph_fwd_rev` — one pack shuffle builds
both directions over a shared vertex dictionary).

Algorithm (the Pregel/Orzan coloring scheme, exact):

  round:
    trim   — iteratively assign any ACTIVE vertex with zero active
             in-degree or zero active out-degree as a singleton SCC
             (whole SCCs of already-finished vertices were removed, so
             such a vertex cannot lie on an active cycle). Peels DAG
             regions without touching the heavier phases.
    F      — min-label propagation along FWD edges over active vertices
             to fixpoint: col(v) = min active label that reaches v.
             Color classes partition the active set and every SCC lies
             entirely inside one class (if u ~ v then any w reaching u
             reaches v, so col(u) == col(v)).
    B      — backward confirm: roots (col(v) == own label) flood their
             color along REV edges, accepted only where the receiver's
             col matches — confirmed vertices are exactly SCC(root),
             because every intermediate vertex of a path v -> root lies
             in the same color class (see proof in VERDICT-cited
             literature; restriction to the class is lossless).
    assign — scc(v) = col(v) for confirmed vertices; they leave the
             active set. Every non-empty class confirms at least its
             root, so the outer loop terminates.

Integer min/any reductions, so the kernel is exactly deterministic; with
``init="key"`` the final label is the min vertex *key* of the SCC (the SQL
formulation), with ``init="vid"`` the min vid.

Skew/partitioning notes: scatters pre-aggregate per (src_part -> dst_part)
segment — F ships per-dst min labels (<= P rows per hub), B ships DISTINCT
(dst, color) pairs, trim ships per-dst active-degree counts. State is P
dense rows; the only driver values are changed/trimmed/remaining scalars.

Diameter assumption: F/B supersteps scale with the active subgraph's
diameter, the standard regime for web graphs (small-world, ~tens of hops;
measured: 100k-vertex/600k-edge random digraph = 1 round, 21 supersteps).
A pathological high-diameter cycle (e.g. a 10^4-ring) degrades to O(n)
supersteps — the pointer-jumping acceleration CC uses does not transfer
directly because SCC labels must stay reachability-faithful per phase;
a condensation-DAG hybrid is ROADMAP work.

Reference parity: convergence-gated iteration with carried state per
SURVEY §2.10/§7.6 (the reference's gated refit loops), redesigned
order-independent.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph
from .bsp import (
    empty_vertex_result,
    init_state,
    iter_state_rows,
    key_init_state,
    partial_row,
    partials_table,
    state_to_vertex_table,
    sum_columns,
)

SENT = np.iinfo(np.int64).max


# ---------------------------------------------------------------------------
# scatter / combine factories (shared verbatim by distributed + fused paths)
# ---------------------------------------------------------------------------

def _min_scatter(view):
    """F phase: per (part -> q) segment, elementwise-min label per dst.
    SENT sources are inert (min with SENT is identity)."""
    refs = view.blocks
    P = view.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, labels in iter_state_rows(batch, "vec"):
            labels = labels.astype(np.int64, copy=False)
            rows.append(partial_row(part, -1, -1, 1, lab=labels))
            for sub, ref in enumerate(refs.get(part, [])):
                blk = _ray.get(ref)
                vals = labels[blk.src_local]
                for q in range(P):
                    lo, hi = blk.bounds[q], blk.bounds[q + 1]
                    if hi <= lo:
                        continue
                    seg_dst = blk.dst_local[lo:hi]
                    acc = np.full(int(seg_dst.max()) + 1, SENT, np.int64)
                    np.minimum.at(acc, seg_dst, vals[lo:hi])
                    nz = np.flatnonzero(acc != SENT)
                    if len(nz):
                        rows.append(partial_row(q, part, sub, 0,
                                                idx=nz.astype(np.int32),
                                                lab=acc[nz]))
        return partials_table(rows)

    return scatter


def _min_combine(gate_sent: bool = True):
    """F phase: new = min(prev, incoming); with ``gate_sent`` finished
    vertices (prev == SENT) stay SENT (SCC coloring), without it SENT is
    an ordinary +inf (reachability flooding)."""

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
        prev = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        new = prev.copy()
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            np.minimum.at(new, idx, lab)
        if gate_sent:
            new[prev == SENT] = SENT  # finished vertices never re-enter
        changed = int((new != prev).sum())
        return pa.table({"part": pa.array([part], pa.int64()),
                         "vec": pa.array([new], pa.list_(pa.int64())),
                         "changed": pa.array([changed], pa.int64())})

    return combine


def _conf_scatter(view):
    """B phase: confirmed sources flood their color along the REV CSR as
    DISTINCT (dst, color) pairs per segment. State rows carry (vec=ccol,
    colv=col); the carrier forwards both."""
    refs = view.blocks
    P = view.P

    def scatter(batch: pa.Table) -> pa.Table:
        ccols = {p: v for p, v in iter_state_rows(batch, "vec")}
        cols = {p: v for p, v in iter_state_rows(batch, "colv")}
        import ray as _ray

        rows = []
        for part, ccol in ccols.items():
            ccol = ccol.astype(np.int64, copy=False)
            rows.append(partial_row(part, -1, -1, 1, lab=ccol,
                                    cnt=cols[part].astype(np.int64,
                                                          copy=False)))
            for sub, ref in enumerate(refs.get(part, [])):
                blk = _ray.get(ref)
                vals = ccol[blk.src_local]
                for q in range(P):
                    lo, hi = blk.bounds[q], blk.bounds[q + 1]
                    if hi <= lo:
                        continue
                    m = vals[lo:hi] != SENT
                    if not m.any():
                        continue
                    pairs = np.unique(np.column_stack(
                        [blk.dst_local[lo:hi][m].astype(np.int64),
                         vals[lo:hi][m]]), axis=0)
                    rows.append(partial_row(q, part, sub, 0,
                                            idx=pairs[:, 0].astype(np.int32),
                                            lab=pairs[:, 1]))
        return partials_table(rows)

    return scatter


def _conf_combine():
    """B phase: unconfirmed receiver joins when an incoming color equals
    its own col (finished vertices have col == SENT, which no real color
    matches — natural gating)."""

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
        col = cnt_flat[cnt_offs[prev_i]: cnt_offs[prev_i + 1]].astype(np.int64)
        new = prev.copy()
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]]
            hit = idx[(col[idx] == lab) & (new[idx] == SENT)]
            new[hit] = col[hit]
        changed = int((new != prev).sum())
        return pa.table({"part": pa.array([part], pa.int64()),
                         "vec": pa.array([new], pa.list_(pa.int64())),
                         "colv": pa.array([col], pa.list_(pa.int64())),
                         "changed": pa.array([changed], pa.int64())})

    return combine


def _deg_scatter(view):
    """Trim: per-dst count of ACTIVE in-neighbors over this view's CSR
    (feed the rev view to get active out-degrees). State vec = 0/1."""
    refs = view.blocks
    P = view.P

    def scatter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rows = []
        for part, act in iter_state_rows(batch, "vec"):
            act = act.astype(np.int64, copy=False)
            rows.append(partial_row(part, -1, -1, 1, lab=act))
            for sub, ref in enumerate(refs.get(part, [])):
                blk = _ray.get(ref)
                vals = act[blk.src_local]
                for q in range(P):
                    lo, hi = blk.bounds[q], blk.bounds[q + 1]
                    if hi <= lo:
                        continue
                    seg_dst = blk.dst_local[lo:hi]
                    acc = np.bincount(seg_dst, weights=vals[lo:hi])
                    nz = np.flatnonzero(acc)
                    if len(nz):
                        rows.append(partial_row(
                            q, part, sub, 0, idx=nz.astype(np.int32),
                            cnt=acc[nz].astype(np.int64)))
        return partials_table(rows)

    return scatter


def _deg_combine():
    def combine(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        idx_col = group["idx"].combine_chunks()
        cnt_col = group["cnt"].combine_chunks()
        idx_flat = idx_col.flatten().to_numpy(zero_copy_only=False)
        idx_offs = idx_col.offsets.to_numpy(zero_copy_only=False)
        cnt_flat = cnt_col.flatten().to_numpy(zero_copy_only=False)
        cnt_offs = cnt_col.offsets.to_numpy(zero_copy_only=False)
        lab_col = group["lab"].combine_chunks()
        lab_offs = lab_col.offsets.to_numpy(zero_copy_only=False)
        n_q = int(lab_offs[prev_i + 1] - lab_offs[prev_i])
        deg = np.zeros(n_q, np.int64)
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            deg[idx] += cnt_flat[cnt_offs[i]: cnt_offs[i + 1]]
        return pa.table({"part": pa.array([part], pa.int64()),
                         "vec": pa.array([deg], pa.list_(pa.int64()))})

    return combine


# ---------------------------------------------------------------------------
# distributed state merges (union + P-group shuffle; nothing driver-sized)
# ---------------------------------------------------------------------------

def _merge_states(tagged: list[tuple[int, rd.Dataset, list[str]]], fn,
                  out_cols: list[str]) -> rd.Dataset:
    """Union state datasets (tag t per input; each contributes its listed
    list<int64> columns renamed c0..ck) -> groupby(part) -> fn(part,
    {(t, col): vec}) -> one output row per part with ``out_cols`` list
    columns + a 'changed' scalar."""
    parts = []
    for t, ds, cols in tagged:
        def project(batch: pa.Table, t=t, cols=cols) -> pa.Table:
            out = {"part": batch["part"], "t": pa.array(
                np.full(batch.num_rows, t, np.int64))}
            for j in range(4):
                if j < len(cols):
                    out[f"c{j}"] = batch[cols[j]].cast(pa.list_(pa.int64()))
                else:
                    n = batch.num_rows
                    out[f"c{j}"] = pa.array([[]] * n, pa.list_(pa.int64()))
            return pa.table(out)

        parts.append(ds.map_batches(project, batch_format="pyarrow"))
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.union(p)

    def apply(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        ts = group["t"].to_numpy(zero_copy_only=False)
        vecs = {}
        for j in range(4):
            col = group[f"c{j}"].combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            for i in range(group.num_rows):
                v = flat[offs[i]: offs[i + 1]]
                if len(v):
                    vecs[(int(ts[i]), j)] = v.astype(np.int64)
        res = fn(part, vecs)
        out = {"part": pa.array([part], pa.int64())}
        for c in out_cols:
            out[c] = pa.array([res[c]], pa.list_(pa.int64()))
        out["changed"] = pa.array([int(res.get("changed", 0))], pa.int64())
        return pa.table(out)

    return unioned.groupby("part").map_groups(
        apply, batch_format="pyarrow").materialize()


# ---------------------------------------------------------------------------
# fused single-task path (same closures; in-memory merges)
# ---------------------------------------------------------------------------

def _tab_vecs(tab: pa.Table, col: str = "vec") -> dict[int, np.ndarray]:
    arr = tab.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    parts = tab.column("part").to_numpy(zero_copy_only=False)
    return {int(parts[i]): flat[offs[i]: offs[i + 1]].astype(np.int64)
            for i in range(len(parts))}


def _vecs_tab(vecs: dict[int, np.ndarray],
              extra: dict[str, dict[int, np.ndarray]] | None = None
              ) -> pa.Table:
    parts = sorted(vecs)
    cols = {"part": pa.array(parts, pa.int64()),
            "vec": pa.array([vecs[p] for p in parts], pa.list_(pa.int64()))}
    for name, d in (extra or {}).items():
        cols[name] = pa.array([d[p] for p in parts], pa.list_(pa.int64()))
    return pa.table(cols)


@ray.remote
def _fused_scc(fview, rview, lab0_tab: pa.Table, max_rounds: int,
               max_iter: int):
    """All SCC rounds in ONE task — identical scatter/combine closures as
    the Dataset path (integer reductions, so bit-equal)."""
    from .bsp import fused_superstep, table_scalar_sums

    fwd_deg_sc, rev_deg_sc = _deg_scatter(fview), _deg_scatter(rview)
    deg_cb = _deg_combine()
    f_sc, f_cb = _min_scatter(fview), _min_combine()
    b_sc, b_cb = _conf_scatter(rview), _conf_combine()

    lab0 = _tab_vecs(lab0_tab)
    scc = {p: np.full(len(v), SENT, np.int64) for p, v in lab0.items()}
    remaining = sum(len(v) for v in lab0.values())
    metrics = []
    for rnd in range(1, max_rounds + 1):
        t0 = time.perf_counter()
        trimmed_total = 0
        for _ in range(max_iter):
            act = {p: (v == SENT).astype(np.int64) for p, v in scc.items()}
            ind = _tab_vecs(fused_superstep(_vecs_tab(act), fwd_deg_sc,
                                            deg_cb))
            oud = _tab_vecs(fused_superstep(_vecs_tab(act), rev_deg_sc,
                                            deg_cb))
            trimmed = 0
            for p, s in scc.items():
                kill = (s == SENT) & ((ind[p] == 0) | (oud[p] == 0))
                s[kill] = lab0[p][kill]
                trimmed += int(kill.sum())
            trimmed_total += trimmed
            if trimmed == 0:
                break
        remaining -= trimmed_total
        if remaining <= 0:
            metrics.append({"round": rnd, "trimmed": trimmed_total,
                            "f_steps": 0, "b_steps": 0, "assigned": 0,
                            "fused": True,
                            "sec": time.perf_counter() - t0})
            break

        col_tab = _vecs_tab({p: np.where(s == SENT, lab0[p], SENT)
                             for p, s in scc.items()})
        f_steps = 0
        for _ in range(max_iter):
            col_tab = fused_superstep(col_tab, f_sc, f_cb)
            f_steps += 1
            if int(table_scalar_sums(col_tab, ["changed"])["changed"]) == 0:
                break

        col = _tab_vecs(col_tab)
        b_tab = _vecs_tab(
            {p: np.where(col[p] == lab0[p], col[p], SENT) for p in col},
            {"colv": col})
        b_steps = 0
        for _ in range(max_iter):
            b_tab = fused_superstep(b_tab, b_sc, b_cb)
            b_steps += 1
            if int(table_scalar_sums(b_tab, ["changed"])["changed"]) == 0:
                break

        cc = _tab_vecs(b_tab)
        assigned = 0
        for p, s in scc.items():
            conf = cc[p] != SENT
            s[conf] = cc[p][conf]
            assigned += int(conf.sum())
        remaining -= assigned
        metrics.append({"round": rnd, "trimmed": trimmed_total,
                        "f_steps": f_steps, "b_steps": b_steps,
                        "assigned": assigned, "fused": True,
                        "sec": time.perf_counter() - t0})
        if remaining <= 0:
            break
        if assigned == 0 and trimmed_total == 0:
            raise RuntimeError("SCC made no progress (bug)")
    return _vecs_tab(scc), metrics


# ---------------------------------------------------------------------------
# actor-BSP path (round 4 — VERDICT r3 item #1): the same scatter/combine
# closures run on the persistent multi-view actor pool; the trim/assign
# merges become per-partition LOCAL applies (no exchange at all — the
# Dataset path pays a union + groupby shuffle for each). Integer
# reductions throughout, so per-vertex labels are BIT-EQUAL to the
# Dataset path (parity test), at ~10-40 ms per superstep instead of the
# 0.3-0.4 s Dataset-launch floor (BENCH_r03: graph_scc 6.3 s / bowtie
# 8.0 s were pure launch floor at ~20+ supersteps).
# ---------------------------------------------------------------------------

def _act_fn(part, d):
    return {"act": (d["scc"] == SENT).astype(np.int64), "changed": 0}


def _trim_fn(part, d):
    s = d["scc"].copy()
    kill = (s == SENT) & ((d["ind"] == 0) | (d["oud"] == 0))
    s[kill] = d["lab0"][kill]
    return {"scc": s, "changed": int(kill.sum())}


def _col_init_fn(part, d):
    return {"col": np.where(d["scc"] == SENT, d["lab0"], SENT), "changed": 0}


def _b_init_fn(part, d):
    c = d["col"]
    return {"ccol": np.where(c == d["lab0"], c, SENT), "colv": c,
            "changed": 0}


def _assign_fn(part, d):
    s = d["scc"].copy()
    conf = d["ccol"] != SENT
    s[conf] = d["ccol"][conf]
    return {"scc": s, "changed": int(conf.sum())}


def _actor_scc(gf: Graph, gr: Graph, lab0, max_rounds: int, max_iter: int,
               metrics_out: list | None, store=None, start_round: int = 0,
               resumed_scc=None) -> rd.Dataset:
    from .bsp import ActorEngine, state_table

    eng = ActorEngine({"f": gf, "r": gr})
    eng.load("lab0", lab0, "int64")
    if resumed_scc is not None:
        # resume (round 5): the persisted per-round assignment state
        # re-enters the pool; remaining = unassigned (SENT) vertices.
        scc_tab = state_table(resumed_scc)
        eng.load("scc", scc_tab, "int64")
        remaining = int(sum(
            int((np.asarray(v) == SENT).sum())
            for _, v in iter_state_rows(scc_tab, "vec")))
        if remaining <= 0:
            return state_to_vertex_table(eng.dataset("scc"), gf, "vec",
                                         "scc")
    else:
        eng.load("scc", init_state(
            gf, lambda p: np.full(int(gf.n_per_part[p]), SENT, np.int64),
            dtype=pa.int64()), "int64")
        remaining = int(gf.n)

    def mk_deg(view):
        return _deg_combine()

    def mk_min(view):
        return _min_combine()

    def mk_conf(view):
        return _conf_combine()

    for rnd in range(start_round + 1, max_rounds + 1):
        t0 = time.perf_counter()
        trimmed_total = 0
        for _ in range(max_iter):
            eng.apply(_act_fn, ["scc"], ["act"])
            eng.superstep(_deg_scatter, mk_deg, view="f",
                          read={"vec": "act"}, write={"vec": "ind"})
            eng.superstep(_deg_scatter, mk_deg, view="r",
                          read={"vec": "act"}, write={"vec": "oud"})
            trimmed = int(eng.apply(_trim_fn, ["scc", "lab0", "ind", "oud"],
                                    ["scc"]))
            trimmed_total += trimmed
            if trimmed == 0:
                break
        remaining -= trimmed_total
        if remaining <= 0:
            metrics = {"round": rnd, "trimmed": trimmed_total,
                       "f_steps": 0, "b_steps": 0, "assigned": 0,
                       "engine": "actors",
                       "sec": time.perf_counter() - t0}
            if metrics_out is not None:
                metrics_out.append(metrics)
            if store is not None:
                eng.checkpoint("scc", store, rnd, metrics)
            break

        eng.apply(_col_init_fn, ["scc", "lab0"], ["col"])
        f_steps = 0
        for _ in range(max_iter):
            changed = eng.superstep(_min_scatter, mk_min, view="f",
                                    read={"vec": "col"},
                                    write={"vec": "col"},
                                    scalar_cols=("changed",))[0]
            f_steps += 1
            if changed == 0:
                break

        eng.apply(_b_init_fn, ["col", "lab0"], ["ccol", "colv"])
        b_steps = 0
        for _ in range(max_iter):
            changed = eng.superstep(_conf_scatter, mk_conf, view="r",
                                    read={"vec": "ccol", "colv": "colv"},
                                    write={"vec": "ccol", "colv": "colv"},
                                    scalar_cols=("changed",))[0]
            b_steps += 1
            if changed == 0:
                break

        assigned = int(eng.apply(_assign_fn, ["scc", "ccol"], ["scc"]))
        remaining -= assigned
        metrics = {"round": rnd, "trimmed": trimmed_total,
                   "f_steps": f_steps, "b_steps": b_steps,
                   "assigned": assigned, "engine": "actors",
                   "sec": time.perf_counter() - t0}
        if metrics_out is not None:
            metrics_out.append(metrics)
        if store is not None:
            eng.checkpoint("scc", store, rnd, metrics)
        if remaining <= 0:
            break
        if assigned == 0 and trimmed_total == 0:
            raise RuntimeError("SCC made no progress (bug)")

    return state_to_vertex_table(eng.dataset("scc"), gf, "vec", "scc")


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def strongly_connected_components(
    gf: Graph, gr: Graph, *, init: str = "vid", max_rounds: int = 10_000,
    max_iter: int = 10_000, metrics_out: list | None = None,
    fused: bool | None = None, checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """Per-vertex Dataset (vid, scc); label = min vid (``init='vid'``) or
    min int64 key (``init='key'``) of the strongly connected component.
    ``gf``/``gr`` must be a :func:`build_graph_fwd_rev` pair.

    ``checkpoint_dir``: persist the per-partition scc assignment state
    after every outer ROUND (the natural durability unit: trim + F + B +
    assign); a re-run resumes from the latest committed round and skips
    every vertex already assigned."""
    if gf.P != gr.P or gf.n != gr.n:
        raise ValueError("gf/gr must share the fwd_rev vertex dictionary")
    if gf.n == 0:
        return empty_vertex_result({"scc": pa.int64()})

    if init == "key":
        lab0 = key_init_state(gf)
    else:
        lab0 = init_state(
            gf, lambda p: np.arange(int(gf.n_per_part[p]),
                                    dtype=np.int64) * gf.P + p,
            dtype=pa.int64())

    from ..checkpoint import CheckpointStore, graph_fingerprint
    from .bsp import fused_eligible, graph_view, state_table

    store = None
    start_round = 0
    resumed_scc = None
    if checkpoint_dir:
        store = CheckpointStore(checkpoint_dir, "scc",
                                graph_fingerprint(gf), {"init": init})
        resumed = store.latest()
        if resumed is not None:
            start_round, resumed_scc = resumed

    if store is None and fused_eligible(gf, fused) and \
            fused_eligible(gr, fused):
        final_tab, metrics = ray.get(_fused_scc.remote(
            graph_view(gf), graph_view(gr), state_table(lab0),
            max_rounds, max_iter))
        if metrics_out is not None:
            metrics_out.extend(metrics)
        return state_to_vertex_table(rd.from_arrow(final_tab), gf, "vec",
                                     "scc")

    from .bsp import actor_engine_enabled

    if actor_engine_enabled(gf):
        return _actor_scc(gf, gr, lab0, max_rounds, max_iter, metrics_out,
                          store=store, start_round=start_round,
                          resumed_scc=resumed_scc)
    if resumed_scc is not None:
        scc = resumed_scc

        def _unassigned(batch: pa.Table) -> pa.Table:
            n = 0
            for _, v in iter_state_rows(batch, "vec"):
                n += int((np.asarray(v) == SENT).sum())
            return pa.table({"n": pa.array([n], pa.int64())})

        remaining0 = int(sum(r["n"] for r in scc.map_batches(
            _unassigned, batch_format="pyarrow").take_all()))
    else:
        scc = init_state(gf, lambda p: np.full(int(gf.n_per_part[p]), SENT,
                                               np.int64), dtype=pa.int64())
        remaining0 = int(gf.n)

    fwd_deg_sc, rev_deg_sc = _deg_scatter(gf), _deg_scatter(gr)
    deg_cb = _deg_combine()
    f_sc, f_cb = _min_scatter(gf), _min_combine()
    b_sc, b_cb = _conf_scatter(gr), _conf_combine()

    def superstep(state, scatter, combine):
        return (state.map_batches(scatter, batch_format="pyarrow",
                                  batch_size=1, zero_copy_batch=True)
                .groupby("dst_part").map_groups(combine,
                                                batch_format="pyarrow")
                .materialize())

    remaining = remaining0
    if remaining <= 0:
        return state_to_vertex_table(scc, gf, "vec", "scc")
    for rnd in range(start_round + 1, max_rounds + 1):
        t0 = time.perf_counter()
        # --- trim loop -----------------------------------------------------
        trimmed_total = 0
        for _ in range(max_iter):
            def to_active(batch: pa.Table) -> pa.Table:
                rows_p, rows_v = [], []
                for part, v in iter_state_rows(batch, "vec"):
                    rows_p.append(part)
                    rows_v.append((v == SENT).astype(np.int64))
                return pa.table({"part": pa.array(rows_p, pa.int64()),
                                 "vec": pa.array(rows_v,
                                                 pa.list_(pa.int64()))})

            active = scc.map_batches(to_active, batch_format="pyarrow")
            indeg = superstep(active, fwd_deg_sc, deg_cb)
            outdeg = superstep(active, rev_deg_sc, deg_cb)

            def trim_fn(part, vecs):
                s = vecs[(0, 0)].copy()
                l0 = vecs[(1, 0)]
                ind = vecs.get((2, 0), np.zeros(len(s), np.int64))
                oud = vecs.get((3, 0), np.zeros(len(s), np.int64))
                act = s == SENT
                kill = act & ((ind == 0) | (oud == 0))
                s[kill] = l0[kill]
                return {"scc": s, "changed": int(kill.sum())}

            scc = _merge_states(
                [(0, scc, ["vec"]), (1, lab0, ["vec"]),
                 (2, indeg, ["vec"]), (3, outdeg, ["vec"])],
                trim_fn, ["scc"]).rename_columns({"scc": "vec"})
            scc = scc.materialize()
            trimmed = int(sum_columns(scc, ["changed"])["changed"])
            trimmed_total += trimmed
            if trimmed == 0:
                break
        remaining -= trimmed_total
        if remaining <= 0:
            if metrics_out is not None:
                metrics_out.append({"round": rnd, "trimmed": trimmed_total,
                                    "f_steps": 0, "b_steps": 0,
                                    "assigned": 0,
                                    "sec": time.perf_counter() - t0})
            break

        # --- F: forward min coloring to fixpoint ---------------------------
        def col_init_fn(part, vecs):
            s, l0 = vecs[(0, 0)], vecs[(1, 0)]
            return {"col": np.where(s == SENT, l0, SENT), "changed": 0}

        col = _merge_states([(0, scc, ["vec"]), (1, lab0, ["vec"])],
                            col_init_fn, ["col"]).rename_columns(
                                {"col": "vec"}).materialize()
        f_steps = 0
        for _ in range(max_iter):
            col = superstep(col, f_sc, f_cb)
            f_steps += 1
            if int(sum_columns(col, ["changed"])["changed"]) == 0:
                break

        # --- B: backward confirm within color class ------------------------
        def b_init_fn(part, vecs):
            c, l0 = vecs[(0, 0)], vecs[(1, 0)]
            root = c == l0
            return {"ccol": np.where(root, c, SENT), "colv": c, "changed": 0}

        bstate = _merge_states([(0, col, ["vec"]), (1, lab0, ["vec"])],
                               b_init_fn, ["ccol", "colv"]).rename_columns(
                                   {"ccol": "vec"}).materialize()
        b_steps = 0
        for _ in range(max_iter):
            bstate = superstep(bstate, b_sc, b_cb)
            b_steps += 1
            if int(sum_columns(bstate, ["changed"])["changed"]) == 0:
                break

        # --- assign confirmed ----------------------------------------------
        def assign_fn(part, vecs):
            s = vecs[(0, 0)].copy()
            cc = vecs[(1, 0)]
            conf = cc != SENT
            s[conf] = cc[conf]
            return {"scc": s, "changed": int(conf.sum())}

        scc = _merge_states([(0, scc, ["vec"]), (1, bstate, ["vec"])],
                            assign_fn, ["scc"]).rename_columns(
                                {"scc": "vec"}).materialize()
        assigned = int(sum_columns(scc, ["changed"])["changed"])
        remaining -= assigned
        round_metrics = {"round": rnd, "trimmed": trimmed_total,
                         "f_steps": f_steps, "b_steps": b_steps,
                         "assigned": assigned,
                         "sec": time.perf_counter() - t0}
        if metrics_out is not None:
            metrics_out.append(round_metrics)
        if store is not None:
            store.save(rnd, scc.select_columns(["part", "vec"]),
                       round_metrics)
        if remaining <= 0:
            break
        if assigned == 0 and trimmed_total == 0:
            raise RuntimeError("SCC made no progress (bug)")

    return state_to_vertex_table(scc, gf, "vec", "scc")


# ---------------------------------------------------------------------------
# bow-tie decomposition (Broder et al. web structure)
# ---------------------------------------------------------------------------

@ray.remote
def _fused_reach(view, seed_tab: pa.Table, max_iter: int) -> pa.Table:
    from .bsp import fused_superstep, table_scalar_sums

    sc, cb = _min_scatter(view), _min_combine(gate_sent=False)
    tab = seed_tab
    for _ in range(max_iter):
        tab = fused_superstep(tab, sc, cb)
        if int(table_scalar_sums(tab, ["changed"])["changed"]) == 0:
            break
    return tab.select(["part", "vec"])


def _reach(graph: Graph, seeds: rd.Dataset, *, max_iter: int = 10_000,
           fused: bool | None = None) -> rd.Dataset:
    """Min-flood reachability: state 0 at seeds / SENT elsewhere; after the
    fixpoint, reached vertices hold 0."""
    from .bsp import fused_eligible, graph_view, state_table

    if fused_eligible(graph, fused):
        tab = ray.get(_fused_reach.remote(graph_view(graph),
                                          state_table(seeds), max_iter))
        return rd.from_arrow(tab).materialize()

    from .bsp import actor_engine_enabled, actor_int_loop

    if actor_engine_enabled(graph):
        def mk_reach(view):
            return _min_combine(gate_sent=False)

        tab, _ = actor_int_loop(graph, seeds, _min_scatter, mk_reach,
                                max_iter=max_iter, expand=False)
        return rd.from_arrow(tab).materialize()
    sc, cb = _min_scatter(graph), _min_combine(gate_sent=False)
    state = seeds
    for _ in range(max_iter):
        state = (state.map_batches(sc, batch_format="pyarrow", batch_size=1,
                                   zero_copy_batch=True)
                 .groupby("dst_part").map_groups(cb, batch_format="pyarrow")
                 .materialize())
        if int(sum_columns(state, ["changed"])["changed"]) == 0:
            break
    return state


def bowtie(gf: Graph, gr: Graph, *, init: str = "key",
           fused: bool | None = None) -> rd.Dataset:
    """Bow-tie web-structure classes per vertex (Broder et al.): ``core``
    (the largest SCC, ties to the smallest label), ``in`` (reaches the
    core), ``out`` (reached from the core), ``other`` (tendrils, tubes and
    disconnected pieces).

    Composition of the SCC kernel with two min-flood reachability passes
    (forward over ``gf`` -> out-set, backward over ``gr`` -> in-set); the
    only driver values are the (scc, count) top-1 pick and changed
    scalars."""
    if gf.n == 0:
        return empty_vertex_result({"cls": pa.string()})
    scc_vt = strongly_connected_components(gf, gr, init=init,
                                           fused=fused).materialize()
    counts = scc_vt.groupby("scc").count()
    top = counts.sort(["count()", "scc"], descending=[True, False]).limit(1)
    core_label = int(top.take_all()[0]["scc"])

    def seed_col(batch: pa.Table) -> pa.Table:
        s = batch["scc"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vid": batch["vid"],
            "seed": pa.array(np.where(s == core_label, 0, SENT), pa.int64()),
        })

    from .bsp import vertex_table_to_state

    seeds = vertex_table_to_state(
        scc_vt.map_batches(seed_col, batch_format="pyarrow"), gf,
        "seed").materialize()
    fwd = _reach(gf, seeds, fused=fused)   # core reaches v  -> out
    bwd = _reach(gr, seeds, fused=fused)   # v reaches core  -> in

    def cls_fn(part, vecs):
        s = vecs[(0, 0)]
        f = vecs[(1, 0)]
        b = vecs[(2, 0)]
        code = np.full(len(s), 3, np.int64)          # other
        code[f != SENT] = 2                          # out (core -> v)
        code[b != SENT] = 1                          # in  (v -> core)
        code[s == core_label] = 0                    # core
        return {"code": code, "changed": 0}

    # reuse the merged-state machinery over (scc, fwd, bwd)
    scc_st = vertex_table_to_state(scc_vt, gf, "scc")

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["vec" if c == "scc" else c for c in batch.column_names])

    scc_st = scc_st.map_batches(rn, batch_format="pyarrow")
    codes = _merge_states([(0, scc_st, ["vec"]), (1, fwd, ["vec"]),
                           (2, bwd, ["vec"])], cls_fn, ["code"])

    def rn2(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["vec" if c == "code" else c for c in batch.column_names])

    vt = state_to_vertex_table(codes.map_batches(rn2, batch_format="pyarrow"),
                               gf, "vec", "code")
    names = np.array(["core", "in", "out", "other"], dtype=object)

    def to_cls(batch: pa.Table) -> pa.Table:
        c = batch["code"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": batch["vid"],
                         "cls": pa.array(names[c], pa.string())})

    return vt.map_batches(to_cls, batch_format="pyarrow")
