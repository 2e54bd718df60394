"""Minimum spanning forest via distributed Boruvka rounds.

Each round, every current component picks its minimum outgoing edge
under the GLOBAL total order (w, min_vid, max_vid) — a total order means
tied weights cannot form pick cycles, so the union of picks is acyclic
and Boruvka's cut-property invariant holds exactly. Components merge by
pointer jumping on the pick pseudoforest (each 2-cycle rooted at its
smaller label; the pointer table is component-sized and at least halves
per round: <= log2(n) rounds), driver-vectorized below the broadcast
threshold and distributed (bucketed single-scan exchanges) above it.

Physical shape per round over the live edge table (a_vid, b_vid, w, ca,
cb): filter ca != cb -> per-batch lexicographic min combiner (<= one row
per component per batch) -> one groupby(comp) -> distinct picks ->
pointer-jump contraction -> label remap of ca/cb (broadcast map below
the threshold, two co-partitioned joins above). Picked edges accumulate
as a Dataset union.

The MSF WEIGHT MULTISET is unique even under ties (matroid exchange),
so the summary (n_edges, total weight, n_components) is well-defined
whichever valid MSF the tie-break selects; the pytest oracle is
sequential Kruskal.

Reference parity: iterative global reduction with carried state and a
shrinking active set (staleness-gated revalidation loop,
peak_detect_v4.py:1733-1746) redesigned order-independent per SURVEY
§2.10/§7.0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..graph import Graph, edges_table


def _min_pick_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: each edge is a candidate for BOTH endpoint
    components; keep the lexicographic (w, lo, hi) min per component."""
    a = batch["a_vid"].to_numpy(zero_copy_only=False)
    b = batch["b_vid"].to_numpy(zero_copy_only=False)
    w = batch["w"].to_numpy(zero_copy_only=False)
    ca = batch["ca"].to_numpy(zero_copy_only=False)
    cb = batch["cb"].to_numpy(zero_copy_only=False)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    comp = np.concatenate([ca, cb])
    ww = np.concatenate([w, w])
    lo2 = np.concatenate([lo, lo])
    hi2 = np.concatenate([hi, hi])
    cca = np.concatenate([ca, ca])
    ccb = np.concatenate([cb, cb])
    order = np.lexsort((hi2, lo2, ww, comp))
    comp_s = comp[order]
    first = np.r_[True, comp_s[1:] != comp_s[:-1]]
    sel = order[first]
    return pa.table({
        "comp": pa.array(comp[sel], pa.int64()),
        "w": pa.array(ww[sel], pa.int64()),
        "lo": pa.array(lo2[sel], pa.int64()),
        "hi": pa.array(hi2[sel], pa.int64()),
        "ca": pa.array(cca[sel], pa.int64()),
        "cb": pa.array(ccb[sel], pa.int64()),
    })


def _min_pick_final(g: pd.DataFrame) -> pd.DataFrame:
    i = np.lexsort((g["hi"].to_numpy(), g["lo"].to_numpy(),
                    g["w"].to_numpy()))[0]
    return g.iloc[[i]]


@ray.remote
def _merge_cmap_shards(*tabs: pa.Table):
    """Worker-side merge of the per-actor cmap shards into ONE sorted
    (keys, comps) lookup object — the broadcast-remap structure built
    WITHOUT driver involvement (the driver holds only the ref). Each
    remap task then reads it zero-copy from its node's object store
    (Ray caches fetched objects per node: a per-node broadcast, the
    standard broadcast-join shape for maps up to a few GB)."""
    ne = [t for t in tabs if t.num_rows]
    if not ne:
        return np.array([], np.int64), np.array([], np.int64)
    keys = np.concatenate([t["key"].to_numpy(zero_copy_only=False)
                           for t in ne])
    comps = np.concatenate([t["comp"].to_numpy(zero_copy_only=False)
                            for t in ne])
    order = np.argsort(keys)
    return keys[order], comps[order]


def _ref_remap(map_ref):
    """Broadcast remap of (ca, cb) through a plasma-resident sorted
    (keys, vals) ref — same semantics as the driver-built remap."""
    import ray as _ray

    def remap(t: pa.Table) -> pa.Table:
        keys, vv = _ray.get(map_ref)
        for col in ("ca", "cb"):
            cur = t[col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, cur)
            safe = np.minimum(pos, max(len(keys) - 1, 0))
            hit = (pos < len(keys)) & (keys[safe] == cur) \
                if len(keys) else np.zeros(len(cur), bool)
            new = np.where(hit, vv[safe], cur)
            t = t.set_column(t.column_names.index(col), col,
                             pa.array(new, pa.int64()))
        return t

    return remap


_PICK_COLS = ("comp", "w", "lo", "hi", "ca", "cb")


def _pick_combine(arrs: dict) -> dict:
    """Lexicographic (w, lo, hi) min per component over column arrays."""
    order = np.lexsort((arrs["hi"], arrs["lo"], arrs["w"], arrs["comp"]))
    comp_s = arrs["comp"][order]
    sel = order[np.r_[True, comp_s[1:] != comp_s[:-1]]] if len(order) \
        else order
    return {c: arrs[c][sel] for c in _PICK_COLS}


def _pick_map(tabs, K: int):
    """Exchange map side: per-block min-pick partials, combined across
    this task's blocks, sliced by comp % K."""
    parts = [_min_pick_partial(t) for t in tabs if t.num_rows]
    empty = {c: np.array([], np.int64) for c in _PICK_COLS}
    if not parts:
        return [empty] * K
    cat = pa.concat_tables(parts)
    arrs = {c: cat[c].to_numpy(zero_copy_only=False) for c in _PICK_COLS}
    arrs = _pick_combine(arrs)
    part = arrs["comp"] % K
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(K + 1))
    return [{c: arrs[c][order[bounds[k]: bounds[k + 1]]]
             for c in _PICK_COLS} for k in range(K)]


def _pick_reduce(k: int, slices) -> pa.Table:
    """Exchange reduce side: global per-comp min for this comp-hash
    slice (comp-disjoint across reduces, so local min == global min)."""
    arrs = {c: np.concatenate([s[c] for s in slices]) if slices
            else np.array([], np.int64) for c in _PICK_COLS}
    arrs = _pick_combine(arrs)
    return pa.table({c: pa.array(arrs[c], pa.int64()) for c in _PICK_COLS})


def _dedup_lohiw(lo, hi, w):
    order = np.lexsort((hi, lo))
    lo, hi, w = lo[order], hi[order], w[order]
    first = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])] \
        if len(lo) else np.array([], bool)
    return lo[first], hi[first], w[first]


def _sel_map(tabs, K: int):
    """Distinct-picked-edges exchange, map side: local (lo, hi) dedup
    (an edge is picked by at most its two endpoint components — same w
    both times), sliced by lo % K."""
    ne = [t for t in tabs if t.num_rows]
    empty = tuple(np.array([], np.int64) for _ in range(3))
    if not ne:
        return [empty] * K
    lo = np.concatenate([t["lo"].to_numpy(zero_copy_only=False)
                         for t in ne])
    hi = np.concatenate([t["hi"].to_numpy(zero_copy_only=False)
                         for t in ne])
    w = np.concatenate([t["w"].to_numpy(zero_copy_only=False)
                        for t in ne])
    lo, hi, w = _dedup_lohiw(lo, hi, w)
    part = lo % K
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(K + 1))
    return [tuple(a[order[bounds[k]: bounds[k + 1]]] for a in (lo, hi, w))
            for k in range(K)]


def _sel_reduce(k: int, slices) -> pa.Table:
    lo = np.concatenate([s[0] for s in slices])
    hi = np.concatenate([s[1] for s in slices])
    w = np.concatenate([s[2] for s in slices])
    lo, hi, w = _dedup_lohiw(lo, hi, w)
    return pa.table({"lo": pa.array(lo, pa.int64()),
                     "hi": pa.array(hi, pa.int64()),
                     "w": pa.array(w, pa.int64())})


@ray.remote
def _lohiw_meta(t: pa.Table):
    import pyarrow.compute as _pc

    return t.num_rows, int(_pc.sum(t["w"]).as_py() or 0)


# ---------------------------------------------------------------------------
# actor-engine contraction (round 5 — VERDICT r4 item #3): the pick
# pseudoforest lives as a DENSE pointer state over the full vid space
# (par[v] = v except picked components, where par[c] = the pick's other
# endpoint), and pointer doubling par := par(par) runs as
# request -> respond -> apply rounds on the persistent BSP pool — the
# same exchange closures CC's jump method uses (cc._make_jump_fns), with
# MSF-specific applies: one 2-cycle-rooting round (root each mutual pick
# pair at its smaller label — under the global (w, lo, hi) total order
# every pick cycle is mutual), then pure assignment doubling to the
# fixpoint (<= log2(depth) rounds). Replaces the per-round Dataset jump
# loop whose per-execution launch floor dominated distributed MSF
# (measured 1.8x the driver path at 694k edges, BASELINE.md §4).
# ---------------------------------------------------------------------------


def _mk_jump_request(view):
    from .cc import _make_jump_fns

    return _make_jump_fns(view)[0]


def _mk_jump_respond(view):
    from .cc import _make_jump_fns

    return _make_jump_fns(view)[1]


def _unpack_jump_group(group: pa.Table, P: int):
    """(part, prev, A_pos) from one apply group: prev = this part's
    pointer vector (carrier row), A_pos[i] = par(par(v_i)) resolved from
    the routed answers (every label in prev was requested, so the sorted
    lookup is exact — same contract as cc._make_jump_fns.apply)."""
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
    if not reqs:
        return part, prev, prev.copy()
    R = np.concatenate(reqs)
    A = np.concatenate(anss)
    order = np.argsort(R, kind="stable")
    R, A = R[order], A[order]
    return part, prev, A[np.searchsorted(R, prev)]


def _jump_state_row(part: int, new: np.ndarray, changed: int) -> pa.Table:
    return pa.table({
        "part": pa.array([part], pa.int64()),
        "vec": pa.array([new], pa.list_(pa.int64())),
        "changed": pa.array([changed], pa.int64()),
    })


def _mk_apply_root2(view):
    P = view.P

    def apply(group: pa.Table) -> pa.Table:
        part, prev, pp = _unpack_jump_group(group, P)
        vid_self = np.arange(len(prev), dtype=np.int64) * P + part
        two = (pp == vid_self) & (vid_self < prev)
        new = np.where(two, vid_self, prev)
        return _jump_state_row(part, new, int(two.sum()))

    return apply


def _mk_apply_assign(view):
    P = view.P

    def apply(group: pa.Table) -> pa.Table:
        part, prev, pp = _unpack_jump_group(group, P)
        return _jump_state_row(part, pp, int((pp != prev).sum()))

    return apply


def _actor_contraction(graph: Graph, picks: rd.Dataset,
                       eng=None, max_jumps: int = 64) -> rd.Dataset:
    """picks (comp, ca, cb, ...) -> cmap Dataset (key, comp): key = old
    component label, comp = its pick-tree root. No driver structure
    proportional to component count — the pointer table is per-partition
    actor state (the same O(n/P) footprint PageRank holds), pick
    overrides arrive via one groupby(part), each doubling round is three
    actor RPC hops instead of a Dataset execution, and the cmap leaves as
    per-actor plasma shards (zero driver bytes). ``eng``: reuse a caller's
    ActorEngine across Boruvka rounds (setup/identity are re-issued per
    call; the pool itself is session-cached anyway)."""
    from .bsp import ActorEngine

    P = graph.P
    n_per_part = np.asarray(graph.n_per_part)

    def tag(t: pa.Table) -> pa.Table:
        comp = t["comp"].to_numpy(zero_copy_only=False)
        ca = t["ca"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(comp % P, pa.int64()),
            "comp": pa.array(comp, pa.int64()),
            "other": pa.array(np.where(comp == ca, cb, ca), pa.int64()),
        })

    def override(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        comp = group["comp"].to_numpy(zero_copy_only=False)
        other = group["other"].to_numpy(zero_copy_only=False)
        vec = np.arange(int(n_per_part[part]), dtype=np.int64) * P + part
        vec[comp // P] = other
        return pa.table({"part": pa.array([part], pa.int64()),
                         "vec": pa.array([vec], pa.list_(pa.int64()))})

    pick_state = (picks.map_batches(tag, batch_format="pyarrow")
                  .groupby("part").map_groups(override,
                                              batch_format="pyarrow"))

    if eng is None:
        eng = ActorEngine({"g": graph})
    eng.init_identity("par", "g")
    eng.load("par", pick_state, "int64", merge=True)
    eng.rra_superstep(_mk_jump_request, _mk_jump_respond, _mk_apply_root2,
                      view="g", read={"vec": "par"}, write={"vec": "par"})
    for _ in range(max_jumps):
        chg = eng.rra_superstep(
            _mk_jump_request, _mk_jump_respond, _mk_apply_assign,
            view="g", read={"vec": "par"}, write={"vec": "par"})[0]
        if chg == 0:
            break

    # non-identity entries are exactly the picked component labels: the
    # override touches only them, rooting/doubling never turns an identity
    # entry non-identity (par(par(v)) == v when par(v) == v), so this IS
    # the component-sized cmap
    return eng.sparse_pairs("par", "g")


def minimum_spanning_forest(graph: Graph, *, max_rounds: int = 64,
                            metrics_out: list | None = None,
                            P_merge: int = 8,
                            broadcast_max_map: int = 1_000_000):
    """(summary_table, msf_edges) over a SYMMETRIC (optionally weighted
    with INTEGER weights) build: summary is one row (n_msf_edges,
    total_weight, n_components); ``msf_edges`` is a Dataset of
    (lo, hi, w) rows of one valid MSF (deterministic tie-break).

    Contraction: below ``broadcast_max_map`` picks the pseudoforest is
    pointer-jumped driver-vectorized (<= ~50 MB driver bytes at the
    default); above it the SAME rooting + pointer jumping runs
    DISTRIBUTED (round 3; VERDICT r2 item #4) — single-scan tag +
    bucketed-groupby exchanges over the component-sized pointer table,
    no merge-graph build, no CC kernel, no driver structure proportional
    to component count."""
    from raylink.ops import hash_join, keep_first

    def init_cols(batch: pa.Table) -> pa.Table:
        a = batch["src_vid"].to_numpy(zero_copy_only=False)
        b = batch["dst_vid"].to_numpy(zero_copy_only=False)
        keep = a < b  # symmetric build: each undirected edge once
        a, b = a[keep], b[keep]
        if "w" in batch.column_names:
            wf = batch["w"].to_numpy(zero_copy_only=False)[keep]
            if not np.all(wf == np.floor(wf)):
                raise TypeError("minimum_spanning_forest needs integer "
                                "edge weights (same lattice rule as sssp)")
            w = wf.astype(np.int64)
        else:
            w = np.ones(len(a), np.int64)
        return pa.table({
            "a_vid": pa.array(a, pa.int64()),
            "b_vid": pa.array(b, pa.int64()),
            "w": pa.array(w, pa.int64()),
            "ca": pa.array(a, pa.int64()),
            "cb": pa.array(b, pa.int64()),
        })

    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("RAYLINK_MSF_DEBUG"))
    _t0 = _time.time()

    def _log(*a):
        if _dbg:
            print(f"[msf {_time.time() - _t0:7.1f}]", *a, flush=True)

    edges = edges_table(graph).map_batches(
        init_cols, batch_format="pyarrow").materialize()
    msf_parts: list[rd.Dataset] = []
    n_msf = 0
    total_w = 0
    _eng = None  # one ActorEngine reused across distributed rounds

    import ray as _ray

    def _broadcast_remap(keys_sorted: np.ndarray, vals: np.ndarray):
        map_ref = _ray.put((keys_sorted, vals))

        def remap(t: pa.Table) -> pa.Table:
            keys, vv = _ray.get(map_ref)
            for col in ("ca", "cb"):
                cur = t[col].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, cur)
                safe = np.minimum(pos, max(len(keys) - 1, 0))
                hit = (pos < len(keys)) & (keys[safe] == cur) \
                    if len(keys) else np.zeros(len(cur), bool)
                new = np.where(hit, vv[safe], cur)
                t = t.set_column(t.column_names.index(col), col,
                                 pa.array(new, pa.int64()))
            return t

        return remap

    for r in range(max_rounds):
        live = edges.map_batches(
            lambda t: t.filter(pc.not_equal(t["ca"], t["cb"])),
            batch_format="pyarrow").materialize()
        if live.count() == 0:
            break
        if _os.environ.get("RAYLINK_MSF_PICK_EXCHANGE", "tasks") != "dataset":
            # min-pick as a raw-task exchange (comp % P slices): removes
            # the per-round sort-shuffle groupby — same rows, same
            # deterministic (w, lo, hi) tie-break
            from raylink.exchange import exchange

            picks = rd.from_arrow_refs(exchange(
                live.to_arrow_refs(), int(graph.P), _pick_map,
                _pick_reduce))
        else:
            picks = (live.map_batches(_min_pick_partial,
                                      batch_format="pyarrow")
                     .groupby("comp")
                     .map_groups(_min_pick_final, batch_format="pandas")
                     .materialize())
        n_picks = picks.count()
        _log("round", r, "picks", n_picks)

        if n_picks <= broadcast_max_map:
            # pick-pseudoforest contraction, driver-vectorized: under the
            # global (w, lo, hi) total order every pick cycle is a MUTUAL
            # 2-cycle (both endpoints picked their shared minimum edge),
            # so rooting each 2-cycle at its smaller label leaves a forest
            # and pointer jumping converges in log rounds — no per-round
            # merge-graph build or CC kernel needed at this size
            pt = pa.concat_tables(list(picks.iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)))
            comp = pt["comp"].to_numpy(zero_copy_only=False)
            ca = pt["ca"].to_numpy(zero_copy_only=False)
            cb = pt["cb"].to_numpy(zero_copy_only=False)
            w = pt["w"].to_numpy(zero_copy_only=False)
            lo = pt["lo"].to_numpy(zero_copy_only=False)
            hi = pt["hi"].to_numpy(zero_copy_only=False)
            # distinct picked edges (both endpoints may pick the same one)
            eorder = np.lexsort((hi, lo))
            el, eh, ew = lo[eorder], hi[eorder], w[eorder]
            first = np.r_[True, (el[1:] != el[:-1]) | (eh[1:] != eh[:-1])]
            el, eh, ew = el[first], eh[first], ew[first]
            n_sel = len(el)
            w_sel = int(ew.sum())
            msf_parts.append(rd.from_arrow(pa.table({
                "lo": pa.array(el, pa.int64()),
                "hi": pa.array(eh, pa.int64()),
                "w": pa.array(ew, pa.int64())})))
            # hook: parent(comp) = the pick's other endpoint
            order = np.argsort(comp, kind="stable")
            cs = comp[order]
            other = np.where(comp == ca, cb, ca)[order]
            par = np.searchsorted(cs, other)
            assert np.array_equal(cs[par], other), "pick endpoint missing"
            idx = np.arange(len(cs))
            two = (par[par] == idx) & (cs < cs[par])
            par = np.where(two, idx, par)
            while True:
                nxt = par[par]
                if np.array_equal(nxt, par):
                    break
                par = nxt
            roots = cs[par]
            changed = roots != cs
            # dead (ca == cb) edges never revive: carry only the live set
            edges = live.map_batches(
                _broadcast_remap(cs[changed], roots[changed]),
                batch_format="pyarrow", zero_copy_batch=True)
        else:
            # scale path (round 3): DISTRIBUTED pointer jumping on the
            # pick pseudoforest — replaces the per-round merge-graph
            # build_graph + CC (measured the dominant cost of large-round
            # MSF, ROADMAP r2) and keeps ZERO driver structure
            # proportional to component count. Same rooting rule as the
            # driver path: under the global (w, lo, hi) total order every
            # pick cycle is a mutual 2-cycle, rooted at its smaller
            # label; then p := p(p) halves chain depth per jump round
            # (<= log2 rounds, each one hash join over the shrinking
            # component-sized pointer table).
            if _os.environ.get("RAYLINK_MSF_PICK_EXCHANGE",
                               "tasks") != "dataset":
                # distinct picked edges as a second chained exchange
                # (lo % P slices) + O(P) scalar meta tasks — replaces
                # keep_first's sort-groupby + two materialize passes
                from raylink.exchange import exchange

                sel_refs = exchange(picks.to_arrow_refs(), int(graph.P),
                                    _sel_map, _sel_reduce)
                metas = ray.get([_lohiw_meta.remote(r) for r in sel_refs])
                n_sel = sum(m[0] for m in metas)
                w_sel = sum(m[1] for m in metas)
                sel_edges = rd.from_arrow_refs(sel_refs)
            else:
                sel = keep_first(picks, ["lo", "hi"], ["w"]).materialize()
                sel_edges = sel.select_columns(["lo", "hi", "w"]) \
                    .materialize()
                n_sel = sel_edges.count()
                w_sel = int(sel_edges.sum("w") or 0)
            msf_parts.append(sel_edges)

            from .bsp import ActorEngine, actor_engine_enabled

            if actor_engine_enabled(graph):
                # round 5: pointer doubling on the persistent BSP pool —
                # three actor RPC hops per round instead of a Dataset
                # execution (whose launch floor made distributed MSF 1.8x
                # the driver path at 694k edges, BASELINE.md §4)
                if _eng is None:
                    _eng = ActorEngine({"g": graph})
                cmap = _actor_contraction(graph, picks, eng=_eng)
            else:
                cmap = _dataset_contraction(graph, picks, P_merge)
            _log("round", r, "contraction done")
            plasma_max = int(_os.environ.get(
                "RAYLINK_MSF_PLASMA_MAX_MAP", "33000000"))
            if n_picks <= plasma_max:
                # middle tier (round 5): the cmap is component-sized
                # (n_picks entries, 16 B each — <= ~0.5 GB at the
                # default cap): merge the per-actor shards WORKER-side
                # into one sorted lookup ref and remap ca/cb in a single
                # zero-copy map pass, skipping the two attach joins +
                # repartition entirely (a per-node broadcast; the join
                # path below stays the asymptotic >cap route)
                map_ref = _merge_cmap_shards.remote(*cmap.to_arrow_refs())
                edges = live.map_batches(_ref_remap(map_ref),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
                _log("round", r, "plasma remap built")
                n_msf += n_sel
                total_w += w_sel
                if metrics_out is not None:
                    metrics_out.append({"round": r, "picked": n_sel,
                                        "weight": w_sel})
                edges = rd.from_arrow_refs(
                    list(edges.materialize().to_arrow_refs()))
                _log("round", r, "edges rebuilt",
                     "(plasma-remap tier)")
                continue
            # lineage cut: the cmap leaf is referenced by BOTH attach
            # joins below — rebuild it from its cached blocks so the
            # whole contraction plan is not duplicated into each join
            cmap = rd.from_arrow_refs(list(cmap.to_arrow_refs()))

            edges = live  # dead edges never revive

            def attach(col: str):
                nonlocal edges
                joined = hash_join(edges, cmap, on=col, right_on="key",
                                   how="left", num_partitions=P_merge)

                def fold(t: pa.Table, col=col) -> pa.Table:
                    new = pc.coalesce(t["comp"], t[col])
                    t = t.drop_columns([c for c in ("key", "comp")
                                        if c in t.column_names])
                    return t.set_column(
                        t.column_names.index(col), col, new)

                edges = joined.map_batches(fold, batch_format="pyarrow")

            attach("ca")
            attach("cb")
            _log("round", r, "attach built")
            # coalesce: each attach join MULTIPLIES the block count
            # (measured 16 -> 48 -> 144 -> 432 -> 1296 over four rounds),
            # and every downstream stage pays per-block task overhead —
            # the round-over-round slowdown was block explosion, not plan
            # growth. Rows only shrink, so a fixed block budget is right.
            edges = edges.repartition(int(graph.P))

        n_msf += n_sel
        total_w += w_sel
        if metrics_out is not None:
            metrics_out.append({"round": r, "picked": n_sel,
                                "weight": w_sel})
        # lineage cut, not just a materialize: each round's plan otherwise
        # embeds every previous round's full plan (filter + picks + jump
        # loop + joins), and executor planning time compounds round over
        # round (measured 4.4 s -> 118 s/round by round 3 on the 35 k-
        # vertex corpus). Rebuilding from the cached blocks keeps the
        # per-round plan constant — same fix as the cmap leaf above.
        edges = edges.materialize()
        edges = rd.from_arrow_refs(list(edges.to_arrow_refs()))
        _log("round", r, "edges rebuilt")

    summary = pa.table({
        "n_msf_edges": pa.array([n_msf], pa.int64()),
        "total_weight": pa.array([total_w], pa.int64()),
        "n_components": pa.array([graph.n - n_msf], pa.int64()),
    })
    if msf_parts:
        out = msf_parts[0]
        for p in msf_parts[1:]:
            out = out.union(p)
    else:
        out = rd.from_arrow(pa.table({"lo": pa.array([], pa.int64()),
                                      "hi": pa.array([], pa.int64()),
                                      "w": pa.array([], pa.int64())}))
    return summary, out


def _dataset_contraction(graph: Graph, picks: rd.Dataset,
                         P_merge: int) -> rd.Dataset:
    """Dataset-pipeline fallback contraction (RAYLINK_BSP_ENGINE=dataset or
    graphs above the actor regime): bucketed single-scan pointer-jumping
    exchanges over the component-sized pointer table. Returns the
    materialized cmap Dataset (key, comp)."""

    def to_ptr(t: pa.Table) -> pa.Table:
        comp = t["comp"].to_numpy(zero_copy_only=False)
        ca = t["ca"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c": pa.array(comp, pa.int64()),
            "p": pa.array(np.where(comp == ca, cb, ca), pa.int64()),
        })

    pt = picks.map_batches(to_ptr, batch_format="pyarrow").materialize()
    # each jump is ONE single-pass tag + bucketed groupby: every
    # pointer row is emitted twice from the same scan — as a
    # QUERY keyed by its parent and as an ANSWER keyed by its
    # component — so p(p) resolves with a searchsorted inside the
    # bucket. Deliberately NOT a self-hash_join: referencing pt
    # on both sides of a union doubles the retained logical plan
    # per jump (materialize() caches blocks but keeps lineage),
    # which we measured going exponential (1.3 s -> 180 s by
    # jump 10); the single-scan exchange keeps lineage linear,
    # the same shape as the CC superstep loop.
    from ..graph import hash64 as _h64

    JB = max(int(P_merge), 8)

    def jump_tag(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        p = t["p"].to_numpy(zero_copy_only=False)
        k = np.concatenate([p, c])
        side = np.concatenate([np.zeros(len(c), np.int8),
                               np.ones(len(c), np.int8)])
        bkt = (_h64(pa.array(k, pa.int64()))
               % np.uint64(JB)).astype(np.int64)
        return pa.table({
            "bkt": pa.array(bkt, pa.int64()),
            "k": pa.array(k, pa.int64()),
            "c": pa.array(np.concatenate([c, c]), pa.int64()),
            "p": pa.array(np.concatenate([p, p]), pa.int64()),
            "side": pa.array(side, pa.int8()),
        })

    def make_jump_combine(first: bool):
        def comb(g: pa.Table) -> pa.Table:
            side = g["side"].to_numpy(zero_copy_only=False)
            k = g["k"].to_numpy(zero_copy_only=False)
            c = g["c"].to_numpy(zero_copy_only=False)
            p = g["p"].to_numpy(zero_copy_only=False)
            am = side == 1
            ak, ap = k[am], p[am]  # parent(ak) = ap, ak unique
            order = np.argsort(ak)
            ak, ap = ak[order], ap[order]
            qm = ~am
            qc, qp = c[qm], p[qm]  # query key == qp
            pos = np.searchsorted(ak, qp)
            safe = np.minimum(pos, max(len(ak) - 1, 0))
            hit = ((pos < len(ak)) & (ak[safe] == qp)) \
                if len(ak) else np.zeros(len(qp), bool)
            p2 = np.where(hit, ap[safe] if len(ak) else qp, qp)
            if first:
                two = p2 == qc  # mutual 2-cycle
                newp = np.where(two & (qc < qp), qc,
                                np.where(two, qp, p2))
            else:
                newp = p2
            return pa.table({
                "c": pa.array(qc, pa.int64()),
                "p": pa.array(newp, pa.int64()),
                "chg": pa.array(newp != qp, pa.bool_()),
            })

        return comb

    first_jump = True
    for _ in range(64):
        stepped = (pt.map_batches(jump_tag, batch_format="pyarrow")
                   .groupby("bkt")
                   .map_groups(make_jump_combine(first_jump),
                               batch_format="pyarrow")
                   .materialize())
        n_chg = int(stepped.sum("chg") or 0)
        pt = stepped.drop_columns(["chg"])
        first_jump = False
        if n_chg == 0:
            break

    def to_cmap(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.not_equal(t["c"], t["p"]))
        return pa.table({"key": keep["c"], "comp": keep["p"]})

    return pt.map_batches(to_cmap, batch_format="pyarrow").materialize()
