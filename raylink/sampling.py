"""Deterministic random-walk sampling over an integer-keyed edge table.

The training-data use case (node2vec/DeepWalk-style corpus generation)
needs billions of walks over a web-scale link graph; the engine shape here
is the BSP one: adjacency is hash-bucketed ONCE into object-store blobs
(sorted-src CSR per bucket), then each walk step shuffles only the walker
state rows (two int64s per walker) via one small groupby — adjacency never
moves again. At cluster scale the buckets distribute across the object
store and each step's group task fetches exactly its one bucket.

Walks are DETERMINISTIC so an unrolled SQL oracle can replay them: the
step-k neighbor of a walker at vertex v is

    nb[ ((walker*48271 + k*16807 + 12345) mod 2147483647) mod deg(v) ]

with ``nb`` the out-neighbors of v ascending (the engine stores them
sorted; SQL uses list(dst ORDER BY dst)). All arithmetic stays below
2^47, exact in int64 on both sides (walker ids are capped at 2^31).
A walker at a vertex with no out-edges emits nothing further (the walk
dies), matching the SQL inner join against the adjacency.

Reference parity: seeded reproducible sampling mirrors the reference's
deterministic segment selection (rad_ecg setup/test fixtures,
peak_detect_v4.py fixed-seed section windows); SURVEY §2.5 deterministic
per-unit extraction.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

_P_MOD = np.int64(2147483647)
_KEY_CAP = np.int64(1) << 31
_MULT = np.uint64(0x9E3779B97F4A7C15)


def _bkt(x: np.ndarray, buckets: int) -> np.ndarray:
    return ((x.astype(np.uint64) * _MULT) >> np.uint64(33)).astype(
        np.int64) % buckets


def _check_keys(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64, copy=False)
    if len(x) and (x.min() < 0 or x.max() >= _KEY_CAP):
        raise ValueError("random_walks requires integer vertex keys in "
                         "[0, 2^31) (the mix arithmetic must stay exact "
                         "in int64 on the SQL-oracle side too)")
    return x


def adjacency_buckets(edges: rd.Dataset, buckets: int,
                      weighted: bool = False) -> dict[int, Any]:
    """(src:int64, dst:int64) -> {bucket: ObjectRef(blob)} where blob =
    (src_sorted, indptr, nb_flat, wcum) with per-src neighbors ascending.
    ``weighted=False``: edges must be DISTINCT, wcum is None.
    ``weighted=True``: pass the NON-distinct stream — duplicate pairs
    collapse to one slot whose weight is the multiplicity, and ``wcum``
    is the leading-zero global cumulative weight (wcum[j] = total weight
    of slots before j), so weight-proportional picks are one global
    searchsorted. One groupby shuffle; the driver holds only B refs."""

    def tag(batch: pa.Table) -> pa.Table:
        src = _check_keys(batch["src"].to_numpy(zero_copy_only=False))
        dst = _check_keys(batch["dst"].to_numpy(zero_copy_only=False))
        return pa.table({
            "bkt": pa.array(_bkt(src, buckets), pa.int64()),
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })

    def build(group: pa.Table) -> pa.Table:
        bkt = int(group["bkt"][0].as_py())
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        if weighted:
            pair, w = np.unique(np.stack([src, dst], axis=1), axis=0,
                                return_counts=True)
            src, dst = pair[:, 0], pair[:, 1]  # already (src, dst) asc
            wcum = np.concatenate([[0], w.astype(np.int64).cumsum()])
        else:
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            wcum = None
        src_u, counts = np.unique(src, return_counts=True)
        indptr = np.concatenate([[0], counts.cumsum()]).astype(np.int64)
        blob = pickle.dumps((src_u, indptr, dst, wcum), protocol=5)
        return pa.table({"bkt": pa.array([bkt], pa.int64()),
                         "payload": pa.array([blob], pa.binary())})

    rows = (edges.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("bkt").map_groups(build, batch_format="pyarrow"))
    refs: dict[int, Any] = {}
    for batch in rows.iter_batches(batch_format="pyarrow", batch_size=8):
        for r in batch.to_pylist():
            refs[int(r["bkt"])] = ray.put(pickle.loads(r["payload"]))
    return refs


def random_walks(edges: rd.Dataset, *, length: int,
                 buckets: int = 64,
                 starts: rd.Dataset | None = None,
                 weighted: bool = False) -> rd.Dataset:
    """One deterministic walk of ``length`` steps from every start vertex
    (default: every distinct vertex of ``edges``); returns rows
    (walker, step, v) — step 0 is the start itself, and a walk that
    reaches a vertex with no out-edges stops emitting.

    ``weighted=False``: uniform next-neighbor pick, index = mix mod deg;
    ``edges`` must be DISTINCT (duplicates would shift neighbor indices
    vs the oracle). ``weighted=True``: pass the NON-distinct stream —
    the pick is weight-PROPORTIONAL over multiplicity weights: r = mix
    mod W(v) selects the unique slot (dst ascending) whose cumulative
    weight interval contains r (SQL twin: windowed sum(w) cumulative
    intervals)."""
    refs = adjacency_buckets(edges, buckets, weighted=weighted)

    if starts is None:
        def verts(batch: pa.Table) -> pa.Table:
            both = np.concatenate([
                batch["src"].to_numpy(zero_copy_only=False),
                batch["dst"].to_numpy(zero_copy_only=False)])
            both = np.unique(_check_keys(both))
            return pa.table({
                "bkt": pa.array(_bkt(both, buckets), pa.int64()),
                "v": pa.array(both, pa.int64()),
            })

        def uniq(group: pa.Table) -> pa.Table:
            v = np.unique(group["v"].to_numpy(zero_copy_only=False))
            return pa.table({"walker": pa.array(v, pa.int64()),
                             "v": pa.array(v, pa.int64())})

        state = (edges.map_batches(verts, batch_format="pyarrow",
                                   zero_copy_batch=True)
                 .groupby("bkt").map_groups(uniq, batch_format="pyarrow")
                 .materialize())
    else:
        def as_state(batch: pa.Table) -> pa.Table:
            v = _check_keys(batch["v"].to_numpy(zero_copy_only=False))
            return pa.table({"walker": pa.array(v, pa.int64()),
                             "v": pa.array(v, pa.int64())})

        state = starts.map_batches(as_state, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()

    def with_step(ds: rd.Dataset, k: int) -> rd.Dataset:
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "walker": batch["walker"],
                "step": pa.array(np.full(n, k), pa.int64()),
                "v": batch["v"],
            })

        return ds.map_batches(f, batch_format="pyarrow")

    outs = [with_step(state, 0)]
    for k in range(1, length + 1):
        def tag_v(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            return pa.table({
                "bkt": pa.array(_bkt(v, buckets), pa.int64()),
                "walker": batch["walker"],
                "v": batch["v"],
            })

        def step_fn(group: pa.Table, _k=k) -> pa.Table:
            import ray as _ray

            bkt = int(group["bkt"][0].as_py())
            ref = refs.get(bkt)
            empty = pa.table({"walker": pa.array([], pa.int64()),
                              "v": pa.array([], pa.int64())})
            if ref is None:
                return empty
            src_u, indptr, nb, wcum = _ray.get(ref)
            walker = group["walker"].to_numpy(zero_copy_only=False)
            v = group["v"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(src_u, v)
            safe = np.minimum(pos, len(src_u) - 1)
            has = (pos < len(src_u)) & (src_u[safe] == v)
            if not has.any():
                return empty
            walker, pos = walker[has], pos[has]
            mix = (walker * np.int64(48271) + np.int64(_k) * np.int64(16807)
                   + np.int64(12345)) % _P_MOD
            if wcum is not None:
                lo, hi = indptr[pos], indptr[pos + 1]
                tot = wcum[hi] - wcum[lo]
                target = wcum[lo] + mix % tot
                nxt = nb[np.searchsorted(wcum, target, side="right") - 1]
            else:
                deg = indptr[pos + 1] - indptr[pos]
                nxt = nb[indptr[pos] + mix % deg]
            return pa.table({"walker": pa.array(walker, pa.int64()),
                             "v": pa.array(nxt, pa.int64())})

        state = (state.map_batches(tag_v, batch_format="pyarrow")
                 .groupby("bkt").map_groups(step_fn, batch_format="pyarrow")
                 .materialize())
        outs.append(with_step(state, k))

    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def neighborhood_sample(edges: rd.Dataset, seeds: rd.Dataset, *,
                        hops: int, fanout: int,
                        buckets: int = 64,
                        weighted: bool = False) -> rd.Dataset:
    """GraphSAGE-style k-hop neighborhood sampling: from every seed, draw
    ``fanout`` deterministic children per frontier vertex per hop, dedup
    the frontier per (seed, vertex), and emit DISTINCT rows
    (seed, hop, v) — hop 0 is the seed itself.

    Child j (1-based) of vertex v in seed s's tree at hop h uses
    mix = (s*48271 + h*16807 + j*9973 + v*7919 + 12345) mod 2147483647:
    ``weighted=False`` picks nb[mix mod deg(v)] over dst-ascending
    adjacency (edges must be DISTINCT); ``weighted=True`` (pass the
    NON-distinct stream — duplicates collapse to multiplicity weights)
    picks the unique slot whose cumulative-weight interval contains
    mix mod W(v), i.e. weight-proportional sampling. Both replayable by
    an unrolled SQL oracle (CROSS JOIN generate_series(1, fanout); the
    weighted twin joins on windowed-cumsum intervals). All products
    stay below 2^47, exact in int64 on both sides. Frontier vertices
    with no out-edges contribute no children (inner join).

    Physical shape: one groupby shuffle per hop moving only (seed, v)
    int64 pairs; adjacency lives in the bucketed object-store blobs from
    :func:`adjacency_buckets` and never reshuffles. The per-hop dedup
    happens inside the same group task (same-(seed,v) rows share a
    v-bucket, so the local distinct is a global one)."""
    refs = adjacency_buckets(edges, buckets, weighted=weighted)

    def seed_state(batch: pa.Table) -> pa.Table:
        v = _check_keys(batch["v"].to_numpy(zero_copy_only=False))
        return pa.table({"seed": pa.array(v, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    raw = seeds.map_batches(seed_state, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def tag_v(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bkt": pa.array(_bkt(v, buckets), pa.int64()),
            "seed": batch["seed"],
            "v": batch["v"],
        })

    def kind_filter(kind: int):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.equal(batch["kind"], kind)).select(
                ["seed", "v"])

        return f

    def with_hop(ds: rd.Dataset, h: int) -> rd.Dataset:
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "seed": batch["seed"],
                "hop": pa.array(np.full(n, h), pa.int64()),
                "v": batch["v"],
            })

        return ds.map_batches(f, batch_format="pyarrow")

    outs = []
    for lvl in range(hops + 1):
        last = lvl == hops

        def work(group: pa.Table, _h=lvl + 1, _last=last) -> pa.Table:
            import ray as _ray

            bkt = int(group["bkt"][0].as_py())
            pairs = np.stack([
                group["seed"].to_numpy(zero_copy_only=False),
                group["v"].to_numpy(zero_copy_only=False)], axis=1)
            pairs = np.unique(pairs, axis=0)  # global (seed, v) dedup
            seed, v = pairs[:, 0], pairs[:, 1]
            cols = [seed, v, np.zeros(len(seed), np.int64)]
            ref = refs.get(bkt)
            if not _last and ref is not None:
                src_u, indptr, nb, wcum = _ray.get(ref)
                pos = np.searchsorted(src_u, v)
                safe = np.minimum(pos, len(src_u) - 1)
                has = (pos < len(src_u)) & (src_u[safe] == v)
                if has.any():
                    es, ev, pos2 = seed[has], v[has], pos[has]
                    # vectorized fanout expansion: repeat rows fanout times
                    rs = np.repeat(es, fanout)
                    rv = np.repeat(ev, fanout)
                    j = np.tile(np.arange(1, fanout + 1, dtype=np.int64),
                                len(es))
                    mix = (rs * np.int64(48271)
                           + np.int64(_h) * np.int64(16807)
                           + j * np.int64(9973) + rv * np.int64(7919)
                           + np.int64(12345)) % _P_MOD
                    if wcum is not None:
                        lo_i = np.repeat(indptr[pos2], fanout)
                        hi_i = np.repeat(indptr[pos2 + 1], fanout)
                        tot = wcum[hi_i] - wcum[lo_i]
                        target = wcum[lo_i] + mix % tot
                        child = nb[np.searchsorted(wcum, target,
                                                   side="right") - 1]
                    else:
                        deg = indptr[pos2 + 1] - indptr[pos2]
                        rpos = np.repeat(indptr[pos2], fanout)
                        rdeg = np.repeat(deg, fanout)
                        child = nb[rpos + mix % rdeg]
                    cols = [np.concatenate([cols[0], rs]),
                            np.concatenate([cols[1], child]),
                            np.concatenate([cols[2],
                                            np.ones(len(rs), np.int64)])]
            return pa.table({"seed": pa.array(cols[0], pa.int64()),
                             "v": pa.array(cols[1], pa.int64()),
                             "kind": pa.array(cols[2], pa.int64())})

        grouped = (raw.map_batches(tag_v, batch_format="pyarrow")
                   .groupby("bkt").map_groups(work, batch_format="pyarrow")
                   .materialize())
        frontier = grouped.map_batches(kind_filter(0), batch_format="pyarrow")
        outs.append(with_hop(frontier, lvl))
        if not last:
            raw = grouped.map_batches(kind_filter(1), batch_format="pyarrow")

    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res
