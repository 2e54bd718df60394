"""Link prediction: top-k non-adjacent pairs by common-neighbor scores.

Adamic-Adar (sum 1/ln(deg(w)) over common neighbors w) and the
resource-allocation index (sum 1/deg(w)) are the classic web-graph
"who should link to whom" signals. Reference parity: this is the
candidate-scoring shape of the reference's proximity gates (nearest-peak
association, peak_detect_v4.py:1064-1087) re-expressed as a distributed
pair join.

Shape: one full-neighborhood wedge join. Unlike triangle counting, the
pair generation here cannot be degree-oriented — a pair (a, b) must be
credited for EVERY common neighbor w, whatever w's degree rank — so the
wedge volume is sum(deg(w)^2)/2 by definition of the score. Per-center
weights are integer fixed-point (floor(1e9/ln(d) + 0.5), computed per
distinct degree via libm so the SQL oracle's ln matches bit-for-bit),
summed exactly as int64 — order-independent across buckets. Wedges are
bucketed by the hash of the FULL pair code (hot centers spread uniformly
over buckets, same skew argument as triangles.py). Each bucket drops
pairs that are existing edges, aggregates the rest, and keeps only rows
whose within-bucket count of strictly-greater aa scores is < k — a
boundary-tie-preserving preselect, so the returned dataset is a SUPERSET
of the global top-k under ANY tie-break; callers finish with an ordered
sort + limit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph
from .triangles import _bucket_of, _deg_of

_AA_SCHEMA = pa.schema([
    pa.field("bucket", pa.int64()),
    pa.field("kind", pa.int8()),  # 0 = canonical edge codes, 1 = wedge credit
    pa.field("codes", pa.list_(pa.int64())),
    pa.field("cnt", pa.list_(pa.int64())),
    pa.field("aa", pa.list_(pa.int64())),
    pa.field("ra", pa.list_(pa.int64())),
])

_EMPTY_I64 = np.array([], dtype=np.int64)

_OUT_SCHEMA = pa.schema([
    pa.field("src_vid", pa.int64()),
    pa.field("dst_vid", pa.int64()),
    pa.field("n_common", pa.int64()),
    pa.field("aa_fp", pa.int64()),
    pa.field("ra_fp", pa.int64()),
])


def _weights_for(deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-vertex center weights, integer 1e-9 fixed-point. ln via
    math.log (libm) per DISTINCT degree — not numpy's vectorized log,
    whose SIMD path can differ from libm in the last ulp and flip the
    floor vs the DuckDB oracle."""
    uniq, inv = np.unique(deg, return_inverse=True)
    aa_u = np.zeros(len(uniq), dtype=np.int64)
    ra_u = np.zeros(len(uniq), dtype=np.int64)
    for i, d in enumerate(uniq):
        d = int(d)
        if d >= 2:
            aa_u[i] = int(math.floor(1e9 / math.log(d) + 0.5))
            ra_u[i] = int(math.floor(1e9 / d + 0.5))
    return aa_u[inv], ra_u[inv]


@ray.remote
def _count_deg_over(blk, cap: int) -> int:
    """Distributed count of centers above the wedge cap (no degree array
    ever reaches the driver)."""
    return int((blk.deg.astype(np.int64) > cap).sum())


def _pack_lists(bucket: np.ndarray, kind: int, codes: np.ndarray,
                cnt: np.ndarray | None, aa: np.ndarray | None,
                ra: np.ndarray | None) -> pa.Table:
    order = np.argsort(bucket, kind="stable")
    b = bucket[order]
    bounds = np.flatnonzero(np.r_[True, b[1:] != b[:-1], True])
    st, en = bounds[:-1], bounds[1:]
    offs = pa.array(np.concatenate([[0], (en - st).cumsum()]), pa.int32())
    k = len(st)
    zero_offs = pa.array(np.zeros(k + 1, np.int32), pa.int32())

    def col(v):
        if v is None:
            return pa.ListArray.from_arrays(zero_offs, pa.array(_EMPTY_I64))
        return pa.ListArray.from_arrays(offs, pa.array(v[order], pa.int64()))

    return pa.table({
        "bucket": pa.array(b[st], pa.int64()),
        "kind": pa.array(np.full(k, kind, np.int8), pa.int8()),
        "codes": col(codes),
        "cnt": col(cnt),
        "aa": col(aa),
        "ra": col(ra),
    }, schema=_AA_SCHEMA)


def adamic_adar_candidates(graph: Graph, k: int = 50, *,
                           buckets: int | None = None,
                           max_emit: int = 1 << 22,
                           max_center_deg: int | None = None,
                           metrics_out: list | None = None) -> rd.Dataset:
    """Candidate links over a SYMMETRIC build: rows (src_vid, dst_vid,
    n_common, aa_fp, ra_fp) for non-adjacent pairs (src_vid < dst_vid)
    with >= 1 common neighbor — a superset of the global top-k by aa_fp
    (per-bucket boundary-tie-preserving preselect; see module docstring).
    Callers finish with sort([aa desc, tiebreak]).limit(k).

    ``max_center_deg``: the documented extreme-skew escape hatch — the
    wedge volume is inherently sum(deg(w)^2)/2, so one degree-10^6 hub
    alone emits 5*10^11 pairs. Setting a cap SKIPS wedge credits from
    centers with deg > cap (each skipped credit is worth < 1/ln(cap), the
    smallest of all AA weights, so top-k candidates dominated by
    low-degree closures are usually unaffected). NOT silent: the number
    of skipped centers is counted distributedly, logged loudly, and
    appended to ``metrics_out`` when provided."""
    P = graph.P
    parts = graph.parts_with_edges()
    if not parts:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    B = buckets or max(32, P)
    max_vid = int(graph.n_per_part.max()) * P + P
    if graph.n >= (1 << 31):
        raise NotImplementedError(
            "int64 pair codes require n < ~3e9; widen to 2-column probes")
    C = np.int64(max_vid + 1)
    refs = graph.blocks
    deg_refs = {p: _deg_of.remote(refs[p][0]) for p in parts}

    if max_center_deg is not None:
        skipped = sum(ray.get([
            _count_deg_over.remote(refs[p][0], int(max_center_deg))
            for p in parts]))
        if skipped:
            import logging

            logging.getLogger("raylink").warning(
                "adamic_adar_candidates: dropping wedge credits from %d "
                "centers with deg > %d (documented approximation; each "
                "dropped credit < 1/ln(%d))",
                skipped, max_center_deg, max_center_deg)
        if metrics_out is not None:
            metrics_out.append({"skipped_centers": int(skipped),
                                "max_center_deg": int(max_center_deg)})

    def emit(batch: pa.Table) -> pa.Table:
        import ray as _ray

        tabs = [_AA_SCHEMA.empty_table()]
        for p in batch["part"].to_pylist():
            chunks = [_ray.get(r) for r in refs[p]]
            deg_u = chunks[0].deg.astype(np.int64)
            us, vs = [], []
            for blk in chunks:
                for q in range(P):
                    lo, hi = blk.bounds[q], blk.bounds[q + 1]
                    if hi <= lo:
                        continue
                    us.append(blk.src_local[lo:hi].astype(np.int64) * P + p)
                    vs.append(blk.dst_local[lo:hi].astype(np.int64) * P + q)
            u = np.concatenate(us)
            v = np.concatenate(vs)
            # canonical edge codes: each undirected edge appears exactly
            # once as its u < v directed slot in a symmetric build
            ek = u < v
            ecodes = u[ek] * C + v[ek]
            if len(ecodes):
                tabs.append(_pack_lists(_bucket_of(ecodes, B), 0, ecodes,
                                        None, None, None))
            if max_center_deg is not None:
                # drop hub centers AFTER the edge codes are out: edges must
                # always be visible to the existing-pair filter
                keepw = deg_u[(u // np.int64(P))] <= max_center_deg
                u, v = u[keepw], v[keepw]
                if len(u) == 0:
                    continue
            # full-neighborhood wedges: sort slots by (center, neighbor)
            order = np.lexsort((v, u))
            su, sv = u[order], v[order]
            aa_w, ra_w = _weights_for(deg_u)
            seg = np.flatnonzero(np.r_[True, su[1:] != su[:-1], True])
            starts, ends = seg[:-1], seg[1:]
            lens = ends - starts
            pos = np.arange(len(su)) - np.repeat(starts, lens)
            first_counts = np.repeat(lens, lens) - 1 - pos
            total = int(first_counts.sum())
            if total == 0:
                continue
            cum = np.concatenate([[0], first_counts.cumsum()])
            cuts = [0]
            while cum[cuts[-1]] < total:
                nxt = int(np.searchsorted(cum, cum[cuts[-1]] + max_emit))
                nxt = max(nxt, cuts[-1] + 1)
                cuts.append(min(nxt, len(su)))
            for a, bnd in zip(cuts[:-1], cuts[1:]):
                fc = first_counts[a:bnd]
                tot = int(fc.sum())
                if tot == 0:
                    continue
                rep_first = np.repeat(np.arange(a, bnd), fc)
                offs = fc.cumsum()
                second = (np.arange(tot) - np.repeat(offs - fc, fc)
                          + rep_first + 1)
                # neighbors sorted ascending per center -> codes canonical
                wcodes = sv[rep_first] * C + sv[second]
                ctr_local = su[rep_first] // P
                w_aa = aa_w[ctr_local]
                w_ra = ra_w[ctr_local]
                # pre-aggregate per code within the slice (same pair can
                # close through many centers of this partition)
                ucodes, inv = np.unique(wcodes, return_inverse=True)
                cnt = np.bincount(inv).astype(np.int64)
                # int64 accumulation (bincount's float weights would lose
                # exactness past 2^53)
                aa_s = np.zeros(len(ucodes), np.int64)
                ra_s = np.zeros(len(ucodes), np.int64)
                np.add.at(aa_s, inv, w_aa)
                np.add.at(ra_s, inv, w_ra)
                tabs.append(_pack_lists(_bucket_of(ucodes, B), 1, ucodes,
                                        cnt, aa_s, ra_s))
        return pa.concat_tables(tabs)

    def probe(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)

        def flat(col, i):
            c = group[col].combine_chunks()
            o = c.offsets.to_numpy(zero_copy_only=False)
            return c.flatten().to_numpy(zero_copy_only=False)[o[i]: o[i + 1]]

        e_parts, w_parts = [], []
        for i in range(group.num_rows):
            if kinds[i] == 0:
                e_parts.append(flat("codes", i))
            else:
                w_parts.append((flat("codes", i), flat("cnt", i),
                                flat("aa", i), flat("ra", i)))
        if not w_parts:
            return _OUT_SCHEMA.empty_table()
        wcodes = np.concatenate([w[0] for w in w_parts])
        ucodes, inv = np.unique(wcodes, return_inverse=True)
        cnt = np.zeros(len(ucodes), dtype=np.int64)
        aa = np.zeros(len(ucodes), dtype=np.int64)
        ra = np.zeros(len(ucodes), dtype=np.int64)
        off = 0
        for codes, c, a, r in w_parts:
            sl = inv[off: off + len(codes)]
            np.add.at(cnt, sl, c)
            np.add.at(aa, sl, a)
            np.add.at(ra, sl, r)
            off += len(codes)
        if e_parts:
            ecodes = np.sort(np.concatenate(e_parts))
            pos = np.searchsorted(ecodes, ucodes)
            safe = np.minimum(pos, len(ecodes) - 1)
            adj = (pos < len(ecodes)) & (ecodes[safe] == ucodes)
            keep = ~adj
            ucodes, cnt, aa, ra = (ucodes[keep], cnt[keep], aa[keep],
                                   ra[keep])
        if len(ucodes) > k:
            # keep rows with < k strictly-greater aa scores in this bucket
            kth = np.partition(aa, len(aa) - k)[len(aa) - k]
            keep = aa >= kth
            ucodes, cnt, aa, ra = (ucodes[keep], cnt[keep], aa[keep],
                                   ra[keep])
        return pa.table({
            "src_vid": pa.array(ucodes // C, pa.int64()),
            "dst_vid": pa.array(ucodes % C, pa.int64()),
            "n_common": pa.array(cnt, pa.int64()),
            "aa_fp": pa.array(aa, pa.int64()),
            "ra_fp": pa.array(ra, pa.int64()),
        }, schema=_OUT_SCHEMA)

    parts_ds = rd.from_arrow(
        pa.table({"part": pa.array(parts, pa.int64())})
    ).repartition(len(parts))
    return (
        parts_ds.map_batches(emit, batch_format="pyarrow", batch_size=1,
                             zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(probe, batch_format="pyarrow")
    )
