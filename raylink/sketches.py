"""Mergeable sketches — the 100 TB path for exact-but-unscalable aggregates.

Round 1 ships HyperLogLog distinct counting: per-batch partial sketches
(one register array per group per batch) merged by a tiny grouped
element-wise max — the canonical partial+final combine with O(groups * 2^p)
shuffle bytes regardless of row count. The exact twin is
``ops.distinct_count``; tests bound the relative error (~1.04/sqrt(2^p)).

Reference parity: the reference uses exact quantiles/counts only
(SURVEY §2.8 notes no sketches); this is a deliberate scale extension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .graph import hash64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _registers(values: pa.Array, p: int) -> np.ndarray:
    """HLL register array (2^p uint8) for a batch of values — vectorized."""
    m = 1 << p
    h = hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading-zero count of the (64-p)-bit remainder + 1
    bits = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    bits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rho = (64 - p) - bits + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:  # linear-counting small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: rd.Dataset, group_col: str, value_col: str,
                    out_col: str, *, p: int = 12) -> rd.Dataset:
    """(group, approx distinct values) via HLL(p). Shuffle volume:
    one 2^p-byte register vector per (group, batch) — independent of rows."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].combine_chunks()
        v = batch[value_col].combine_chunks()
        order = pa.compute.sort_indices(g)
        gs = g.take(order)
        vs = v.take(order)
        gnp = gs.to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.r_[True, gnp[1:] != gnp[:-1]])
        out_g, out_r = [], []
        ends = np.r_[bounds[1:], len(gnp)]
        for lo, hi in zip(bounds, ends):
            out_g.append(gnp[lo])
            out_r.append(_registers(vs.slice(int(lo), int(hi - lo)), p))
        return pa.table({
            group_col: pa.array(out_g),
            "regs": pa.array([r.tobytes() for r in out_r], pa.binary()),
        })

    def merge(grp: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for b in grp["regs"]:
            acc = np.maximum(acc, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame({group_col: [grp[group_col].iloc[0]],
                             out_col: [int(round(_estimate(acc)))]})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# mergeable quantile summary (the KLL/t-digest role; VERDICT r1 item 6)
# ---------------------------------------------------------------------------

def quantile_summary(ds: rd.Dataset, col: str, *, q: int = 512):
    """Mergeable quantile summary: each batch emits at most ``q`` equally
    spaced order statistics, each weighted ``n_b / q`` — a one-level
    compaction. Returns driver-side ``(vals, weights, n)`` with total size
    O(#batches * q), INDEPENDENT of row count (vs the full-column gather of
    the exact twin). Merged rank error is bounded by sum_b(n_b/q) = n/q
    (each batch's summary displaces any rank by at most its grid step), so
    a quantile from the merged summary is off by at most ~1/q in rank.
    """

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.sort(x[~np.isnan(x)])
        n_b = len(x)
        if n_b == 0:
            return pa.table({"vals": pa.array([], pa.list_(pa.float64())),
                             "w": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        if n_b <= q:
            vals, w = x, 1.0
        else:
            pos = ((np.arange(q) + 0.5) * n_b / q).astype(np.int64)
            vals, w = x[np.clip(pos, 0, n_b - 1)], n_b / q
        return pa.table({
            "vals": pa.array([vals], pa.list_(pa.float64())),
            "w": pa.array([float(w)], pa.float64()),
            "n": pa.array([n_b], pa.int64()),
        })

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    vals_parts, w_parts, n = [], [], 0
    for b in rows.iter_batches(batch_format="pyarrow"):
        vl = b["vals"].combine_chunks()
        flat = vl.flatten().to_numpy(zero_copy_only=False)
        offs = vl.offsets.to_numpy(zero_copy_only=False)
        ws = b["w"].to_numpy(zero_copy_only=False)
        ns = b["n"].to_numpy(zero_copy_only=False)
        for i in range(b.num_rows):
            seg = flat[offs[i]: offs[i + 1]]
            vals_parts.append(seg)
            w_parts.append(np.full(len(seg), ws[i]))
            n += int(ns[i])
    if not vals_parts:
        return np.array([]), np.array([]), 0
    vals = np.concatenate(vals_parts)
    weights = np.concatenate(w_parts)
    order = np.argsort(vals, kind="stable")
    return vals[order], weights[order], n


def summary_quantile(vals: np.ndarray, weights: np.ndarray,
                     p: float) -> float:
    """Weighted nearest-rank quantile from a merged summary."""
    if len(vals) == 0:
        return float("nan")
    cum = np.cumsum(weights)
    idx = int(np.searchsorted(cum, p * cum[-1]))
    return float(vals[min(idx, len(vals) - 1)])


# ---------------------------------------------------------------------------
# Bloom filter (set-membership sketch backing semi/anti-join prefilters)
# ---------------------------------------------------------------------------

_BLOOM_SEED2 = 1337


def _bloom_positions(values: pa.Array | pa.ChunkedArray, num_bits: int,
                     num_hashes: int) -> np.ndarray:
    """(n, num_hashes) bit positions via double hashing: pos_i = (h1 + i*h2)
    mod m with h2 forced odd (full-period stride for power-of-two m)."""
    h1 = hash64(values)
    h2 = hash64(values, seed=_BLOOM_SEED2) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(num_bits)).astype(np.int64)


def bloom_build(ds: rd.Dataset, col: str, *, num_bits: int = 1 << 23,
                num_hashes: int = 5, chunks: int = 32) -> np.ndarray:
    """Distributed Bloom-filter build over ``ds[col]``: each batch emits its
    set-bit bytes split into ``chunks`` fixed byte ranges; a tiny
    ``groupby(chunk)`` bit-ORs the partials so the driver collects exactly
    ``num_bits/8`` bytes once — never the keys. Returns the packed uint8
    bit array (broadcast it with ``ray.put``).

    With n keys, FP rate ~= (1 - e^(-kn/m))^k; at the default m=8M bits and
    k=5 that is <1% up to ~800k keys. False positives only cost exactness of
    the PREfilter, never of the joins built on it (see ``ops.semi_join``).
    """
    if num_bits % (8 * chunks):
        raise ValueError("num_bits must be divisible by 8*chunks")
    chunk_bytes = num_bits // 8 // chunks

    def partial(batch: pa.Table) -> pa.Table:
        pos = _bloom_positions(batch[col], num_bits, num_hashes).ravel()
        byte_idx = pos >> 3
        bit = (pos & 7).astype(np.uint8)
        chunk = byte_idx // chunk_bytes
        out_c, out_b = [], []
        for c in np.unique(chunk):
            sel = chunk == c
            seg = np.zeros(chunk_bytes, dtype=np.uint8)
            np.bitwise_or.at(seg, byte_idx[sel] - int(c) * chunk_bytes,
                             np.left_shift(np.uint8(1), bit[sel]))
            out_c.append(int(c))
            out_b.append(seg.tobytes())
        return pa.table({"chunk": pa.array(out_c, pa.int64()),
                         "bits": pa.array(out_b, pa.binary())})

    def merge(grp: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(chunk_bytes, dtype=np.uint8)
        for b in grp["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"chunk": [int(grp["chunk"].iloc[0])],
                             "bits": [acc.tobytes()]})

    rows = (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("chunk").map_groups(merge, batch_format="pandas"))
    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    for b in rows.iter_batches(batch_format="pyarrow"):
        cs = b["chunk"].to_numpy(zero_copy_only=False)
        for j in range(b.num_rows):
            seg = np.frombuffer(b["bits"][j].as_py(), dtype=np.uint8)
            bits[int(cs[j]) * chunk_bytes:(int(cs[j]) + 1) * chunk_bytes] = seg
    return bits


def bloom_may_contain(bits: np.ndarray, values: pa.Array | pa.ChunkedArray,
                      *, num_hashes: int = 5) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (FP possible),
    False = DEFINITELY absent."""
    num_bits = len(bits) * 8
    pos = _bloom_positions(values, num_bits, num_hashes)
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)


def approx_iqr_outliers(ds: rd.Dataset, col: str, k: float = 1.5,
                        keep_cols: list | None = None, *,
                        q: int = 512) -> rd.Dataset:
    """Sketch-backed twin of ``ops.iqr_outliers``: pass 1 is the mergeable
    quantile summary (O(batches*q) driver bytes instead of the full
    column), pass 2 the identical vectorized filter. Thresholds differ
    from exact by <= ~1/q in rank (bounded in tests)."""
    import pyarrow.compute as pc

    vals, weights, _ = quantile_summary(ds, col, q=q)
    q1 = summary_quantile(vals, weights, 0.25)
    q3 = summary_quantile(vals, weights, 0.75)
    lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)

    def f(batch: pa.Table) -> pa.Table:
        c = batch[col]
        mask = pc.or_(pc.less(c, lo), pc.greater(c, hi))
        out = batch.filter(mask)
        return out.select(keep_cols) if keep_cols else out

    return ds.map_batches(f, batch_format="pyarrow")


def heavy_hitters(ds: rd.Dataset, col: str, *, phi: float,
                  k: int | None = None) -> rd.Dataset:
    """EXACT frequent items at threshold ``phi`` (count >= ceil(phi * N))
    via a Misra-Gries candidate pass + an exact verification pass — the
    two-pass pattern that makes "GROUP BY key HAVING count >= t" scale
    when the key space is huge but the answer is small (hot users, hot
    domains, hot n-grams).

    Pass 1: each batch builds a size-``k`` MG summary (exact local counts,
    decremented by the (k+1)-th largest and truncated — vectorized
    np.unique, no Python loop); summing summaries per value underestimates
    a true count by at most N/(k+1), so with ``k >= 2/phi`` (default
    4/phi) every true heavy hitter survives as a candidate. Candidate ids
    are a small driver-side set by construction (<= k per batch, deduped).

    Pass 2: broadcast the candidate array, count ONLY candidate rows per
    batch (np.searchsorted membership), one tiny grouped sum, filter by
    the exact threshold. Output (value, n) is exact — the SQL twin is the
    plain HAVING query."""
    import ray
    from ray.data.aggregate import Sum

    if not (0.0 < phi < 1.0):
        raise ValueError("phi must be in (0, 1)")
    k = k or max(8, int(np.ceil(4.0 / phi)))

    def mg_summary(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(v, return_counts=True)
        cnt = cnt.astype(np.int64)
        if len(vals) > k:
            # MG reduction to k survivors: subtract the (k+1)-th largest
            # count, keep strictly positive remainders
            kth = np.partition(cnt, len(cnt) - k - 1)[len(cnt) - k - 1]
            keep = cnt > kth
            if not keep.any():
                # all counts tie at kth (ultra-flat batch): keep one value
                # at weight 0 so batch_n (the N partial) still rides out
                vals, cnt = vals[:1], np.zeros(1, np.int64)
            else:
                vals, cnt = vals[keep], cnt[keep] - kth
        return pa.table({col: pa.array(vals),
                         "mg_n": pa.array(cnt, pa.int64()),
                         "batch_n": pa.array(
                             np.r_[np.int64(len(v)),
                                   np.zeros(len(vals) - 1, np.int64)]
                             if len(vals) else np.array([], np.int64))})

    summaries = ds.select_columns([col]).map_batches(
        mg_summary, batch_format="pyarrow", zero_copy_batch=True)
    merged = summaries.groupby(col).aggregate(
        Sum("mg_n", alias_name="est"), Sum("batch_n", alias_name="bn")
    ).to_pandas()
    if merged.empty:
        return rd.from_arrow(pa.table({col: pa.array([], pa.int64()),
                                       "n": pa.array([], pa.int64())}))
    total = int(merged["bn"].sum())
    threshold = int(np.ceil(phi * total))
    slack = total // (k + 1)  # max undercount across merged summaries
    cand = np.sort(merged.loc[merged["est"] + slack >= threshold,
                              col].to_numpy())
    cand_ref = ray.put(cand)

    def count_cand(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(c, v)
        ok = (pos < len(c)) & (c[np.minimum(pos, len(c) - 1)] == v)
        vals, cnt = np.unique(v[ok], return_counts=True)
        return pa.table({col: pa.array(vals),
                         "pn": pa.array(cnt.astype(np.int64), pa.int64())})

    counted = (ds.select_columns([col])
               .map_batches(count_cand, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby(col).aggregate(Sum("pn", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        keep = pa.array(
            batch["n"].to_numpy(zero_copy_only=False) >= threshold)
        return batch.filter(keep)

    return counted.map_batches(finish, batch_format="pyarrow")


def mode_value(ds: rd.Dataset, col: str, *, k: int = 256):
    """EXACT mode (most frequent value, min-value tiebreak) with bounded
    driver bytes — the scale path behind ``ops.impute(strategy="mode")``
    (VERDICT r2 "what's wrong" #3: the old path drove a full
    ``groupby(col)`` result to the driver, unbounded for high-cardinality
    columns).

    Pass 1: per-batch Misra-Gries summaries of size ``k`` (same reduction
    as :func:`heavy_hitters`); the grouped sum of summaries underestimates
    any true count by at most ``slack = N // (k + 1)``.  Every value whose
    true count can reach the maximum — ``est >= max(est) - slack`` — is a
    mode candidate; values absent from all summaries have true count
    <= slack and are covered by the guard below.

    Pass 2: broadcast the sorted candidate array (``ray.put`` once), count
    ONLY candidate rows per batch, one tiny grouped sum.  If the best
    exact candidate count exceeds ``slack`` no non-candidate can beat it
    and the result is exact.  Otherwise (pathologically flat distribution:
    mode frequency <= N/(k+1)) fall back to the full grouped count —
    correct always, bounded driver bytes whenever a meaningful mode
    exists.

    Returns ``(value, info)`` where ``info`` carries ``n_candidates`` /
    ``exact_via_sketch`` for tests to assert the driver-byte bound.
    """
    import ray
    from ray.data.aggregate import Sum

    def mg_summary(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(v, return_counts=True)
        cnt = cnt.astype(np.int64)
        if len(vals) > k:
            kth = np.partition(cnt, len(cnt) - k - 1)[len(cnt) - k - 1]
            keep = cnt > kth
            if not keep.any():
                # ultra-flat batch: keep one value at weight 0 so batch_n
                # (the N partial) still rides out (same guard as
                # heavy_hitters)
                vals, cnt = vals[:1], np.zeros(1, np.int64)
            else:
                vals, cnt = vals[keep], cnt[keep] - kth
        return pa.table({col: pa.array(vals),
                         "mg_n": pa.array(cnt, pa.int64()),
                         "batch_n": pa.array(
                             np.r_[np.int64(len(v)),
                                   np.zeros(len(vals) - 1, np.int64)]
                             if len(vals) else np.array([], np.int64))})

    merged = ds.select_columns([col]).map_batches(
        mg_summary, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(col).aggregate(
        Sum("mg_n", alias_name="est"), Sum("batch_n", alias_name="bn")
    ).to_pandas()
    if merged.empty:
        raise ValueError(f"mode of empty/all-null column {col!r}")
    total = int(merged["bn"].sum())
    slack = total // (k + 1)
    est = merged["est"].to_numpy()
    cand = np.sort(merged.loc[est >= est.max() - slack, col].to_numpy())
    cand_ref = ray.put(cand)

    def count_cand(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(c, v)
        ok = (pos < len(c)) & (c[np.minimum(pos, len(c) - 1)] == v)
        vals, cnt = np.unique(v[ok], return_counts=True)
        return pa.table({col: pa.array(vals),
                         "pn": pa.array(cnt.astype(np.int64), pa.int64())})

    counted = (ds.select_columns([col])
               .map_batches(count_cand, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby(col).aggregate(Sum("pn", alias_name="n"))
               .to_pandas())
    best_n = int(counted["n"].max())
    info = {"n_candidates": int(len(cand)), "slack": slack,
            "exact_via_sketch": best_n > slack}
    if info["exact_via_sketch"]:
        best = counted.loc[counted["n"] == best_n, col].min()
        return best, info
    # flat-distribution fallback: exact full grouped count (driver-side,
    # the pre-round-3 behavior) — only reachable when every value's
    # frequency is <= N/(k+1)
    from ray.data.aggregate import Count

    full = ds.select_columns([col]).groupby(col).aggregate(
        Count(alias_name="n")).to_pandas()
    best_n = int(full["n"].max())
    best = full.loc[full["n"] == best_n, col].min()
    return best, info
