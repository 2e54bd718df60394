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
