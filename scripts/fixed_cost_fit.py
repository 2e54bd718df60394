"""Quantify the fixed-cost share of the flagship job from scaling runs.

Model: each stage's wall time at ncpu is t(ncpu) = F + V/ncpu, where F is
fixed per-job overhead (Dataset operator launches, shuffle barriers, driver
coordination) and V is perfectly-parallel work. Two measurements (lo=2,
hi=8 CPUs) pin both: F = (4*t_hi - t_lo)/3, V = 2*(t_lo - t_hi)*8/6.

The raw scaling efficiency the model predicts for a job k times larger
(V -> k*V, F unchanged) follows directly; this is the number that says what
the 2->8 ratio converges to as the job grows toward the 100 TB regime.

Usage: python scripts/fixed_cost_fit.py BENCH/scaling_r4*.json
"""

from __future__ import annotations

import json
import sys

STAGES = ("extract", "graph_build", "pagerank", "cc", "triangles")
LO, HI = 2, 8


def fit(path: str) -> None:
    with open(path) as f:
        r = json.load(f)
    qlo, qhi = r["queries_lo"], r["queries_hi"]
    tot_f = tot_v = tot_lo = tot_hi = 0.0
    rows = []
    for s in STAGES:
        t_lo, t_hi = qlo[s], qhi[s]
        f_fix = max(0.0, (4 * t_hi - t_lo) / 3)
        v = (t_lo - f_fix) * LO
        rows.append((s, t_lo, t_hi, f_fix, v, f_fix / t_hi if t_hi else 0.0))
        tot_f += f_fix
        tot_v += v
        tot_lo += t_lo
        tot_hi += t_hi

    def eff(k: float) -> float:
        lo = tot_f + k * tot_v / LO
        hi = tot_f + k * tot_v / HI
        return (lo / hi) / (HI / LO)

    print(f"== {path}")
    print(f"   raw efficiency (recorded): {r['scaling_efficiency']}")
    for s, t_lo, t_hi, f_fix, v, share in rows:
        print(f"   {s:12s} lo={t_lo:7.2f}s hi={t_hi:7.2f}s "
              f"fixed={f_fix:6.2f}s ({share:4.0%} of hi wall)")
    print(f"   TOTAL fixed {tot_f:.2f}s = {tot_f / tot_hi:.0%} of the "
          f"{tot_hi:.1f}s hi-level wall")
    print(f"   model raw eff at job size 1x/4x/16x/64x: "
          f"{eff(1):.3f} / {eff(4):.3f} / {eff(16):.3f} / {eff(64):.3f}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        fit(p)
