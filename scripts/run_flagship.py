"""Operational entry point for the flagship pipeline — the script you'd
hand to ``ray job submit`` on a real cluster:

    python scripts/run_flagship.py --pages <parquet dir or synthetic:N> \
        --out /tmp/raylink_out --checkpoint /tmp/raylink_state [--p 64]

Reads a pages parquet table (url, warc_ts, html, text, lang), runs
extract -> graph -> PageRank/CC/LP/triangles with per-superstep
checkpointing, writes partitioned parquet outputs + metrics.json.
Rerunning after a crash resumes: finished output tables are skipped and
kernels continue from their newest complete checkpointed iteration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="parquet path, or synthetic:N for an N-page corpus")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--p", type=int, default=64, help="graph partitions")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray
    import ray.data as rd
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from raylink.pipelines.flagship import flagship
    from raylink.sinks import save_flagship
    from raylink.tables import PageSpec, pages_dataset

    if args.pages.startswith("synthetic:"):
        n = int(args.pages.split(":", 1)[1])
        base = PageSpec(overlay_avg_links=6.0).n_pages
        spec = PageSpec(overlay_avg_links=6.0, extra_pages=max(0, n - base))
        pages = pages_dataset(spec, parallelism=4 * args.num_cpus)
    else:
        pages = rd.read_parquet(args.pages)

    result = flagship(pages, P=args.p, damping=args.damping, tol=args.tol,
                      checkpoint_dir=args.checkpoint,
                      extract_concurrency=(1, args.num_cpus))
    written = save_flagship(result, args.out)
    print(json.dumps({
        "out": args.out,
        "written": written,
        "n_vertices": result.graph.n,
        "n_edges": result.graph.m,
        "triangles": result.triangles,
        "pagerank_iters": result.metrics.get("pagerank_iters"),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
