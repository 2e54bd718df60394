"""Per-superstep, per-partition checkpoint store with lineage manifest.

Layout (SURVEY §7.2 step 9)::

    {root}/{kernel}/
        manifest.json                     # lineage + per-iteration metrics
        iter={k}/part={p}.parquet         # one file per graph partition

Write protocol (crash-safe, mid-iteration resumable — SURVEY §7.6 risk 6):
each partition file is written to ``*.tmp`` then atomically renamed; a
partition file already present for the open iteration is *skipped* (superstep
outputs are deterministic, so a partial iteration's surviving files are
valid). The manifest is only advanced after every partition of the iteration
is on disk — it is the commit point.

Reference analog: output-exists resume (``peak_detect_v4.py:1850-1853``) and
cached-feature resume (``porcine/pig_extract.py:1090-1096``), upgraded from
file-granular to (iteration, partition)-granular with explicit lineage.

Filesystem requirement: part files are written by worker processes and read
back by the driver through the SAME ``root`` path, so ``root`` must be a
shared filesystem (NFS / FUSE-mounted object storage) on a multi-node
cluster — a node-local path is only correct single-node. At cluster scale
point ``root`` at a storage URI via a pyarrow/fsspec filesystem; the write
protocol (tmp + atomic rename, skip-existing, manifest commit) carries over
unchanged on any store with atomic rename.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def graph_fingerprint(graph) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    h.update(f"{graph.P}:{graph.n}:{graph.m}".encode())
    h.update(graph.n_per_part.tobytes())
    return h.hexdigest()


class CheckpointStore:
    def __init__(self, root: str, kernel: str, fingerprint: str, params: dict,
                 retain: int | None = None):
        """``retain``: keep only the newest N complete iterations' state
        files on disk (older ones are deleted after each commit and flagged
        ``pruned`` in the manifest — their metrics/lineage rows stay).
        None (default, or env RAYLINK_CHECKPOINT_RETAIN) keeps everything.
        Retention is operational, not semantic, so it is NOT part of the
        lineage params — a resumed run may use a different retain."""
        if retain is None:
            env = os.environ.get("RAYLINK_CHECKPOINT_RETAIN")
            retain = int(env) if env else None
        if retain is not None and retain < 1:
            raise ValueError("retain must be >= 1 (the resume point)")
        self.retain = retain
        self.dir = os.path.join(root, kernel)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "manifest.json")
        self.fingerprint = fingerprint
        self.params = params
        self.manifest = self._load_manifest()
        if self.manifest is None:
            self.manifest = {
                "kernel": kernel,
                "input_fingerprint": fingerprint,
                "params": params,
                "iterations": {},
            }
        elif self.manifest.get("input_fingerprint") != fingerprint:
            raise ValueError(
                "checkpoint lineage mismatch: store was written for input "
                f"{self.manifest.get('input_fingerprint')}, got {fingerprint}"
            )
        elif self.manifest.get("params") != params:
            raise ValueError(
                "checkpoint lineage mismatch: params "
                f"{self.manifest.get('params')} != {params}"
            )

    def _load_manifest(self):
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return json.load(f)

    def _commit_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    # -- write ------------------------------------------------------------
    def save(self, it: int, state: rd.Dataset, metrics: dict[str, Any]) -> None:
        """Write per-partition files (distributed, atomic, skip-existing),
        then commit the iteration to the manifest."""
        out_dir = os.path.join(self.dir, f"iter={it}")
        os.makedirs(out_dir, exist_ok=True)

        def write_parts(batch: pa.Table) -> pa.Table:
            written = []
            for i in range(batch.num_rows):
                p = int(batch["part"][i].as_py())
                path = os.path.join(out_dir, f"part={p}.parquet")
                if not os.path.exists(path):
                    tmp = path + ".tmp"
                    pq.write_table(batch.slice(i, 1), tmp)
                    os.replace(tmp, path)
                written.append(p)
            return pa.table({"part": pa.array(written, pa.int64())})

        parts = sorted(
            int(p)
            for b in state.map_batches(
                write_parts, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            for p in b["part"].to_pylist()
        )
        self.manifest["iterations"][str(it)] = {
            "parts": parts,
            "complete": True,
            "metrics": metrics,
        }
        # commit the NEW iteration first — the manifest is the commit
        # point; pruning before this commit could crash with the on-disk
        # manifest still pointing at an already-deleted iteration
        self._commit_manifest()
        if self.retain is not None:
            import shutil

            live = sorted(
                int(k) for k, v in self.manifest["iterations"].items()
                if v.get("complete") and not v.get("pruned")
            )
            for old in live[: -self.retain]:
                self.manifest["iterations"][str(old)]["pruned"] = True
            self._commit_manifest()
            for old in live[: -self.retain]:
                shutil.rmtree(os.path.join(self.dir, f"iter={old}"),
                              ignore_errors=True)

    # -- read -------------------------------------------------------------
    def latest(self) -> tuple[int, rd.Dataset] | None:
        """Newest complete iteration -> (iter, state Dataset), else None.
        Incomplete trailing iterations are left in place; their finished
        partition files are reused by the skip-existing write."""
        iters = sorted(
            int(k) for k, v in self.manifest["iterations"].items()
            if v.get("complete") and not v.get("pruned")
        )
        if not iters:
            return None
        it = iters[-1]
        state = rd.read_parquet(os.path.join(self.dir, f"iter={it}"))
        return it, state.materialize()

    def metrics_history(self) -> dict[int, dict]:
        return {
            int(k): v.get("metrics", {})
            for k, v in self.manifest["iterations"].items()
        }
