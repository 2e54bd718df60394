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

Filesystem: ``root`` may be a plain path OR a storage URI (``file://``,
``s3://``, ``gs://`` — anything ``pyarrow.fs.FileSystem.from_uri``
resolves). Workers reconstruct the filesystem from the root string, so on
a multi-node cluster point ``root`` at shared/object storage. Atomicity:
local filesystems use tmp + rename; object stores rely on single-PUT
atomicity (no rename needed) — the manifest write remains the commit
point either way. A node-local plain path is only correct single-node.
"""

from __future__ import annotations

import json
import os
import posixpath
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _fs_of(root: str):
    """(filesystem, path, is_uri) for a plain path or a storage URI
    (file://, s3://, gs://, ... — anything pyarrow.fs resolves). Plain
    paths use LocalFileSystem so one code path serves both."""
    from pyarrow import fs as pafs

    if "://" in root:
        f, path = pafs.FileSystem.from_uri(root)
        return f, path, True
    return pafs.LocalFileSystem(), os.path.abspath(root), False


def write_state_parts(tab: pa.Table, root: str, kernel: str, it: int) -> list[int]:
    """Write one parquet file per (part, vec, ...) row under
    ``{root}/{kernel}/iter={it}/part={p}.parquet`` — tmp + atomic rename on
    POSIX, single-PUT on object stores, skip-existing (superstep outputs
    are deterministic, so a torn iteration's surviving files are valid).
    Callable from Dataset ``map_batches`` tasks AND from BSP actors: the
    filesystem is reconstructed from the root string, so only strings and
    the Arrow table cross the process boundary. Returns every partition id
    now present (written or pre-existing)."""
    from pyarrow import fs as pafs

    wfs, base, _ = _fs_of(root)
    odir = posixpath.join(base, kernel, f"iter={it}")
    wfs.create_dir(odir, recursive=True)
    present = []
    for i in range(tab.num_rows):
        p = int(tab["part"][i].as_py())
        path = posixpath.join(odir, f"part={p}.parquet")
        if wfs.get_file_info(path).type == pafs.FileType.NotFound:
            if isinstance(wfs, pafs.LocalFileSystem):
                tmp = path + ".tmp"
                pq.write_table(tab.slice(i, 1), tmp, filesystem=wfs)
                wfs.move(tmp, path)
            else:
                pq.write_table(tab.slice(i, 1), path, filesystem=wfs)
        present.append(p)
    return present


def graph_fingerprint(graph) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    h.update(f"{graph.P}:{graph.n}:{graph.m}".encode())
    h.update(graph.n_per_part.tobytes())
    return h.hexdigest()


def check_resume_bound(kernel: str, start_iter: int, max_iter: int) -> None:
    """A checkpoint ahead of the requested unroll cannot be truncated:
    the loop `range(start_iter + 1, max_iter + 1)` would be empty and the
    LONGER run's state would silently come back as if it were the
    ``max_iter``-round result (fixed-unroll oracle parity breaks, and
    scaled iterates like Katz's y_k would even be misnormalized). Raise
    instead of returning a wrong-horizon result."""
    if start_iter > max_iter:
        raise ValueError(
            f"{kernel}: checkpoint resumes at superstep {start_iter} but "
            f"max_iter={max_iter} was requested — a resumed run cannot be "
            f"truncated below its checkpoint; pass max_iter >= "
            f"{start_iter} or a fresh checkpoint_dir")


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
        self.root = root
        self.kernel = kernel
        fs, base, self.is_uri = _fs_of(root)
        self.fs = fs
        self.dir = posixpath.join(base, kernel)
        fs.create_dir(self.dir, recursive=True)
        self.manifest_path = posixpath.join(self.dir, "manifest.json")
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
        from pyarrow import fs as pafs

        info = self.fs.get_file_info(self.manifest_path)
        if info.type == pafs.FileType.NotFound:
            return None
        with self.fs.open_input_stream(self.manifest_path) as f:
            return json.loads(f.read().decode())

    def _commit_manifest(self) -> None:
        payload = json.dumps(self.manifest, indent=1, sort_keys=True).encode()
        from pyarrow import fs as pafs

        if isinstance(self.fs, pafs.LocalFileSystem):
            # POSIX rename is the atomic commit
            tmp = self.manifest_path + ".tmp"
            with self.fs.open_output_stream(tmp) as f:
                f.write(payload)
            self.fs.move(tmp, self.manifest_path)
        else:
            # object stores: a single PUT is atomic; there is no rename
            with self.fs.open_output_stream(self.manifest_path) as f:
                f.write(payload)

    # -- write ------------------------------------------------------------
    def save(self, it: int, state: rd.Dataset, metrics: dict[str, Any]) -> None:
        """Write per-partition files (distributed, atomic, skip-existing),
        then commit the iteration to the manifest."""
        root, kernel = self.root, self.kernel

        def write_parts(batch: pa.Table) -> pa.Table:
            # workers reconstruct the filesystem from the root string (the
            # fs handle itself need not survive serialization)
            written = write_state_parts(batch, root, kernel, it)
            return pa.table({"part": pa.array(written, pa.int64())})

        parts = sorted(
            int(p)
            for b in state.map_batches(
                write_parts, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            for p in b["part"].to_pylist()
        )
        self.commit(it, parts, metrics)

    def commit(self, it: int, parts: list[int], metrics: dict[str, Any]) -> None:
        """Record an iteration whose partition files are already on disk
        (the actor-BSP engine writes them from the actors themselves via
        :func:`write_state_parts`); the manifest write is the commit
        point, followed by retention pruning."""
        self.manifest["iterations"][str(it)] = {
            "parts": sorted(int(p) for p in parts),
            "complete": True,
            "metrics": metrics,
        }
        # commit the NEW iteration first — the manifest is the commit
        # point; pruning before this commit could crash with the on-disk
        # manifest still pointing at an already-deleted iteration
        self._commit_manifest()
        if self.retain is not None:
            live = sorted(
                int(k) for k, v in self.manifest["iterations"].items()
                if v.get("complete") and not v.get("pruned")
            )
            for old in live[: -self.retain]:
                self.manifest["iterations"][str(old)]["pruned"] = True
            self._commit_manifest()
            for old in live[: -self.retain]:
                try:
                    self.fs.delete_dir(posixpath.join(self.dir, f"iter={old}"))
                except FileNotFoundError:
                    pass

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
        state = rd.read_parquet(posixpath.join(self.dir, f"iter={it}"),
                                filesystem=self.fs)
        return it, state.materialize()

    def metrics_history(self) -> dict[int, dict]:
        return {
            int(k): v.get("metrics", {})
            for k, v in self.manifest["iterations"].items()
        }
