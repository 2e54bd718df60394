"""Partitioned Parquet sinks with skip-finished resume.

Reference analog: ``support.save_results`` NPZ multi-table sink with
output-exists resume (``support.py:242-331``, ``peak_detect_v4.py:1850-1853``)
— upgraded to one Parquet dataset per logical table, written shard-at-a-time
with a completion manifest so a rerun skips finished tables/partitions and
never leaves a half-written directory visible (tmp dir + atomic rename).
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data as rd


def _done_marker(path: str) -> str:
    return os.path.join(path, "_SUCCESS.json")


def write_table(ds: rd.Dataset, path: str, *, meta: dict | None = None,
                partition_cols: list[str] | None = None,
                min_rows_per_file: int = 200_000) -> bool:
    """Write ``ds`` to ``path`` as a parquet dataset; returns False if the
    table was already complete (resume skip). Atomic: writes to ``path.tmp``
    then renames, then drops a _SUCCESS manifest. ``partition_cols`` gives
    hive-style per-key directories (the reference's per-group NPZ files,
    ``porcine/pig_extract.py:1320-1345``)."""
    if os.path.exists(_done_marker(path)):
        return False
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    try:
        ds.write_parquet(tmp, min_rows_per_file=min_rows_per_file, **kwargs)
    except TypeError:  # older Ray releases
        ds.write_parquet(tmp, **kwargs)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    with open(_done_marker(path), "w") as f:
        json.dump({"complete": True, **(meta or {})}, f)
    return True


def save_flagship(result, out_dir: str) -> dict[str, bool]:
    """Write every flagship output table (docs/ranks/components/labels +
    metrics.json). Rerun-safe: complete tables are skipped."""
    from .pipelines.flagship import join_keys

    written = {}
    written["docs"] = write_table(
        result.docs.drop_columns(["links"]), os.path.join(out_dir, "docs")
    )
    written["ranks"] = write_table(
        join_keys(result.ranks, result.graph, "score"),
        os.path.join(out_dir, "ranks"),
    )
    written["components"] = write_table(
        join_keys(result.comps, result.sym_graph, "comp"),
        os.path.join(out_dir, "components"),
    )
    if result.labels is not None:
        written["labels"] = write_table(
            join_keys(result.labels, result.sym_graph, "label"),
            os.path.join(out_dir, "labels"),
        )
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump({"triangles": result.triangles, **result.metrics}, f, indent=1)
    return written
