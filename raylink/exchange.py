"""Generic one-round map/reduce exchange over materialized Arrow blocks.

The pattern behind the round-5 graph-build rewrites (vertex-rank
dictionary, CSR block build, triangle wedge join — `graph.py`,
`kernels/triangles.py`): ONE map round whose ``num_returns=K`` scatter
gives every (map task, partition) slice its own plasma object, then ONE
reduce round where each task fetches only its slice — the real-cluster
shuffle shape (per-slice objects transfer point-to-point between object
stores; nothing proportional to the data touches the driver). Replaces
Ray Data's sort-based ``groupby().map_groups()`` where the group key is
a small integer partition id and the group count is bounded: measured
4-6x faster at identical outputs, and the removed sort machinery was the
dominant CPU-count-independent cost in the scaling campaign
(BENCH/BASELINE.md §7).

Use the Dataset groupby instead when the stage needs streaming
backpressure (unbounded group counts / data much larger than the object
store) — this helper materializes all map outputs before the reduces
finish, exactly like any all-to-all shuffle barrier.

``map_fn(tabs, K, *args)`` takes a tuple of ``pa.Table`` blocks and
returns a list of K per-partition payloads (any serializable value).
``reduce_fn(k, slices, *args)`` takes the partition id and the tuple of
that partition's payloads (one per map task). Both must be importable or
closure-free enough to pickle; they run inside Ray tasks.
"""

from __future__ import annotations

import numpy as np  # noqa: F401  (commonly used by callers' fns)

import ray


def scatter_by_part(tab, part, K: int, columns=None):
    """The common exchange-map scatter: stable-partition ``tab``'s rows
    by the int array ``part`` (values in [0, K)) and return a list of K
    ``pa.Table`` slices (None for empty partitions — reduces skip
    None). ``columns`` optionally projects before the take."""
    import pyarrow as _pa

    part = np.asarray(part)
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(K + 1))
    sub = tab.select(columns) if columns is not None else tab
    return [sub.take(_pa.array(order[bounds[k]: bounds[k + 1]]))
            if bounds[k + 1] > bounds[k] else None for k in range(K)]


def arrow_col_type(ds, col: str):
    """The pyarrow type of ``ds[col]`` — works for Arrow-block datasets
    (parquet reads, from_arrow) AND pandas-block ones (from_pandas),
    whose schema reports numpy dtypes (object -> string)."""
    import numpy as _np
    import pyarrow as _pa

    base = getattr(ds.schema(), "base_schema", None)
    if isinstance(base, _pa.Schema):
        return base.field(col).type
    t = dict(zip(base.names, base.types)).get(col)
    if isinstance(t, _np.dtype):
        return (_pa.string() if t == _np.dtype(object)
                else _pa.from_numpy_dtype(t))
    return _pa.string()


@ray.remote
def _x_map(fn, K: int, args: tuple, *tabs):
    out = list(fn(tabs, K, *args))
    if len(out) != K:
        raise ValueError(f"map_fn returned {len(out)} payloads, want {K}")
    return tuple(out) if K > 1 else out[0]


@ray.remote
def _x_reduce(fn, k: int, args: tuple, *slices):
    return fn(k, slices, *args)


def exchange(refs, K: int, map_fn, reduce_fn, *, map_args: tuple = (),
             reduce_args: tuple = (), max_map_tasks: int = 128):
    """Run the exchange; returns the list of K reduce ObjectRefs
    (unresolved — ``ray.get`` them, or feed ``pa.Table`` results to
    ``ray.data.from_arrow_refs``). ``refs``: ObjectRefs of ``pa.Table``
    blocks (``ds.to_arrow_refs()`` on a materialized Dataset)."""
    chunk = max(1, -(-len(refs) // max_map_tasks))
    groups = [refs[i: i + chunk] for i in range(0, len(refs), chunk)]
    outs = [_x_map.options(num_returns=K).remote(map_fn, K, tuple(map_args),
                                                 *g) for g in groups]
    if K == 1:
        outs = [[o] for o in outs]
    return [_x_reduce.remote(reduce_fn, k, tuple(reduce_args),
                             *[o[k] for o in outs]) for k in range(K)]
