"""Newman modularity of a community labeling — one LP-shaped superstep.

Q = E_in/m - sum_c (d_c / 2m)^2 over communities c, where m = undirected
edge count, E_in = intra-community edges, d_c = total degree inside c.
The whole quantity reduces to three exact integers

    Q = (2m * E2 - D) / (4 m^2),   E2 = same-label DIRECTED slots (= 2 E_in),
                                   D  = sum_c d_c^2

so the engine and the SQL oracle compute bit-identical fixed-point output
(one float division at the very end). Reference parity: the
score-the-labeling shape of the reference's grouped QC metrics
(porcine/pig_extract.py:1007 region scoring).

Dataflow (no driver state beyond 3 scalars): labels arrive as a
per-vertex (vid, label) Dataset (e.g. straight from
:func:`label_propagation`), are densified to per-partition state rows
(one groupby), then ONE reuse of LP's pre-aggregated vote scatter routes
neighbor labels to each partition; the combine counts same-label slots
locally (E2 partials) and emits per-label degree sums, which a final
small ``groupby("label")`` reduces before squaring — the only shuffle
proportional to communities, not vertices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..graph import Graph
from .bsp import maybe_expand_chunks, vertex_table_to_state
from .labelprop import _list_np, _make_scatter
from .triangles import _deg_of

_MOD_SCHEMA = pa.schema([
    pa.field("label", pa.int64()),
    pa.field("dsum", pa.int64()),
    pa.field("e2", pa.int64()),
])


def modularity(graph: Graph, labels: rd.Dataset, *,
               label_col: str = "label") -> pa.Table:
    """One row (modularity_fp, n_communities, m_edges) for the labeling of
    a SYMMETRIC build. ``labels``: per-vertex (vid, <label_col>) covering
    every vertex. modularity_fp = floor(Q * 1e9 + 0.5), Q in [-1/2, 1)."""
    m = graph.m // 2
    if m == 0:
        return pa.table({"modularity_fp": pa.array([0], pa.int64()),
                         "n_communities": pa.array([0], pa.int64()),
                         "m_edges": pa.array([0], pa.int64())})
    P = graph.P
    parts = graph.parts_with_edges()
    deg_refs = {p: _deg_of.remote(graph.blocks[p][0]) for p in parts}
    n_per_part = np.asarray(graph.n_per_part)

    state = vertex_table_to_state(labels, graph, label_col, pa.int64())
    scatter = _make_scatter(graph)

    def combine(group: pa.Table) -> pa.Table:
        import ray as _ray

        kinds = group["kind"].to_numpy(zero_copy_only=False)
        prev_i = int(np.flatnonzero(kinds == 1)[0])
        part = int(group["dst_part"][prev_i].as_py())
        idx_flat, idx_offs = _list_np(group["idx"])
        lab_flat, lab_offs = _list_np(group["lab"])
        cnt_flat, cnt_offs = _list_np(group["cnt"])
        own = lab_flat[lab_offs[prev_i]: lab_offs[prev_i + 1]].astype(np.int64)
        e2 = 0
        for i in range(group.num_rows):
            if kinds[i] != 0:
                continue
            idx = idx_flat[idx_offs[i]: idx_offs[i + 1]].astype(np.int64)
            lab = lab_flat[lab_offs[i]: lab_offs[i + 1]].astype(np.int64)
            cnt = cnt_flat[cnt_offs[i]: cnt_offs[i + 1]].astype(np.int64)
            same = own[idx] == lab
            e2 += int(cnt[same].sum())
        if part in deg_refs:
            deg = np.asarray(_ray.get(deg_refs[part]), dtype=np.int64)
        else:
            deg = np.zeros(int(n_per_part[part]), dtype=np.int64)
        uniq, inv = np.unique(own, return_inverse=True)
        dsum = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(dsum, inv, deg)
        n_u = len(uniq)
        return pa.table({
            "label": pa.array(uniq, pa.int64()),
            "dsum": pa.array(dsum, pa.int64()),
            "e2": pa.array(np.r_[np.int64(e2), np.zeros(n_u - 1, np.int64)]
                           if n_u else np.array([e2], np.int64),
                           pa.int64()),
        }, schema=_MOD_SCHEMA)

    per_label = (
        maybe_expand_chunks(state, graph)
        .map_batches(scatter, batch_format="pyarrow", batch_size=1,
                     zero_copy_batch=True)
        .groupby("dst_part")
        .map_groups(combine, batch_format="pyarrow")
        .materialize()
    )
    e2_total = int(per_label.sum("e2") or 0)

    def reduce_labels(group: pa.Table) -> pa.Table:
        # d_c complete per label here; emit the squared term + count
        lab = group["label"].to_numpy(zero_copy_only=False)
        ds_ = group["dsum"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        dc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(dc, inv, ds_)
        live = dc > 0
        d_sq = int(sum(int(x) * int(x) for x in dc[live]))
        return pa.table({"d_sq": pa.array([d_sq], pa.int64()),
                         "n_comm": pa.array([int(live.sum())], pa.int64())})

    # bound label->owner shuffle rows: group labels by hash bucket
    def bucket(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False)
        b = (lab.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             >> np.uint64(40)).astype(np.int64) % max(P, 1)
        return batch.append_column("bkt", pa.array(b, pa.int64()))

    red = (per_label.map_batches(bucket, batch_format="pyarrow")
           .groupby("bkt").map_groups(reduce_labels,
                                      batch_format="pyarrow"))
    d_sq = 0
    n_comm = 0
    for b in red.iter_batches(batch_format="pyarrow"):
        d_sq += int(sum(x.as_py() for x in b["d_sq"]))
        n_comm += int(sum(x.as_py() for x in b["n_comm"]))
    num = 2 * m * e2_total - d_sq
    q_fp = int(np.floor(float(num) / float(4 * m * m) * 1e9 + 0.5))
    return pa.table({"modularity_fp": pa.array([q_fp], pa.int64()),
                     "n_communities": pa.array([n_comm], pa.int64()),
                     "m_edges": pa.array([m], pa.int64())})
