"""Registry surface + scaler/circular-variance op sanity."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def test_kernel_registry_runs():
    from raylink.graph import build_graph
    from raylink.registry import KERNELS, SYMMETRIC_KERNELS, run_kernel

    assert set(KERNELS) >= {"pagerank", "cc", "labelprop", "triangles"}
    pairs = [(f"v{i}", f"v{(i + 1) % 6}") for i in range(6)]
    src, dst = zip(*pairs)
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    g = build_graph(edges, P=4)
    sg = build_graph(edges, P=4, symmetric=True)
    ranks = run_kernel("pagerank", g).to_pandas()
    assert abs(ranks["score"].sum() - 1.0) < 1e-9
    assert run_kernel("triangles", sg) == 0
    with pytest.raises(KeyError):
        run_kernel("nope", g)


def test_standard_scale_and_circular_variance():
    from raylink.ops import circular_variance, standard_scale

    ds = rd.from_arrow(pa.table({"id": list(range(100)),
                                 "x": [float(i) for i in range(100)]}))
    out = standard_scale(ds, "x", "z", ["id"]).to_pandas()
    z = out.sort_values("id")["z"].to_numpy() / 1e6
    assert abs(z.mean()) < 1e-5 and abs(z.std(ddof=1) - 1.0) < 1e-3

    # all angles equal -> circular variance 0; uniform angles -> ~1
    n = 64
    tab = pa.table({
        "g": ["same"] * n + ["uniform"] * n,
        "a": [0.7] * n + [2 * np.pi * i / n for i in range(n)],
    })
    cv = circular_variance(rd.from_arrow(tab), "g", "a", "cv").to_pandas()
    cv = cv.set_index("g")["cv"]
    assert cv["same"] == 0
    assert cv["uniform"] > 990_000  # ~1.0 in fixed-point
