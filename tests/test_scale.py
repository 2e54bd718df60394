"""Mid-size randomized end-to-end check: a few thousand pages with random
overlay links, full pipeline vs the sequential oracle (no closed forms —
the oracle is the truth, FIXTURES §B.2 'random DAG overlay')."""

import numpy as np

import ray.data as rd

from raylink import oracle as O
from raylink import tables
from raylink.extract import docs_to_edges, pages_to_docs
from raylink.graph import build_graph_pair, prepare_edges
from raylink.kernels import connected_components, pagerank, triangle_count
from raylink.pipelines.flagship import join_keys

SPEC = tables.PageSpec(ring=200, star_leaves=100, cliques=6, clique_size=5,
                       dangling=50, overlay_avg_links=3.0, extra_pages=2000)


def test_midsize_overlay_end_to_end():
    pages = tables.pages_dataset(SPEC, parallelism=16)
    docs = pages_to_docs(pages, batch_size=256, concurrency=2).materialize()
    prep = prepare_edges(docs_to_edges(docs), P=16)
    g, sg = build_graph_pair(prep)

    og = O.build_oracle_graph(
        [(s, d) for s, d in tables.true_edges(SPEC) if s != d], 16
    )
    assert (g.n, g.m) == (og.n, len(og.edges))

    # PageRank within 1e-6 of oracle
    truth, _ = O.pagerank(og, tol=1e-10)
    got = {}
    for b in join_keys(pagerank(g, tol=1e-10), g, "score").iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            got[b["key"][i].as_py()] = b["score"][i].as_py()
    worst = max(abs(got[og.keys[p]] - truth[p]) for p in range(og.n))
    assert worst < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # components exact (pointer jumping) + triangles exact
    comp_truth = O.connected_components(og)
    comps = {}
    for b in join_keys(connected_components(sg, method="jump"), sg,
                       "comp").iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            comps[b["key"][i].as_py()] = b["comp"][i].as_py()
    assert all(comps[og.keys[p]] == comp_truth[p] for p in range(og.n))
    assert triangle_count(sg) == O.triangle_count(og)
