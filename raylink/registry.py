"""User-extension registries (SURVEY §2.12).

The reference exposes string-keyed registries for schemas, scalers, CV
strategies, models and wavelets (setup_globals.py:18-71,
porcine/pig_extract.py:1216-1244, 4166-4177). raylink mirrors the pattern:
pluggable kernels, extractors and partitioners addressed by name, so a
pipeline spec can be pure data (e.g. ``run_kernel("pagerank", graph)``).
"""

from __future__ import annotations

from collections.abc import Callable

from .kernels import (
    bfs_hops,
    connected_components,
    hits,
    k_core,
    label_propagation,
    neighborhood_function,
    pagerank,
    triangle_count,
)

def _hits_single_graph(graph, **kwargs):
    """Registry adapter keeping the uniform run_kernel(name, graph)
    contract: derive the transpose build from the graph's shared prep
    (one extra build shuffle; call kernels.hits with a
    build_graph_fwd_rev pair directly to share the pack pass)."""
    from .graph import build_graph_from_prepared

    return hits(graph, build_graph_from_prepared(graph.prep, transpose=True),
                **kwargs)


def _scc_single_graph(graph, **kwargs):
    """Registry adapter (uniform run_kernel contract): derive the transpose
    from the graph's shared prep; call kernels.strongly_connected_components
    with a build_graph_fwd_rev pair directly to share the pack pass."""
    from .graph import build_graph_from_prepared
    from .kernels import strongly_connected_components

    return strongly_connected_components(
        graph, build_graph_from_prepared(graph.prep, transpose=True),
        **kwargs)


KERNELS: dict[str, Callable] = {
    "pagerank": pagerank,
    "cc": connected_components,
    "labelprop": label_propagation,
    "triangles": triangle_count,
    "bfs": bfs_hops,
    "kcore": k_core,
    "hits": _hits_single_graph,
    "anf": neighborhood_function,
    "scc": _scc_single_graph,
}

# kernels that require a symmetric (undirected) graph build
SYMMETRIC_KERNELS = frozenset({"cc", "labelprop", "triangles", "bfs", "kcore",
                               "anf"})


def register_kernel(name: str, fn: Callable, *, symmetric: bool = False) -> None:
    KERNELS[name] = fn
    if symmetric:
        global SYMMETRIC_KERNELS
        SYMMETRIC_KERNELS = SYMMETRIC_KERNELS | {name}


def run_kernel(name: str, graph, **kwargs):
    if name not in KERNELS:
        raise KeyError(f"unknown kernel {name!r}; have {sorted(KERNELS)}")
    return KERNELS[name](graph, **kwargs)


def _default_extractor():
    from .extract import ExtractorPool

    return ExtractorPool


EXTRACTORS: dict[str, Callable] = {"html": _default_extractor}


def register_extractor(name: str, factory: Callable) -> None:
    EXTRACTORS[name] = factory
