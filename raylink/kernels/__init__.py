"""Iterative graph kernels as Ray-Data superstep rounds.

Each kernel follows the same bulk-synchronous shape (SURVEY §7.4, §2.10
re-designed order-independent):

    state Dataset (one row per partition: part, vec)
      -> map_batches(scatter)    per-partition CSR scan, emits per
                                 (src_part -> dst_part) *pre-aggregated*
                                 sparse partials  [the combiner / salt step]
      -> groupby("dst_part")     the only shuffle of the superstep
      -> map_groups(combine)     deterministic ordered reduction -> new state
      -> materialize()           the carried state == the checkpoint unit

Driver holds only scalars (dangling mass, L1 delta, changed counts) —
mirroring the reference's history-fed convergence gates
(peak_detect_v4.py:1733-1746) made order-independent.
"""

from .pagerank import pagerank
from .cc import connected_components
from .labelprop import label_propagation
from .triangles import (approx_triangle_count, degree_assortativity,
                        edge_support, graph_summary, local_clustering,
                        reciprocity, triangle_count)
from .densest import densest_subgraph
from .msf import minimum_spanning_forest
from .traversal import (bfs_hops, bfs_hops_multi, coreness, dag_levels,
                        k_core, sssp, sssp_delta, widest_path)
from .linkpred import adamic_adar_candidates
from .truss import k_truss
from .modularity import modularity
from .hits import hits
from .mis import maximal_independent_set
from .matching import maximal_matching
from .betweenness import betweenness
from .coloring import graph_coloring
from .anf import (effective_diameter, exact_neighborhood_function,
                  neighborhood_function)
from .katz import katz
from .salsa import salsa
from .scc import bowtie, strongly_connected_components

__all__ = ["pagerank", "connected_components", "label_propagation",
           "triangle_count", "approx_triangle_count", "graph_summary",
           "degree_assortativity", "adamic_adar_candidates", "k_truss",
           "modularity",
           "local_clustering", "edge_support", "bfs_hops", "bfs_hops_multi",
           "k_core", "hits", "sssp", "sssp_delta", "widest_path", "coreness",
           "densest_subgraph", "minimum_spanning_forest", "dag_levels",
           "reciprocity",
           "maximal_independent_set", "maximal_matching",
           "betweenness", "graph_coloring",
           "neighborhood_function", "effective_diameter",
           "exact_neighborhood_function",
           "strongly_connected_components", "bowtie", "katz", "salsa"]
