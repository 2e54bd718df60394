"""Simulated 2-node cluster test for the grouped exchange mode (VERDICT r4
What's-missing #3): ``RAYLINK_BSP_EXCHANGE=grouped`` exists precisely for
multi-node deployments (one plasma object per src->dst actor pair, each
consumer fetches only its bytes), but until round 5 it had only ever run
where plasma is one shared mmap. ``ray.cluster_utils.Cluster`` gives two
REAL object stores on this box: the BSP pool is SPREAD-scheduled across
both nodes, so grouped-exchange scatter objects genuinely cross stores.

Runs in a SUBPROCESS: the simulated cluster needs its own Ray instance,
separate from the session-scoped local fixture in conftest.py.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import os

os.environ["RAYLINK_BSP_EXCHANGE"] = "grouped"
# force the distributed build (not the driver-local small path) so the
# round-5 raw-task exchanges (ranks dictionary, CSR blocks, triangle
# wedge join) run their num_returns scatter across the two REAL object
# stores — the transfer shape they exist for
os.environ["RAYLINK_SMALL_BUILD_MAX_EDGES"] = "0"

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.cluster_utils import Cluster

MB = 1024 * 1024
cluster = Cluster(
    initialize_head=True,
    head_node_args={"num_cpus": 2, "object_store_memory": 256 * MB},
)
cluster.add_node(num_cpus=2, object_store_memory=256 * MB)
ray.init(address=cluster.address, include_dashboard=False,
         logging_level="ERROR")
alive = [n for n in ray.nodes() if n["Alive"]]
assert len(alive) == 2, f"expected 2 alive nodes, got {len(alive)}"

from raylink.graph import build_graph, build_graph_fwd_rev, prepare_edges
from raylink.kernels import pagerank, strongly_connected_components

rng = np.random.default_rng(7)
src = rng.integers(0, 500, 3000)
dst = rng.integers(0, 500, 3000)
edges = rd.from_arrow(pa.table({
    "src": pa.array([f"u{i}" for i in src], pa.string()),
    "dst": pa.array([f"u{i}" for i in dst], pa.string()),
}))
g = build_graph(edges, P=16)
gf, gr = build_graph_fwd_rev(prepare_edges(edges, P=16))

def run(mode):
    os.environ["RAYLINK_BSP_EXCHANGE"] = mode
    pr = (pagerank(g, tol=0.0, max_iter=8, fused=False)
          .to_pandas().sort_values("vid")["score"].to_numpy())
    scc = (strongly_connected_components(gf, gr, fused=False)
           .to_pandas().sort_values("vid")["scc"].to_numpy())
    return pr, scc

pr_g, scc_g = run("grouped")

# the pool must actually span both nodes, or "cross-store transfer" is
# vacuous (actors are SPREAD-scheduled; 2 nodes => both used). GCS state
# API, not ray.util.state: the dashboard is disabled in this sandbox.
infos = ray._private.state.actors()
nodes_used = {a["Address"]["NodeID"] for a in infos.values()
              if "_BSPActor" in a.get("ActorClassName", "")
              and a.get("State") in ("ALIVE", 2)}
assert len(nodes_used) == 2, (
    f"BSP actors landed on {len(nodes_used)} node(s), expected 2")

pr_s, scc_s = run("single")
assert np.array_equal(pr_g, pr_s), "grouped vs single PageRank differ"
assert np.array_equal(scc_g, scc_s), "grouped vs single SCC differ"

# round-5 exchange parity ON the 2-node cluster: the task-exchange
# builds (ranks/CSR), the wedge-join exchange, and the MSF pick/dedup
# exchanges must match their Dataset fallbacks bit-for-bit when every
# scatter object crosses a real store boundary
from raylink.kernels import minimum_spanning_forest, triangle_count

sg = build_graph(edges, P=16, symmetric=True, weighted=True,
                 already_deduped=True)
tri_x = triangle_count(sg)
os.environ["RAYLINK_TRI_EXCHANGE"] = "dataset"
tri_d = triangle_count(sg)
os.environ.pop("RAYLINK_TRI_EXCHANGE")
assert tri_x == tri_d, (tri_x, tri_d)

s_x, e_x = minimum_spanning_forest(sg, broadcast_max_map=0)
ex = e_x.to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True)
for k, v in (("RAYLINK_MSF_PICK_EXCHANGE", "dataset"),
             ("RAYLINK_MSF_PLASMA_MAX_MAP", "0")):
    os.environ[k] = v
s_d, e_d = minimum_spanning_forest(sg, broadcast_max_map=0)
for k in ("RAYLINK_MSF_PICK_EXCHANGE", "RAYLINK_MSF_PLASMA_MAX_MAP"):
    os.environ.pop(k)
assert s_x.to_pydict() == s_d.to_pydict()
assert ex.equals(e_d.to_pandas().sort_values(["lo", "hi"])
                 .reset_index(drop=True))

# Dataset-path parity for the builds themselves (ranks + CSR exchanges
# vs the groupby pipelines, same 2-node cluster)
for k in ("RAYLINK_RANKS_EXCHANGE", "RAYLINK_CSR_EXCHANGE"):
    os.environ[k] = "dataset"
g2 = build_graph(edges, P=16)
pr_ds = (pagerank(g2, tol=0.0, max_iter=8, fused=False)
         .to_pandas().sort_values("vid")["score"].to_numpy())
for k in ("RAYLINK_RANKS_EXCHANGE", "RAYLINK_CSR_EXCHANGE"):
    os.environ.pop(k)
assert np.array_equal(pr_s, pr_ds), "exchange vs dataset build differ"

# the 4-round fused exchange (10^12 path: request/respond dictionary
# resolution, no broadcast) across the two stores
from raylink.graph import build_graph_from_prepared

g3 = build_graph_from_prepared(
    prepare_edges(edges, P=16, encode="partitioned-fused"))
pr_fx = (pagerank(g3, tol=0.0, max_iter=8, fused=False)
         .to_pandas().sort_values("vid")["score"].to_numpy())
assert np.array_equal(pr_s, pr_fx), "fused exchange differs on 2 nodes"

# session-3 exchanges across the two stores: ordered successor
# self-join + pair-distinct (the graph batteries' shared prefix) and
# the two-round chunk-dedup — each vs its Dataset twin
from raylink.ops import transition_edges
from raylink.dedup import chunk_dup_stats
import pandas as pd

ev = rd.from_arrow(pa.table({
    # consecutive ids with a few gaps: pairs exist, boundaries exercised
    "event_id": pa.array(np.setdiff1d(np.arange(2100, dtype=np.int64),
                                      np.arange(0, 2100, 97))),
    "user_id": pa.array([f"u{i}" for i in rng.integers(0, 40, 2078)],
                        pa.string()),
})).repartition(6)
def te_rows():
    return sorted(map(tuple, transition_edges(ev, chunk=64).to_pandas()
                      [["src", "dst"]].values.tolist()))
te_x = te_rows()
os.environ["RAYLINK_TRANSITION_EXCHANGE"] = "dataset"
os.environ["RAYLINK_EDGEDEDUP_EXCHANGE"] = "dataset"
te_d = te_rows()
os.environ.pop("RAYLINK_TRANSITION_EXCHANGE")
os.environ.pop("RAYLINK_EDGEDEDUP_EXCHANGE")
assert te_x == te_d, "transition/dedup exchange differs on 2 nodes"

docs = rd.from_arrow(pa.table({
    "doc_id": pa.array(np.arange(120, dtype=np.int64)),
    "text": pa.array([" ".join(f"w{j % 9}" for j in range(i, i + 20))
                      for i in range(120)], pa.string()),
})).repartition(5)
def cdd_rows():
    return (chunk_dup_stats(docs, width=6, stride=3).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
cdd_x = cdd_rows()
os.environ["RAYLINK_CHUNKDD_EXCHANGE"] = "dataset"
cdd_d = cdd_rows()
os.environ.pop("RAYLINK_CHUNKDD_EXCHANGE")
pd.testing.assert_frame_equal(cdd_x, cdd_d)

print("MULTINODE_OK", len(pr_g), len(set(scc_g.tolist())), tri_x)
ray.shutdown()
cluster.shutdown()
"""


def test_grouped_exchange_on_two_node_cluster():
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # must not attach to the session cluster
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, capture_output=True,
        text=True, timeout=600, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    assert res.returncode == 0, (
        f"stdout:\n{res.stdout[-3000:]}\nstderr:\n{res.stderr[-3000:]}")
    assert "MULTINODE_OK" in res.stdout
