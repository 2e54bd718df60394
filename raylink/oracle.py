"""Sequential single-process oracles for every engine kernel.

These are the test ground truth (SURVEY §5): plain NumPy/Python, no Ray.
They replicate the engine's *semantics* — including the deterministic vid
scheme (graph.py: part = crc32(key) % P, vid = local_rank * P + part), the
dedup rules (distinct (src,dst), self-loops dropped), the LP vote rule
(neighbors + own label, tiebreak = min label) and the CC canonical form
(comp = min vid in component) — so engine outputs can be compared directly:
PageRank allclose 1e-6, components / labels / triangles exact.

The extraction oracle calls the very same pure kernel
(:func:`raylink.extract.extract_one`) single-process, which is what the
BASELINE.json per-row invariant ("byte-identical extracted text per url")
is checked against.
"""

from __future__ import annotations


from dataclasses import dataclass

import numpy as np

from .extract import extract_one
from .tables import PageSpec, pages_table


def part_of_key(key, P: int) -> int:
    """Single-key twin of graph.part_of_keys (same vectorized hash)."""
    import pyarrow as pa

    from .graph import part_of_keys

    if isinstance(key, (int, np.integer)):
        arr = pa.array([int(key)], pa.int64())
    else:
        arr = pa.array([str(key)], pa.string())
    return int(part_of_keys(arr, P)[0])


@dataclass
class OracleGraph:
    P: int
    n: int
    keys: list  # index = position in sorted-unique order (not vid!)
    vid_of: dict  # key -> vid
    key_of: dict  # vid -> key
    edges: np.ndarray  # int64 [m, 2] deduped, vid-encoded
    out_deg: np.ndarray  # indexed by dense position (see pos_of)
    pos_of: dict  # vid -> dense position 0..n-1


def _hash_of_keys(keys: list) -> "np.ndarray":
    import pyarrow as pa

    from .graph import hash64

    if keys and isinstance(keys[0], (int, np.integer)):
        arr = pa.array([int(k) for k in keys], pa.int64())
    else:
        arr = pa.array([str(k) for k in keys], pa.string())
    return hash64(arr)


def build_oracle_graph(edge_pairs, P: int) -> OracleGraph:
    """edge_pairs: iterable of (src_key, dst_key). Replicates graph.py ids:
    part = hash64(key) % P, rank within part by (hash64(key), key)."""
    pairs = {(s, d) for s, d in edge_pairs if s != d}
    keys = sorted({k for e in pairs for k in e})
    h = _hash_of_keys(keys)
    by_part: dict[int, list] = {}
    for i, k in enumerate(keys):
        by_part.setdefault(int(h[i] % np.uint64(P)), []).append((int(h[i]), k))
    vid_of = {}
    for p, hk in by_part.items():
        for rank, (_, k) in enumerate(sorted(hk)):
            vid_of[k] = rank * P + p
    key_of = {v: k for k, v in vid_of.items()}
    edges = np.array(
        sorted((vid_of[s], vid_of[d]) for s, d in pairs), dtype=np.int64
    ).reshape(-1, 2)
    vids = np.array(sorted(vid_of.values()), dtype=np.int64)
    pos_of = {int(v): i for i, v in enumerate(vids)}
    out_deg = np.zeros(len(keys), dtype=np.int64)
    for s, _ in edges:
        out_deg[pos_of[int(s)]] += 1
    return OracleGraph(
        P=P, n=len(keys), keys=[key_of[int(v)] for v in vids], vid_of=vid_of,
        key_of=key_of, edges=edges, out_deg=out_deg, pos_of=pos_of,
    )


def _pos_edges(g: OracleGraph) -> np.ndarray:
    """Edges re-indexed to dense positions 0..n-1."""
    lut = np.zeros(int(max(g.pos_of) + 1) if g.pos_of else 1, dtype=np.int64)
    for v, i in g.pos_of.items():
        lut[v] = i
    return lut[g.edges]


def pagerank(g: OracleGraph, *, damping: float = 0.85, tol: float = 1e-6,
             max_iter: int = 200) -> tuple[np.ndarray, int]:
    """Power iteration with dangling-mass redistribution.

    Returns (scores indexed by dense position, iterations). Invariant:
    scores sum to 1 every iteration.
    """
    n = g.n
    e = _pos_edges(g)
    s = np.full(n, 1.0 / n)
    w_deg = np.maximum(g.out_deg, 1)
    dangling = g.out_deg == 0
    it = 0
    for it in range(1, max_iter + 1):
        contrib = s / w_deg
        acc = np.zeros(n)
        np.add.at(acc, e[:, 1], contrib[e[:, 0]])
        dm = s[dangling].sum()
        new = (1.0 - damping) / n + damping * (acc + dm / n)
        delta = np.abs(new - s).sum()
        s = new
        if delta < tol:
            break
    return s, it


def hits(g: OracleGraph, *, max_iter: int = 20) -> tuple[np.ndarray, np.ndarray]:
    """Alternating L1-normalized HITS power iterations (the kernel's exact
    formula). Returns (hub, auth) per dense position, each summing to 1."""
    n = g.n
    e = _pos_edges(g)
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(max_iter):
        acc = np.zeros(n)
        np.add.at(acc, e[:, 1], hub[e[:, 0]])
        auth = acc / (acc.sum() or 1.0)
        acc = np.zeros(n)
        np.add.at(acc, e[:, 0], auth[e[:, 1]])
        hub = acc / (acc.sum() or 1.0)
    return hub, auth


def connected_components(g: OracleGraph, *, max_iter: int = 10_000) -> np.ndarray:
    """Min-label propagation over the undirected graph; exact fixpoint.
    Returns comp (min vid of component) per dense position."""
    e = _pos_edges(g)
    und = np.concatenate([e, e[:, ::-1]], axis=0)
    vids = np.array(sorted(g.pos_of), dtype=np.int64)
    comp = vids.copy()
    for _ in range(max_iter):
        prev = comp.copy()
        nbr_min = np.full(g.n, np.iinfo(np.int64).max)
        np.minimum.at(nbr_min, und[:, 1], comp[und[:, 0]])
        comp = np.minimum(comp, nbr_min)
        if np.array_equal(comp, prev):
            break
    return comp


def label_propagation(g: OracleGraph, *, max_iter: int = 20) -> np.ndarray:
    """Synchronous LP. Votes = labels of undirected neighbors plus the
    vertex's own current label (one vote); winner = max count, tiebreak min
    label. Deterministic; capped at max_iter (LP can oscillate)."""
    e = _pos_edges(g)
    und = np.unique(np.concatenate([e, e[:, ::-1]], axis=0), axis=0)
    vids = np.array(sorted(g.pos_of), dtype=np.int64)
    lab = vids.copy()
    adj: list[list[int]] = [[] for _ in range(g.n)]
    for u, v in und:
        adj[v].append(u)
    for _ in range(max_iter):
        prev = lab.copy()
        new = lab.copy()
        for v in range(g.n):
            votes: dict[int, int] = {int(prev[v]): 1}
            for u in adj[v]:
                l = int(prev[u])
                votes[l] = votes.get(l, 0) + 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
        if np.array_equal(lab, prev):
            break
    return lab


def label_propagation_redblack(g: OracleGraph, *,
                               max_iter: int = 20) -> np.ndarray:
    """Red/black Gauss-Seidel LP (the kernel's method="redblack" twin):
    per round, even partitions (part = vid % P, parity 0) update from the
    current labels, then odd partitions update SEEING the fresh even
    labels. Same vote rule/tiebreak as sync."""
    e = _pos_edges(g)
    und = np.unique(np.concatenate([e, e[:, ::-1]], axis=0), axis=0)
    vids = np.array(sorted(g.pos_of), dtype=np.int64)
    lab = vids.copy()
    parity = (vids % g.P) % 2
    adj: list[list[int]] = [[] for _ in range(g.n)]
    for u, v in und:
        adj[v].append(u)
    for _ in range(max_iter):
        round_start = lab.copy()
        for phase in (0, 1):
            prev = lab.copy()
            new = lab.copy()
            for v in range(g.n):
                if parity[v] != phase:
                    continue
                votes: dict[int, int] = {int(prev[v]): 1}
                for u in adj[v]:
                    l = int(prev[u])
                    votes[l] = votes.get(l, 0) + 1
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            lab = new
        if np.array_equal(lab, round_start):
            break
    return lab


def triangle_count(g: OracleGraph) -> int:
    """Exact global triangle count over the undirected simple graph."""
    e = _pos_edges(g)
    und = np.unique(np.sort(e, axis=1), axis=0)  # canonical u < v by position
    nbrs: dict[int, set[int]] = {}
    for u, v in und:
        nbrs.setdefault(int(u), set()).add(int(v))
        nbrs.setdefault(int(v), set()).add(int(u))
    deg = {v: len(s) for v, s in nbrs.items()}
    rank = lambda v: (deg[v], v)
    fwd: dict[int, set[int]] = {v: set() for v in nbrs}
    for u, v in und:
        u, v = int(u), int(v)
        if rank(u) < rank(v):
            fwd[u].add(v)
        else:
            fwd[v].add(u)
    total = 0
    for u, outs in fwd.items():
        for v in outs:
            total += len(outs & fwd[v])
    return total


def extract_pages(spec: PageSpec):
    """Sequential extraction over the synthetic corpus: url -> (text, links,
    parse_ok). The byte-identical reference for the Ray pipeline."""
    tab = pages_table(spec)
    out = {}
    for i in range(tab.num_rows):
        url = tab["url"][i].as_py()
        text, links, ok, _ = extract_one(tab["html"][i].as_py(), url)
        out[url] = (text, links, ok)
    return out
