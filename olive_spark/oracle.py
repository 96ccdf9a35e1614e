"""Serial numpy oracles with exact reference semantics.

The reference validates GPU output by diffing against independent serial
CPU programs (testPageRank.cu:26 "The serial version is used to validate
the correctness of the GPU version"; testBFS.cu:39-87). These are the
same oracles as ~30-line numpy, used by pytest to validate the Spark
engine. Semantics preserved:

- PageRank: damping 0.85, init rank 1/N, err = sum(|delta|) < 1e-7,
  NO dangling-mass redistribution (a sink contributes nothing —
  testPageRank.cu:79-85 iterates only existing edges), duplicate edges
  counted multiply, re-add (1-d)/N each round (PageRank.cu:70-74).
- BFS: unreached level = 2147483647 (BFS.cu:101 int infinity).
- SSSP: Bellman-Ford, unit weights by default (SSSP.cu:131).
- CC: component = min vertex id reachable over the undirected closure.
- Label propagation: synchronous; new label = most frequent neighbor
  label over the undirected closure, ties broken by smallest label;
  fixed iteration count (deterministic).
- Triangles: undirected distinct-edge triangles (i<j<k); per-vertex and
  global counts.
"""

from __future__ import annotations

import numpy as np

INF32 = 2147483647


def _edge_arrays(edges: list[tuple], directed: bool = True):
    if not edges:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    src = np.asarray([e[0] for e in edges], dtype=np.int64)
    dst = np.asarray([e[1] for e in edges], dtype=np.int64)
    if not directed:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    return src, dst


def pagerank(
    n: int,
    edges: list[tuple],
    damping: float = 0.85,
    epsilon: float = 1e-7,
    max_rounds: int = 100,
) -> np.ndarray:
    """Serial PageRank (testPageRank.cu:75-113 semantics)."""
    src, dst = _edge_arrays(edges)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(max_rounds):
        contrib = np.zeros(n, dtype=np.float64)
        if len(src):
            with np.errstate(divide="ignore", invalid="ignore"):
                per_edge = rank[src] / outdeg[src]
            np.add.at(contrib, dst, per_edge)
        new_rank = damping * contrib + (1.0 - damping) / n
        err = np.abs(new_rank - rank).sum()
        rank = new_rank
        if err < epsilon:
            break
    return rank


def pagerank_fixed(
    n: int, edges: list[tuple], iterations: int, damping: float = 0.85
) -> np.ndarray:
    """Exactly `iterations` rounds, no convergence test (oracle parity runs)."""
    src, dst = _edge_arrays(edges)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.float64)
        if len(src):
            with np.errstate(divide="ignore", invalid="ignore"):
                per_edge = rank[src] / outdeg[src]
            np.add.at(contrib, dst, per_edge)
        rank = damping * contrib + (1.0 - damping) / n
    return rank


def bfs(n: int, edges: list[tuple], source: int) -> np.ndarray:
    """Serial queue BFS (testBFS.cu:39-87); unreached = INF32."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for e in edges:
        adj[e[0]].append(e[1])
    level = np.full(n, INF32, dtype=np.int64)
    level[source] = 0
    q = [source]
    while q:
        nq = []
        for u in q:
            for v in adj[u]:
                if level[v] == INF32:
                    level[v] = level[u] + 1
                    nq.append(v)
        q = nq
    return level


def sssp(n: int, edges: list[tuple], source: int, unit_weights: bool = True) -> np.ndarray:
    """Bellman-Ford with frontier pruning (SSSP.cu semantics); unit weights."""
    dist = np.full(n, INF32, dtype=np.int64)
    dist[source] = 0
    es = [(e[0], e[1], 1 if unit_weights or len(e) < 3 else int(e[2])) for e in edges]
    for _ in range(n):
        changed = False
        for u, v, w in es:
            if dist[u] != INF32 and dist[u] + w < dist[v]:
                dist[v] = dist[u] + w
                changed = True
        if not changed:
            break
    return dist


def connected_components(n: int, edges: list[tuple]) -> np.ndarray:
    """component[v] = min id reachable over the undirected closure."""
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        a, b = find(e[0]), find(e[1])
        if a != b:
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
    return np.asarray([find(v) for v in range(n)], dtype=np.int64)


def cc_min_label_fixed(n: int, edges: list[tuple], iterations: int) -> np.ndarray:
    """Exactly `iterations` rounds of synchronous min-label propagation
    over the undirected closure (the GAS formulation; converges to
    connected_components once iterations >= diameter)."""
    src, dst = _edge_arrays(edges, directed=False)
    label = np.arange(n, dtype=np.int64)
    for _ in range(iterations):
        new = label.copy()
        if len(src):
            np.minimum.at(new, dst, label[src])
        label = new
    return label


def label_propagation(n: int, edges: list[tuple], iterations: int) -> np.ndarray:
    """Synchronous LP over undirected closure, duplicates counted:
    new label = argmax over neighbor-label frequency, ties -> smallest
    label; vertices with no neighbors keep their label. Deterministic."""
    src, dst = _edge_arrays(edges, directed=False)
    label = np.arange(n, dtype=np.int64)
    for _ in range(iterations):
        new = label.copy()
        # count (dst, neighbor_label) frequencies
        if len(src):
            pairs: dict[tuple[int, int], int] = {}
            for u, v in zip(src, dst):
                key = (int(v), int(label[u]))
                pairs[key] = pairs.get(key, 0) + 1
            best: dict[int, tuple[int, int]] = {}
            for (v, lab), cnt in pairs.items():
                cur = best.get(v)
                # higher count wins; tie -> smaller label
                if cur is None or (cnt, -lab) > (cur[0], -cur[1]):
                    best[v] = (cnt, lab)
            for v, (_, lab) in best.items():
                new[v] = lab
        label = new
    return label


def triangles(n: int, edges: list[tuple]) -> tuple[np.ndarray, int]:
    """Exact triangle counts on the simple undirected graph underlying
    `edges` (self-loops and duplicates dropped). Returns (per_vertex, total)."""
    und = set()
    for e in edges:
        a, b = int(e[0]), int(e[1])
        if a == b:
            continue
        und.add((min(a, b), max(a, b)))
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for a, b in und:  # a < b; count each triangle once via c > b
        common = adj[a] & adj[b]
        for c in common:
            if c > b:
                per[a] += 1
                per[b] += 1
                per[c] += 1
                total += 1
    return per, total


def weighted_pagerank_fixed(
    n: int, edges: list[tuple], iterations: int, damping: float = 0.85
) -> np.ndarray:
    """Weighted PageRank, fixed rounds: gather = rank * w / wdeg(src)."""
    src = np.asarray([e[0] for e in edges], dtype=np.int64)
    dst = np.asarray([e[1] for e in edges], dtype=np.int64)
    w = np.asarray([float(e[2]) if len(e) > 2 else 1.0 for e in edges])
    wdeg = np.zeros(n)
    if len(src):
        np.add.at(wdeg, src, w)
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        if len(src):
            with np.errstate(divide="ignore", invalid="ignore"):
                np.add.at(contrib, dst, rank[src] * (w / wdeg[src]))
        rank = damping * contrib + (1.0 - damping) / n
    return rank


def sssp_weighted(n: int, edges: list[tuple], source: int) -> np.ndarray:
    """Bellman-Ford over double weights; unreached = inf."""
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    es = [(e[0], e[1], float(e[2]) if len(e) > 2 else 1.0) for e in edges]
    for _ in range(n):
        changed = False
        for u, v, w in es:
            if dist[u] + w < dist[v]:
                dist[v] = dist[u] + w
                changed = True
        if not changed:
            break
    return dist


def hits_fixed(n: int, edges: list[tuple], iterations: int):
    """Serial HITS: k synchronous rounds, auth from hubs then hubs from
    NEW auths, L2-normalized after each half-round (Kleinberg 1999)."""
    src, dst = _edge_arrays(edges)
    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(iterations):
        auth = np.zeros(n, dtype=np.float64)
        if len(src):
            np.add.at(auth, dst, hub[src])
        nrm = np.sqrt((auth * auth).sum())
        auth = auth / nrm if nrm > 0 else np.zeros(n)
        hub = np.zeros(n, dtype=np.float64)
        if len(src):
            np.add.at(hub, src, auth[dst])
        nrm = np.sqrt((hub * hub).sum())
        hub = hub / nrm if nrm > 0 else np.zeros(n)
    return hub, auth


def personalized_pagerank_fixed(
    n: int,
    edges: list[tuple],
    sources: list[int],
    iterations: int,
    damping: float = 0.85,
) -> np.ndarray:
    """Serial seeded PageRank: teleport mass restricted to `sources`."""
    src, dst = _edge_arrays(edges)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    pref = np.zeros(n, dtype=np.float64)
    pref[np.asarray(sorted(set(sources)), dtype=np.int64)] = 1.0 / len(set(sources))
    rank = pref.copy()
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.float64)
        if len(src):
            with np.errstate(divide="ignore", invalid="ignore"):
                per_edge = rank[src] / outdeg[src]
            np.add.at(contrib, dst, per_edge)
        rank = damping * contrib + (1.0 - damping) * pref
    return rank


def kcore_fixed(n: int, edges: list[tuple], k: int, max_rounds: int):
    """Serial synchronous k-core peeling, mirroring algorithms/kcore.py:
    round = degrees on the current undirected multigraph -> keep deg>=k
    -> drop edges with a peeled endpoint; stop at fixpoint (edge count
    unchanged) or after max_rounds. Returns (in_core bool[n], rounds,
    converged)."""
    if k == 0:
        return np.ones(n, dtype=bool), 0, True
    src, dst = _edge_arrays(edges, directed=False)
    keep = np.ones(n, dtype=bool)
    prev_edges = len(src)
    rounds = 0
    converged = False
    while rounds < max_rounds:
        deg = np.bincount(src, minlength=n)
        keep = deg >= k
        mask = keep[src] & keep[dst]
        src, dst = src[mask], dst[mask]
        rounds += 1
        if len(src) == prev_edges:
            converged = True
            break
        prev_edges = len(src)
    return keep, rounds, converged
