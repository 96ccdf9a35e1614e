"""Deterministic regenerations of the reference topology corpus.

The reference ships 9 tiny edge-list fixtures in /root/reference/data/
(consumed by CsrGraph::fromEdgeListFile, csrGraph.h:106-171) chosen to
hit edge cases; FIXTURES.md documents each. We regenerate them
programmatically — constructions are deterministic (the two random-ish
ones use a seeded xorshift-free numpy Generator, seed 42). Weights in
the reference files are parsed but IGNORED by its loader
(csrGraph.h:139), so fixtures carry no weights here.

Each generator returns (n_vertices, edges) where edges is a list of
(src, dst) directed pairs — both directions listed explicitly for
undirected constructions, matching the reference data files.
"""

from __future__ import annotations

import numpy as np

Fixture = tuple[int, list[tuple[int, int]]]


def grid_graph(rows: int = 3, cols: int = 5) -> Fixture:
    """3x5 grid, both directions (data/gridGraph_15: 15 vertices, 44 edges)."""
    n = rows * cols
    edges = []
    for r in range(rows):
        for c in range(cols):
            v = r * cols + c
            if c + 1 < cols:
                edges += [(v, v + 1), (v + 1, v)]
            if r + 1 < rows:
                edges += [(v, v + cols), (v + cols, v)]
    return n, edges


def chain_graph(n: int = 1000) -> Fixture:
    """Path 0..n-1, both directions (data/chainGraph_1K)."""
    edges = []
    for i in range(n - 1):
        edges += [(i, i + 1), (i + 1, i)]
    return n, edges


def star_graph(n: int = 1000) -> Fixture:
    """Hub 0 <-> spokes 1..n-1 (data/starGraph_1K) — extreme degree skew."""
    edges = []
    for i in range(1, n):
        edges += [(0, i), (i, 0)]
    return n, edges


_ORDERED_9 = [
    (0, 1), (0, 3), (1, 0), (1, 2), (1, 4), (3, 4),
    (4, 5), (4, 7), (5, 8), (7, 6), (7, 8),
]


def ordered_graph_9() -> Fixture:
    """Fixed 9-vertex graph, src-sorted (data/orderedGraph_9 verbatim)."""
    return 9, list(_ORDERED_9)


def disordered_graph_9() -> Fixture:
    """Same 11 edges in the reference's shuffled order
    (data/disorderedGraph_9 verbatim) — order-independence test."""
    return 9, [
        (7, 6), (1, 2), (3, 4), (7, 8), (1, 4), (0, 3),
        (0, 1), (4, 7), (1, 0), (4, 5), (5, 8),
    ]


def acyclic_graph(n: int = 100) -> Fixture:
    """Complete DAG: edge (i,j) for all i<j (data/acyclicGraph_100);
    vertex n-1 is a dangling sink (out-degree 0)."""
    return n, [(i, j) for i in range(n) for j in range(i + 1, n)]


def maxflow_graph(n: int = 100, seed: int = 42) -> Fixture:
    """Sparse layered digraph in the spirit of data/maxflowGraph_100
    (deterministic, seed 42): ~4 forward edges per vertex into the next
    two layers of a 10-layer DAG, plus a source fan-out."""
    rng = np.random.default_rng(seed)
    layers = 10
    per = n // layers
    edges: list[tuple[int, int]] = []
    for v in range(n):
        layer = v // per
        if layer + 1 >= layers:
            continue
        lo = (layer + 1) * per
        hi = min(n, (layer + 3) * per)
        k = min(4, hi - lo)
        for t in sorted(rng.choice(np.arange(lo, hi), size=k, replace=False)):
            edges.append((v, int(t)))
    return n, edges


def isolated_graph(n: int = 1000) -> Fixture:
    """n vertices, zero edges (data/isolatedGraph_1K)."""
    return n, []


def singleton_graph() -> Fixture:
    """One vertex, zero edges (data/singletonGraph_1)."""
    return 1, []


FIXTURES: dict[str, Fixture] = {}


def all_fixtures() -> dict[str, Fixture]:
    if not FIXTURES:
        FIXTURES.update(
            {
                "gridGraph_15": grid_graph(),
                "chainGraph_1K": chain_graph(),
                "starGraph_1K": star_graph(),
                "orderedGraph_9": ordered_graph_9(),
                "disorderedGraph_9": disordered_graph_9(),
                "acyclicGraph_100": acyclic_graph(),
                "maxflowGraph_100": maxflow_graph(),
                "isolatedGraph_1K": isolated_graph(),
                "singletonGraph_1": singleton_graph(),
            }
        )
    return FIXTURES


def testdata_edges_sql() -> str:
    """SQL producing the deterministic driver-testdata graph (see
    olive_spark.ingest.testdata_graph for the Spark twin)."""
    from olive_spark.ingest.resolve import TESTDATA_EDGES_SQL

    return TESTDATA_EDGES_SQL
