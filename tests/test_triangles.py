"""Triangle counting vs the exact oracle (sorted-adjacency intersection)."""

from __future__ import annotations

import numpy as np
import pytest

from olive_spark import oracle
from olive_spark.algorithms.triangles import triangle_count
from olive_spark.fixtures import acyclic_graph, grid_graph, maxflow_graph, star_graph
from olive_spark.graph import Graph


def per_vec(df, n):
    d = {r["id"]: r["triangles"] for r in df.collect()}
    assert len(d) == n
    return np.array([d[i] for i in range(n)])


CASES = [
    ("grid15", grid_graph()),          # bipartite-ish: 0 triangles
    ("star100", star_graph(100)),      # star: 0 triangles, hub skew
    ("acyclic20", acyclic_graph(20)),  # complete graph K20: C(20,3)=1140
    ("maxflow100", maxflow_graph()),
    ("tri_plus_dups", (5, [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (3, 4), (0, 1)])),
]


@pytest.mark.parametrize("name,fix", CASES, ids=[c[0] for c in CASES])
def test_triangles(spark, name, fix):
    n, e = fix
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    per, total = triangle_count(g)
    gotp = per_vec(per, n)
    expp, exptot = oracle.triangles(n, e)
    assert total == exptot
    assert (gotp == expp).all()
    per.unpersist()


def test_k20_total(spark):
    n, e = acyclic_graph(20)
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    per, total = triangle_count(g)
    assert total == 1140  # C(20,3)
    per.unpersist()


def lcc_oracle(n, edges):
    """Brute-force local clustering coefficient per vertex."""
    adj = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = np.zeros(n)
    for v in range(n):
        d = len(adj[v])
        if d < 2:
            continue
        links = sum(1 for u in adj[v] for w in adj[v] if u < w and w in adj[u])
        out[v] = 2.0 * links / (d * (d - 1))
    return out


@pytest.mark.parametrize("name,fix", CASES, ids=[c[0] for c in CASES])
def test_local_clustering(spark, name, fix):
    from olive_spark.algorithms.triangles import local_clustering

    n, e = fix
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    rows = {r["id"]: r for r in local_clustering(g).collect()}
    assert len(rows) == n
    exp = lcc_oracle(n, e)
    got = np.array([rows[i]["lcc"] for i in range(n)])
    assert np.allclose(got, exp, atol=1e-12)
    # deg column is the simple undirected degree
    for v in range(n):
        nbrs = {d for s, d in e if s == v and s != d} | {s for s, d in e if d == v and s != d}
        assert rows[v]["deg"] == len(nbrs)
