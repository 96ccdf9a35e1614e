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
