"""Property tests: random graphs vs the numpy oracles (hypothesis).

Bounded sizes keep superstep counts sane; examples are deterministic
(derandomized) so CI time is stable.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olive_spark import oracle
from olive_spark.algorithms.bfs import bfs
from olive_spark.algorithms.cc import connected_components
from olive_spark.algorithms.pagerank import pagerank_fixed
from olive_spark.graph import Graph

N_MAX = 16

edge_lists = st.lists(
    st.tuples(st.integers(0, N_MAX - 1), st.integers(0, N_MAX - 1)),
    min_size=0,
    max_size=40,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


def vec(res, col, n):
    d = {r["id"]: r[col] for r in res.state.collect()}
    assert len(d) == n
    return np.array([d[i] for i in range(n)])


@given(edges=edge_lists)
@SETTINGS
def test_pagerank_random_graphs(spark, edges):
    """Random multigraphs (self-loops + duplicates allowed) match the
    oracle exactly after 6 fixed rounds."""
    g = Graph.from_edge_list(spark, edges, n_vertices=N_MAX, num_partitions=3)
    got = vec(pagerank_fixed(g, iterations=6), "rank", N_MAX)
    exp = oracle.pagerank_fixed(N_MAX, edges, iterations=6)
    g.unpersist()
    assert np.allclose(got, exp, atol=1e-12, rtol=1e-9)


@given(edges=edge_lists, source=st.integers(0, N_MAX - 1))
@SETTINGS
def test_bfs_random_graphs(spark, edges, source):
    g = Graph.from_edge_list(spark, edges, n_vertices=N_MAX, num_partitions=3)
    got = vec(bfs(g, source=source), "level", N_MAX)
    exp = oracle.bfs(N_MAX, edges, source)
    g.unpersist()
    assert (got == exp).all()


@given(edges=edge_lists)
@SETTINGS
def test_cc_random_graphs(spark, edges):
    g = Graph.from_edge_list(spark, edges, n_vertices=N_MAX, num_partitions=3)
    got = vec(connected_components(g), "component", N_MAX)
    exp = oracle.connected_components(N_MAX, edges)
    g.unpersist()
    assert (got == exp).all()
