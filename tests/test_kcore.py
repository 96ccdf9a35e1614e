"""k-core peeling vs the numpy oracle + closed-form chain unraveling."""

from __future__ import annotations

import numpy as np
import pytest

from olive_spark import oracle
from olive_spark.algorithms.kcore import kcore
from olive_spark.fixtures import (
    chain_graph,
    grid_graph,
    isolated_graph,
    ordered_graph_9,
    star_graph,
)
from olive_spark.graph import Graph


def _flags(res, n):
    d = {r["id"]: r["in_core"] for r in res.state.collect()}
    assert len(d) == n
    return np.array([d[i] for i in range(n)])


@pytest.mark.parametrize(
    "fix, k",
    [
        (grid_graph(), 3),
        (ordered_graph_9(), 2),
        (star_graph(30), 2),
        (chain_graph(20), 3),
        (isolated_graph(10), 1),
    ],
    ids=["grid-k3", "ordered9-k2", "star30-k2", "chain20-k3", "isolated-k1"],
)
def test_kcore_parity(spark, fix, k):
    n, e = fix
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    res = kcore(g, k=k, max_rounds=50)
    exp, exp_rounds, exp_conv = oracle.kcore_fixed(n, e, k, max_rounds=50)
    assert np.array_equal(_flags(res, n), exp)
    assert res.rounds == exp_rounds
    assert res.converged == exp_conv


def test_kcore_chain_unravels_closed_form(spark):
    """The chain fixture stores each undirected edge as two directed
    rows, and kcore symmetrizes again (multigraph semantics, duplicates
    count): ends have degree 2, interior 4. At k=3 the chain peels one
    vertex per end per round: after R rounds exactly {R..n-1-R}
    survive."""
    n, e = chain_graph(30)
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    res = kcore(g, k=3, max_rounds=4)
    flags = _flags(res, n)
    exp = np.array([4 <= i <= n - 5 for i in range(n)])
    assert np.array_equal(flags, exp)
    assert not res.converged  # chain keeps unraveling past 4 rounds


def test_kcore_star_fixpoint(spark):
    """Star at k=3: every spoke has degree 2 in the undirected closure
    (its out- and in-edge), so round 1 peels all spokes, round 2 finds
    the edge set already empty and peels the hub — converged, empty
    core."""
    n, e = star_graph(15)
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    res = kcore(g, k=3, max_rounds=50)
    exp, _, _ = oracle.kcore_fixed(n, e, 3, max_rounds=50)
    assert np.array_equal(_flags(res, n), exp)
    assert res.converged


def test_kcore_k0_includes_isolated(spark):
    n, e = isolated_graph(8)
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    res = kcore(g, k=0)
    assert _flags(res, n).all()
    assert res.converged


def test_kcore_negative_k_raises(spark):
    n, e = chain_graph(5)
    g = Graph.from_edge_list(spark, e, n_vertices=n, num_partitions=4)
    with pytest.raises(ValueError):
        kcore(g, k=-1)
